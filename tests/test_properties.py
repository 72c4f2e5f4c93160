"""Property-based oracle parity (SURVEY.md §5.5 stretch goal).

hypothesis generates random predicate/projection combinations over lineitem
and asserts Spark ≡ DuckDB on the result. Derandomized (fixed seed, fixed
example count) so the suite stays deterministic in CI.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from token_burn_listener_spark.tables import load_table

NUMERIC_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
OPS = ["<", "<=", ">", ">=", "=", "<>"]
FLAG_VALUES = ["A", "N", "R"]

predicate = st.one_of(
    st.tuples(
        st.sampled_from(NUMERIC_COLS),
        st.sampled_from(OPS),
        st.floats(min_value=0.0, max_value=60.0, allow_nan=False).map(
            lambda v: round(v, 2)
        ),
    ).map(lambda t: f"{t[0]} {t[1]} {t[2]}"),
    st.sampled_from(FLAG_VALUES).map(lambda v: f"l_returnflag = '{v}'"),
)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet')"
    )
    return con


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(preds=st.lists(predicate, min_size=1, max_size=3), conj=st.booleans())
def test_random_filters_match_duckdb(spark, sf_dir, duck, preds, conj):
    glue = " AND " if conj else " OR "
    where = glue.join(preds)
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    spark_n = spark.sql(f"SELECT count(*) FROM lineitem WHERE {where}").collect()[0][0]
    duck_n = duck.execute(f"SELECT count(*) FROM lineitem WHERE {where}").fetchone()[0]
    assert spark_n == duck_n, where


# ---------------------------------------------------------------------------
# Connected components vs a union-find reference (the components kernel's
# only in-fixture oracle is a recursive CTE on ONE edge distribution; this
# exercises arbitrary random graphs, including the shapes that distribution
# never produces: long chains, self-loops, isolated vertices).
# ---------------------------------------------------------------------------

N_VERTICES = 16


def _union_find_min_labels(edges):
    parent = list(range(N_VERTICES))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    roots = {}
    for v in range(N_VERTICES):
        roots.setdefault(find(v), []).append(v)
    return {v: min(members) for members in roots.values() for v in members}


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(0, N_VERTICES - 1), st.integers(0, N_VERTICES - 1)
        ),
        max_size=24,
    )
)
def test_min_label_components_matches_union_find(spark, edges):
    from token_burn_listener_spark.llm.dedup import min_label_components

    nodes = spark.createDataFrame(
        [(v,) for v in range(N_VERTICES)], "vid long"
    )
    pairs = spark.createDataFrame(
        edges or [], "va long, vb long"
    )
    got = {
        r.vid: r.component_id
        for r in min_label_components(nodes, pairs, "vid").collect()
    }
    assert got == _union_find_min_labels(edges)
