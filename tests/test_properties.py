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
