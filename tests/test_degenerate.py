"""Degenerate-data parity: prove the NULLIF/zero-guards on BOTH engines.

The sf fixtures never exercise the guards added for ADVICE r5 (and the
round-6 sweep of the same defect class): MAD collapse on heavily-tied
values, zero-variance series in the cross-correlation, zero-variance
arms in the Welch t-test. A guard that only one engine honors is a
latent parity break that check_parity cannot see — so this suite builds
tiny ADVERSARIAL events tables (constant values, constant hourly
series), runs the registered Spark query AND its DuckDB oracle over the
same parquet, and applies check_parity's own compare() — the identical
row/column/value check the driver uses, now on inputs chosen to hit the
degenerate branches.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from token_burn_listener_spark.registry import ORACLES, QUERIES, load_all_modules

load_all_modules()

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _check_parity_module():
    spec = importlib.util.spec_from_file_location(
        "check_parity", os.path.join(_ROOT, "tools", "check_parity.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


compare = _check_parity_module().compare

_BASE_US = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC in µs


def _write_events(dirpath: str, rows: list[tuple[int, int, int, str, float]]) -> str:
    """Write an events.parquet matching the fixture schema (FIXTURES.md):
    ts is nanosecond-precision, exactly like the driver-generated tables,
    so tables.load_table's nanosAsLong conversion path is exercised too.
    rows: (event_id, ts_offset_us from _BASE_US, user_id, event_type, value).
    """
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [(_BASE_US + r[1]) * 1000 for r in rows], pa.timestamp("ns")
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(['{"k": 1}'] * len(rows), pa.string()),
        }
    )
    pq.write_table(table, os.path.join(dirpath, "events.parquet"))
    return dirpath


def _write_embeddings(
    dirpath: str, rows: list[tuple[int, list[float], int]]
) -> str:
    """Write an embeddings.parquet matching the fixture schema
    (vec_id int64, embedding list<float>, label int32)."""
    table = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r[1] for r in rows], pa.list_(pa.float32())
            ),
            "label": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    pq.write_table(table, os.path.join(dirpath, "embeddings.parquet"))
    return dirpath


# One source of truth for the fixture's TPC-H column sets and dtypes
# (mirrors /root/testdata/sf*/; timestamps are µs ints). Both adversarial
# writers (_write_tpch_minimal here, _write_tpch_fuzz in the fuzz suite)
# build through this so a fixture schema change breaks in ONE place.
_TPCH_SCHEMAS = {
    "lineitem": {
        "l_orderkey": pa.int64(),
        "l_partkey": pa.int64(),
        "l_suppkey": pa.int64(),
        "l_linenumber": pa.int32(),
        "l_quantity": pa.float64(),
        "l_extendedprice": pa.float64(),
        "l_discount": pa.float64(),
        "l_tax": pa.float64(),
        "l_returnflag": pa.string(),
        "l_linestatus": pa.string(),
        "l_shipdate": pa.timestamp("us"),
    },
    "orders": {
        "o_orderkey": pa.int64(),
        "o_custkey": pa.int64(),
        "o_orderstatus": pa.string(),
        "o_totalprice": pa.float64(),
        "o_orderdate": pa.timestamp("us"),
        "o_orderpriority": pa.string(),
    },
    "part": {
        "p_partkey": pa.int64(),
        "p_name": pa.string(),
        "p_brand": pa.string(),
        "p_type": pa.string(),
        "p_size": pa.int32(),
        "p_retailprice": pa.float64(),
    },
    "customer": {
        "c_custkey": pa.int64(),
        "c_name": pa.string(),
        "c_nationkey": pa.int32(),
        "c_acctbal": pa.float64(),
        "c_mktsegment": pa.string(),
    },
    "supplier": {
        "s_suppkey": pa.int64(),
        "s_name": pa.string(),
        "s_nationkey": pa.int32(),
        "s_acctbal": pa.float64(),
    },
    "nation": {
        "n_nationkey": pa.int32(),
        "n_name": pa.string(),
        "n_regionkey": pa.int32(),
    },
    "region": {"r_regionkey": pa.int32(), "r_name": pa.string()},
}


def write_tpch_tables(dirpath: str, data: dict[str, dict[str, list]]) -> str:
    """Write TPC-H parquet files from plain column lists, typing every
    column from _TPCH_SCHEMAS. Column sets must match exactly."""
    for name, cols in data.items():
        schema = _TPCH_SCHEMAS[name]
        assert set(cols) == set(schema), (
            f"{name}: columns {sorted(cols)} != fixture {sorted(schema)}"
        )
        table = pa.table(
            {c: pa.array(vals, schema[c]) for c, vals in cols.items()}
        )
        pq.write_table(table, os.path.join(dirpath, f"{name}.parquet"))
    return dirpath


def _run_both(key: str, sf_dir: str, spark):
    sdf = QUERIES[key](spark, sf_dir).toPandas()
    con = duckdb.connect()
    for f in os.listdir(sf_dir):
        if f.endswith(".parquet"):
            t = f[: -len(".parquet")]
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{os.path.join(sf_dir, f)}')"
            )
    ddf = con.execute(ORACLES[key]).df()
    problems = compare(key, sdf, ddf, strict_types=True)
    assert not problems, f"{key} diverged on degenerate data: {problems}"
    return sdf


HOUR_US = 3_600_000_000


def test_anomaly_mad_collapse_drops_identically(spark, tmp_path):
    """One event_type is >50% a single value (MAD = 0, the collapse the
    guard exists for) yet carries a wild outlier; another type is
    well-spread. Both engines must drop every collapsed-type row (the
    outlier included — modified z is undefined there, an upstream
    policy decision, not a detection) and still flag the spread type's
    outlier."""
    rows = []
    # MAD-collapse type: 9 ties + one enormous spike
    for i in range(9):
        rows.append((i, i * HOUR_US, i, "tied", 5.0))
    rows.append((9, 9 * HOUR_US, 9, "tied", 1e6))
    # healthy type: linear spread + one outlier far past 3.5 modified z
    for i in range(9):
        rows.append((100 + i, i * HOUR_US, i, "spread", 10.0 + i))
    rows.append((109, 9 * HOUR_US, 9, "spread", 500.0))
    sf = _write_events(str(tmp_path), rows)
    out = _run_both("q_evt_anomaly_mad", sf, spark)
    assert set(out["event_type"]) == {"spread"}
    assert 109 in set(out["event_id"])
    assert not any(out["event_type"] == "tied")


def test_xcorr_constant_series_yields_null_r_identically(spark, tmp_path):
    """The click series is exactly 1 event per hour (zero variance at
    every lag): Pearson r is undefined, so every lag must come back
    NULL — not NaN on one engine and NULL on the other — and the rank
    column must still be a deterministic 1..N (NULLS LAST + lag
    tie-break on both engines)."""
    rows = []
    eid = 0
    for h in range(36):
        rows.append((eid, h * HOUR_US, h % 5, "click", 1.0))
        eid += 1
        # purchases vary: h % 3 extra events in the same hour
        for k in range(h % 3):
            rows.append((eid, h * HOUR_US + k + 1, h % 5, "purchase", 1.0))
            eid += 1
    sf = _write_events(str(tmp_path), rows)
    out = _run_both("q_evt_xcorr", sf, spark)
    assert out["r"].isna().all()
    assert sorted(out["rnk"]) == list(range(1, len(out) + 1))
    # NULLS LAST + lag tie-break == rank follows ascending lag exactly
    assert list(out.sort_values("rnk")["lag"]) == sorted(out["lag"])


def test_ab_test_zero_variance_arms_yield_null_t_identically(spark, tmp_path):
    """Every event of one type has the same value, so both arms have
    zero sample variance and the Welch denominator is 0: t must be NULL
    on both engines (not Infinity/NaN on Spark), and the row itself must
    survive with its means intact."""
    rows = []
    # enough distinct users that the sha-based split populates both arms;
    # constant value => var_samp = 0 in each arm (n >= 2 per arm)
    for i in range(40):
        rows.append((i, i * HOUR_US // 4, i, "constant", 7.5))
    # a healthy type as the control: values vary with the user id
    for i in range(40):
        rows.append((100 + i, i * HOUR_US // 4, i, "varying", float(1 + i)))
    sf = _write_events(str(tmp_path), rows)
    out = _run_both("q_evt_ab_test", sf, spark)
    const = out[out["event_type"] == "constant"]
    assert len(const) == 1
    assert const["t_stat"].isna().all()
    assert float(const["mean_a"].iloc[0]) == 7.5
    vary = out[out["event_type"] == "varying"]
    assert len(vary) == 1 and vary["t_stat"].notna().all()


def test_survival_total_return_pins_curve_to_zero(spark, tmp_path):
    """Every user returns at exactly the same 1-hour gap and every last
    event lands on the corpus end (censor duration 0): the 1 h bucket has
    n_events == n_risk, where the raw Kaplan-Meier factor is ln(0). The
    `dead` flag must pin survival to exactly 0.0 — identically on both
    engines — instead of one engine's ln(0) = -inf and the other's NULL."""
    rows = []
    eid = 0
    for uid in (1, 2):
        for h in (0, 1, 2):
            rows.append((eid, h * HOUR_US, uid, "click", 1.0))
            eid += 1
    sf = _write_events(str(tmp_path), rows)
    out = _run_both("q_evt_survival", sf, spark)
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["dur_h"], r["n_events"], r["n_risk"]) == (1, 4, 4)
    assert r["survival"] == 0.0


def test_semantic_prune_zero_vector_yields_null_identically(spark, tmp_path):
    """A zero embedding has no defined cosine to its centroid: the
    NULLIF-guarded norms must yield NULL centroid_sim AND a NULL pruned
    flag on both engines (not NaN on one and NULL on the other), while
    the healthy vectors in the same cluster keep real scores."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [1.0, 1.0, 0.0, 0.0], 0),
        (2, [0.0, 0.0, 0.0, 0.0], 0),  # the degenerate vector
        (3, [0.0, 0.0, 1.0, 1.0], 1),
        (4, [0.0, 0.0, 1.0, 0.0], 1),
    ]
    sf = _write_embeddings(str(tmp_path), rows)
    out = _run_both("q_llm_semantic_prune", sf, spark)
    z = out[out["vec_id"] == 2]
    assert len(z) == 1
    assert z["centroid_sim"].isna().all() and z["pruned"].isna().all()
    healthy = out[out["vec_id"] != 2]
    assert healthy["centroid_sim"].notna().all()


def test_cosine_family_rejects_zero_vectors_identically(spark, tmp_path):
    """ADVICE-r6-class crash, found in r7: a zero vector's cosine division
    THROWS under Spark 4's default ANSI mode (the q_evt_pareto class)
    while DuckDB's list_cosine_similarity returns -1.0 — so the cosine
    keys enforce the data contract IN-QUERY (similarity.nonzero + nz_sql)
    and must exclude the zero vector from every pair/top-k on BOTH
    engines, while keeping all healthy rows. The mean/L2 keys, by
    contrast, must treat it as an ordinary point."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [1.0, 1.0, 0.0, 0.0], 0),
        (2, [0.0, 0.0, 0.0, 0.0], 1),  # the degenerate vector
        (3, [0.0, 0.0, 1.0, 1.0], 1),
    ]
    sf = _write_embeddings(str(tmp_path), rows)

    top = _run_both("q_llm_cosine_topk", sf, spark)
    assert len(top) == 3  # pairs among {0, 1, 3} only
    assert 2 not in set(top["vec_a"]) | set(top["vec_b"])

    knn = _run_both("q_llm_knn_query", sf, spark)
    assert set(knn["vec_id"]) == {1, 3}

    neg = _run_both("q_llm_hard_negatives", sf, spark)
    assert 2 not in set(neg["vec_id"]) | set(neg["neg_id"])

    # components: the zero vector stays a VERTEX (edges are filtered,
    # the vertex universe is not) and must come back a singleton
    comp = _run_both("q_llm_dup_clusters", sf, spark)
    assert len(comp) == 4  # every vector labeled, zero vec included
    z_comp = comp[comp["vec_id"] == 2]
    assert z_comp["component_id"].tolist() == [2]  # its own component

    cent = _run_both("q_llm_centroids", sf, spark)  # mean family: included
    # label 1's centroid averages the zero vector in: [0, 0, .5, .5]
    c1 = cent[cent["label"] == 1].sort_values("pos")["c"].tolist()
    assert c1 == [0.0, 0.0, 0.5, 0.5]


def test_matryoshka_prefix_zero_vectors_handled_identically(spark, tmp_path):
    """A NONZERO vector whose first-16-dim prefix is all zero cannot be
    prefix-ranked (its truncated cosine would divide by zero — the branch
    the embeddings fuzz can't hit: quarter-step components make an
    all-zero 16-dim prefix measure-zero). Both engines must drop it from
    the truncated ranking while keeping it in the full-dim ranking; a
    prefix-zero QUERY empties the truncated ranking to the (0, 0, 0.0)
    report. 64-dim vectors: the oracle's folds are _ANN_DIM-bound like
    q_llm_ann_recall's (the fixture contract at every shipped SF)."""
    ones16, zeros16 = [1.0] * 16, [0.0] * 16
    rows = [
        (0, ones16 + [0.0] * 48, 0),  # query: nonzero prefix
        (1, ones16 + [0.0] * 48, 0),  # duplicate of the query
        (2, zeros16 + [1.0] * 48, 1),  # prefix-zero, full vector healthy
        (3, ones16 + [1.0] * 48, 1),
    ]
    a = tmp_path / "a"
    a.mkdir()
    out = _run_both(
        "q_llm_matryoshka_recall", _write_embeddings(str(a), rows), spark
    )
    assert len(out) == 1
    # vec 2 is full-rankable (ex10 = {1,2,3}) but not prefix-rankable
    assert out["n_prefix_ranked"].tolist() == [2]  # vecs 1 and 3 only
    assert out["n_hits"].tolist() == [2]
    assert out["recall"].tolist() == [0.2]

    # prefix-zero QUERY: truncated ranking empties, report degrades
    b = tmp_path / "b"
    b.mkdir()
    rows_zq = [(0, zeros16 + [1.0] * 48, 0)] + rows[1:]
    out = _run_both(
        "q_llm_matryoshka_recall", _write_embeddings(str(b), rows_zq), spark
    )
    assert out["n_prefix_ranked"].tolist() == [0]
    assert out["recall"].tolist() == [0.0]


def test_char_entropy_empty_and_constant(spark, tmp_path):
    """The empty-text doc must produce NO row on either engine — Spark
    splits '' into [''] (measured via collect; show() renders [''] as
    [], which hid it), so a size-of-split guard counts the pseudo-char
    as a run that ALSO collides with the fold's prev='' init sentinel,
    while DuckDB's oracle drops it via chr <> ''. The guard filters on
    length(text) instead. This divergence shipped green through the
    fuzz once because the word-salad strategy can't generate ''. Also
    pins the ndv=1 floor: a constant-char doc has entropy exactly 0
    with a 0 ceiling."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = ["abc", "", "zzzz"]
    table = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["src0"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(str(tmp_path), "documents.parquet"))
    out = _run_both("q_llm_char_entropy", str(tmp_path), spark)
    got = out.sort_values("doc_id")
    assert got["doc_id"].tolist() == [0, 2]  # the empty doc is absent
    assert got["ndv"].tolist() == [3, 1]
    assert got["n_chars"].tolist() == [3, 4]
    assert got["entropy_nats"].tolist()[1] == 0.0
    assert got["max_entropy_nats"].tolist()[1] == 0.0


def test_anisotropy_degenerate_corpora(spark, tmp_path):
    """The two corpora with NO pairs: all-zero vectors (the nz scan
    rejects everything — n=0, every stat NULL) and a single nonzero
    vector (n=1 — zero pairs, so the NULLIF'd n(n-1) denominator must
    yield NULL on BOTH engines while centroid_norm_sq still reports).
    Also pins the exact two-antipodal-vectors value: avg cosine -1."""
    zeros = [0.0] * 64
    ones = [1.0] * 64
    a = tmp_path / "a"
    a.mkdir()
    out = _run_both(
        "q_llm_anisotropy", _write_embeddings(str(a), [(0, zeros, 0)]), spark
    )
    assert out["n_vectors"].tolist() == [0]
    assert out["centroid_norm_sq"].isna().all()
    assert out["avg_pairwise_cos"].isna().all()

    b = tmp_path / "b"
    b.mkdir()
    out = _run_both(
        "q_llm_anisotropy", _write_embeddings(str(b), [(0, ones, 0)]), spark
    )
    assert out["n_vectors"].tolist() == [1]
    assert out["centroid_norm_sq"].tolist() == [1.0]
    assert out["avg_pairwise_cos"].isna().all()

    c = tmp_path / "c"
    c.mkdir()
    rows = [(0, ones, 0), (1, [-x for x in ones], 1)]
    out = _run_both(
        "q_llm_anisotropy", _write_embeddings(str(c), rows), spark
    )
    assert out["n_vectors"].tolist() == [2]
    assert out["centroid_norm_sq"].tolist() == [0.0]
    assert out["avg_pairwise_cos"].tolist() == [-1.0]


def test_vocab_coverage_tie_at_the_cut(spark, tmp_path):
    """250 distinct tokens, ALL tied at frequency 1, so the top-200
    vocabulary cut is decided purely by the token tiebreak — the exact
    boundary where Spark's global_row_number (range partition + local
    rank + prefix offsets) must agree with DuckDB's row_number over
    (freq DESC, token). Tokens t000..t249 sort lexicographically, so the
    vocabulary is t000..t199 and every doc's OOV count is exactly its
    t200+ tokens."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    toks = [f"t{i:03d}" for i in range(250)]
    texts = [" ".join(toks[i * 50 : (i + 1) * 50]) for i in range(5)]
    table = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["src0"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(str(tmp_path), "documents.parquet"))
    out = _run_both("q_llm_vocab_coverage", str(tmp_path), spark)
    got = out.sort_values("doc_id")
    assert got["n_tokens"].tolist() == [50] * 5
    # docs 0-3 hold t000..t199 (all in-vocab); doc 4 holds t200..t249
    assert got["n_oov"].tolist() == [0, 0, 0, 0, 50]
    assert got["oov_rate"].tolist() == [0.0, 0.0, 0.0, 0.0, 1.0]


def test_lsh_recall_with_no_exact_pairs_yields_null_identically(
    spark, tmp_path
):
    """A corpus whose sampled pair set is EMPTY (no two documents reach
    Jaccard 0.4) zeroes the recall denominator — Spark ANSI would throw
    on the division where DuckDB yields NULL, so both sides carry a
    NULLIF: recall over an empty reference set is a deterministic NULL
    on BOTH engines, with the zero counts still reported."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = ["completely different alpha", "nothing shared here omega"]
    table = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["src0"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(str(tmp_path), "documents.parquet"))
    out = _run_both("q_llm_lsh_recall", str(tmp_path), spark)
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["n_exact"], r["n_found"]) == (0, 0)
    assert out["recall"].isna().all()


def _write_tpch_minimal(dirpath: str, zero_prices: bool) -> str:
    """Minimal TPC-H slice exercising the q14/q8 share denominators:
    every lineitem row lands inside both queries' date windows and joins
    through part / orders->customer->AMERICA / supplier->nation, so with
    ``zero_prices`` the revenue sums are EXACTLY zero (not empty) — the
    ANSI-throw branch the NULLIF guards exist for."""
    price = 0.0 if zero_prices else 100.0
    # 1997-01-01 00:00:00 UTC in µs — q14's inclusive lower window edge
    # (deliberately ON the boundary: >= must keep it)
    ship_us = 852_076_800_000_000
    # 1995-06-01 00:00:00 UTC in µs — inside q8's [1995-01-01, 1997-01-01)
    order_us = 801_964_800_000_000
    return write_tpch_tables(
        dirpath,
        {
            "lineitem": {
                "l_orderkey": [1, 2],
                "l_partkey": [10, 10],
                "l_suppkey": [20, 20],
                "l_linenumber": [1, 1],
                "l_quantity": [1.0, 1.0],
                "l_extendedprice": [price, price],
                "l_discount": [0.0, 0.5],
                "l_tax": [0.0, 0.0],
                "l_returnflag": ["N", "N"],
                "l_linestatus": ["O", "O"],
                "l_shipdate": [ship_us, ship_us],
            },
            "orders": {
                "o_orderkey": [1, 2],
                "o_custkey": [30, 30],
                "o_orderstatus": ["O", "O"],
                "o_totalprice": [price, price],
                "o_orderdate": [order_us, order_us],
                "o_orderpriority": ["1-URGENT", "1-URGENT"],
            },
            "part": {
                "p_partkey": [10],
                "p_name": ["widget"],
                "p_brand": ["B1"],
                "p_type": ["PROMO"],
                "p_size": [1],
                "p_retailprice": [1.0],
            },
            "customer": {
                "c_custkey": [30],
                "c_name": ["c"],
                "c_nationkey": [1],
                "c_acctbal": [0.0],
                "c_mktsegment": ["BUILDING"],
            },
            "supplier": {
                "s_suppkey": [20],
                "s_name": ["s"],
                "s_nationkey": [2],
                "s_acctbal": [0.0],
            },
            "nation": {
                "n_nationkey": [1, 2],
                "n_name": ["NATION_1", "NATION_2"],
                "n_regionkey": [0, 0],
            },
            "region": {"r_regionkey": [0], "r_name": ["AMERICA"]},
        },
    )


def test_tpch_share_ratios_with_zero_revenue_yield_null_identically(
    spark, tmp_path
):
    """All-zero extended prices zero the q14 promo-share and q8
    market-share denominators on a NON-empty joined slice — Spark ANSI
    would throw on the division where DuckDB yields NULL. Both NULLIF
    guards must produce a deterministic NULL share on BOTH engines, and
    a healthy-price control corpus must keep real values."""
    zero_dir = str(tmp_path / "zero")
    os.makedirs(zero_dir)
    _write_tpch_minimal(zero_dir, zero_prices=True)

    q14 = _run_both("q_tpch_q14ish", zero_dir, spark)
    assert len(q14) == 1
    assert q14["promo_revenue_pct"].isna().all()

    q8 = _run_both("q_tpch_q8ish", zero_dir, spark)
    assert len(q8) == 1  # the 1995 year group EXISTS, share undefined
    assert q8["mkt_share"].isna().all()

    ctrl_dir = str(tmp_path / "ctrl")
    os.makedirs(ctrl_dir)
    _write_tpch_minimal(ctrl_dir, zero_prices=False)
    q14c = _run_both("q_tpch_q14ish", ctrl_dir, spark)
    assert q14c["promo_revenue_pct"].notna().all()
    q8c = _run_both("q_tpch_q8ish", ctrl_dir, spark)
    assert q8c["mkt_share"].notna().all()


def test_session_exact_deadline_boundary_merges(spark, tmp_path):
    """An event landing EXACTLY on the running session deadline MERGES in
    Spark's session_window — for static AND dynamic gaps (r12, measured;
    the r11 q_stream_session `>=` oracle bug re-found on the dynamic
    twin). Pin the exact-boundary table through all four session keys so
    the strictly-greater oracle convention can never regress: user 0's
    second view lands exactly 15 min (the view gap) after the first;
    user 1's view lands exactly 45 min (the purchase gap) after the
    purchase. A `>=` oracle splits each pair into two sessions (4 rows);
    Spark returns 2 merged sessions."""
    five_min = 300_000_000
    rows = [
        (0, 0 * five_min, 0, "view", 1.0),
        (1, 3 * five_min, 0, "view", 1.0),
        (2, 0 * five_min, 1, "purchase", 2.0),
        (3, 9 * five_min, 1, "view", 2.0),
    ]
    sf = _write_events(str(tmp_path), rows)
    for key in (
        "q_evt_dynamic_sessions",
        "q_stream_dynamic_session",
        "q_stream_session",
        "q_evt_sessionize",
    ):
        _run_both(key, sf, spark)
    # the dynamic keys must see exactly the two MERGED sessions
    from token_burn_listener_spark.registry import QUERIES

    out = QUERIES["q_evt_dynamic_sessions"](spark, sf).collect()
    assert len(out) == 2, out
