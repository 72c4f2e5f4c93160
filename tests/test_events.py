"""Spec-level invariants for the event-analytics and CDC operators.

These keys are oracle-exact, but the oracle replays the SAME windowing
logic — a mis-specified gap rule would pass parity on both engines. The
asserts here check the SEMANTICS directly: session boundaries really
respect the 30-minute gap, SCD2 intervals really tile each user's
timeline, the funnel really monotonically narrows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from token_burn_listener_spark.registry import QUERIES, load_all_modules
from token_burn_listener_spark.tables import load_table

load_all_modules()


def test_sessionize_gap_semantics(spark, sf_dir):
    from token_burn_listener_spark.operators.events import _GAP_US

    sessions = QUERIES["q_evt_sessionize"](spark, sf_dir).collect()
    by_user: dict = {}
    for s in sessions:
        by_user.setdefault(s.user_id, []).append(s)
    n_events_total = 0
    for user, ss in by_user.items():
        ss.sort(key=lambda s: s.session_start)
        for s in ss:
            assert s.session_start <= s.session_end
            n_events_total += s.n_events
        for a, b in zip(ss, ss[1:]):
            # consecutive sessions are separated by AT LEAST the gap
            # (gap >= threshold opens a new session — session_window's
            # half-open [start, start+gap) boundary convention) …
            delta_us = (b.session_start - a.session_end).total_seconds() * 1e6
            assert delta_us >= _GAP_US, (user, a, b)
    # … and every event landed in exactly one session
    e = load_table(spark, sf_dir, "events")
    assert n_events_total == e.count()


def test_scd2_intervals_tile_the_timeline(spark, sf_dir):
    rows = QUERIES["q_cdc_scd2"](spark, sf_dir).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user, vs in by_user.items():
        vs.sort(key=lambda r: r.version)
        # versions are dense from 1, exactly one open (current) version
        assert [r.version for r in vs] == list(range(1, len(vs) + 1))
        opens = [r for r in vs if r.valid_to is None]
        assert len(opens) == 1 and opens[0] is vs[-1]
        for a, b in zip(vs, vs[1:]):
            # intervals chain: next version starts exactly where this ends
            assert a.valid_to == b.valid_from, (user, a, b)
            # consecutive versions differ in state (else they'd be one run)
            assert a.event_type != b.event_type, (user, a, b)


def test_funnel_monotonically_narrows(spark, sf_dir):
    rows = {r.stage: r.users for r in QUERIES["q_evt_funnel"](spark, sf_dir).collect()}
    assert set(rows) == {"signup", "click_after_signup", "purchase_after_click"}
    assert rows["signup"] >= rows["click_after_signup"] >= rows["purchase_after_click"]
    assert rows["signup"] > 0


def test_resample_grid_is_dense_and_consistent(spark, sf_dir):
    out = QUERIES["q_evt_resample"](spark, sf_dir)
    # dense: every (hour, type) cell present exactly once
    n_hours = out.select("hour_start").distinct().count()
    n_types = out.select("event_type").distinct().count()
    assert out.count() == n_hours * n_types
    # consistent: zero-filled totals equal the raw event count
    total = out.agg(F.sum("n")).collect()[0][0]
    assert total == load_table(spark, sf_dir, "events").count()


def test_snapshot_diff_classes_are_disjoint_and_complete(spark, sf_dir):
    out = QUERIES["q_cdc_snapshot_diff"](spark, sf_dir)
    rows = out.collect()
    kinds = {}
    for r in rows:
        kinds.setdefault(r.change_type, 0)
        kinds[r.change_type] += 1
        if r.change_type == "insert":
            assert r.old_v is None and r.new_v is not None
        elif r.change_type == "delete":
            assert r.old_v is not None and r.new_v is None
        else:
            assert r.old_v is not None and r.new_v is not None
            assert r.old_v != r.new_v
    # the derivation guarantees all three classes exist at fixture scale
    assert set(kinds) == {"insert", "delete", "update"}
    # keys are unique in the diff
    assert len({r.k for r in rows}) == len(rows)


def test_cdc_merge_applies_latest_op(spark, sf_dir):
    """MERGE result must equal the brute-force replay: base keys minus
    latest-op deletes, plus upserted values, with correct provenance."""
    out = {r.k: r for r in QUERIES["q_cdc_merge"](spark, sf_dir).collect()}
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    expected = {}
    for r in o.collect():
        k, price = r.o_orderkey, round(r.o_totalprice, 2)
        in_base = k % 2 == 0
        # replay the log in sequence order: U(+1) for k%5!=0, D for k%7==0,
        # U(*2) for k%11==0
        latest = None
        if k % 5 != 0:
            latest = ("U", round(price + 1.0, 2))
        if k % 7 == 0:
            latest = ("D", None)
        if k % 11 == 0:
            latest = ("U", round(price * 2.0, 2))
        if latest is None:
            if in_base:
                expected[k] = (price, "kept")
        elif latest[0] == "U":
            expected[k] = (latest[1], "updated" if in_base else "inserted")
        # latest == D → absent regardless of base membership
    assert set(out) == set(expected)
    for k, (v, prov) in expected.items():
        assert out[k].provenance == prov, (k, out[k], prov)
        assert abs(out[k].v - v) < 1e-9, (k, out[k], v)


def test_bigram_lm_scores_are_proper_log_probs(spark, sf_dir):
    """Every score is a mean of log10(p) with p in (0, 1] → score <= 0;
    a doc made of frequent bigrams must outscore a rare-bigram doc, and
    n_bigrams must equal len(text) - 1."""
    out = QUERIES["q_llm_bigram_lm"](spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", (F.length("text") - 1).alias("expected_n")
    )
    j = out.join(d, "doc_id")
    assert j.filter(F.col("n_bigrams") != F.col("expected_n")).count() == 0
    assert out.filter(F.col("lm_score") > 0).count() == 0
    # scores vary across the corpus (a constant score would mean a broken join)
    assert out.select("lm_score").distinct().count() > 1


def test_pit_join_covers_every_event_exactly_once(spark, sf_dir):
    """Point-in-time join: validity intervals partition the timeline, so
    every event matches exactly one dimension version."""
    from token_burn_listener_spark.registry import QUERIES
    from token_burn_listener_spark.tables import load_table

    out = QUERIES["q_cdc_pit_join"](spark, sf_dir)
    n_events = load_table(spark, sf_dir, "events").count()
    assert out.count() == n_events
    assert out.select("event_id").distinct().count() == n_events


def test_attribution_preserves_purchases_and_bounds_gap(spark, sf_dir):
    """Every purchase appears exactly once; attributed gaps sit inside the
    7-day lookback window."""
    from pyspark.sql import functions as F

    from token_burn_listener_spark.registry import QUERIES
    from token_burn_listener_spark.tables import load_table

    out = QUERIES["q_evt_attribution"](spark, sf_dir)
    n_purchases = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert out.count() == n_purchases
    bad = out.filter(
        F.col("click_id").isNotNull()
        & ((F.col("gap_min") < 0) | (F.col("gap_min") > 7 * 24 * 60))
    ).count()
    assert bad == 0


def test_rolling_active_wau_bounds_dau(spark, sf_dir):
    """7-day rolling actives can never be fewer than the day's actives;
    stickiness therefore sits in (0, 1]."""
    from token_burn_listener_spark.registry import QUERIES

    rows = QUERIES["q_evt_rolling_active"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.wau7 >= r.dau > 0
        assert 0 < r.stickiness <= 1


def test_survival_curve_is_a_valid_km_estimator(spark, sf_dir):
    """S must start ≤ 1, be strictly positive until (at most) the final
    row, and be NON-INCREASING — the defining property of a survival
    curve; and n_risk must be non-increasing in duration with
    n_events ≤ n_risk row-wise (you cannot lose more than are at risk)."""
    rows = QUERIES["q_evt_survival"](spark, sf_dir).collect()
    assert rows, "empty survival curve"
    rows.sort(key=lambda r: r.rnk)
    prev_s, prev_risk = 1.0, None
    for r in rows:
        assert 0.0 <= r.survival <= 1.0
        assert r.survival <= prev_s + 1e-9, (r.dur_h, r.survival, prev_s)
        assert 0 < r.n_events <= r.n_risk
        if prev_risk is not None:
            assert r.n_risk <= prev_risk, "n_risk must shrink over time"
        prev_s, prev_risk = r.survival, r.n_risk
    # durations strictly increase with rank (rnk is a materialized total
    # order over the hour grid)
    durs = [r.dur_h for r in rows]
    assert durs == sorted(set(durs))


def test_changepoint_cusum_telescopes_to_zero(spark, sf_dir):
    """A CUSUM of deviations from the series' own mean must telescope:
    the LAST cumulative value is Σ(x - x̄) = 0 exactly (up to the
    decimal quantum), exactly one peak day carries the max |CUSUM|
    unless ties, and the day grid is gapless."""
    rows = QUERIES["q_evt_changepoint"](spark, sf_dir).collect()
    assert rows, "no days"
    rows.sort(key=lambda r: r.rnk)
    assert abs(rows[-1].cusum) < 1e-6, rows[-1]
    peaks = [r for r in rows if r.is_peak == 1]
    assert peaks, "no peak flagged"
    max_abs = max(abs(r.cusum) for r in rows)
    for p in peaks:
        assert abs(abs(p.cusum) - max_abs) < 1e-9
    days = [r.day for r in rows]
    assert days == sorted(days)
    assert len(set(days)) == len(days)


def test_chain_reorg_conserves_events_and_bounds_rollback(spark, sf_dir):
    """Every event sits in exactly one block (canonical + orphan event
    counts must sum to the fixture's event count); exactly the two
    uncle-branch blocks are flagged rollback; every height has exactly
    one canonical block; and the rollback region sits inside the
    confirmation window below the tip."""
    rows = QUERIES["q_evt_chain_reorg"](spark, sf_dir).collect()
    n_events_fixture = load_table(spark, sf_dir, "events").count()
    assert sum(r.n_events for r in rows) == n_events_fixture
    hmax = max(r.height for r in rows)
    canon = [r for r in rows if r.canonical]
    orphan = [r for r in rows if not r.canonical]
    assert sorted(r.height for r in canon) == list(range(0, hmax + 1))
    assert len(orphan) == 2
    assert {r.height for r in orphan} == {hmax - 2, hmax - 1}
    for r in rows:
        assert r.action == ("keep" if r.canonical else "rollback")


def test_xcorr_is_a_valid_correlation_table(spark, sf_dir):
    """Every r must be a valid Pearson coefficient in [-1, 1]; the lag
    grid must be the full ±12 contiguous range; n must shrink as |lag|
    grows (overlap length is N - |lag| on a dense grid); and the rank
    column must order by r descending."""
    rows = QUERIES["q_evt_xcorr"](spark, sf_dir).collect()
    assert len(rows) == 25
    assert sorted(r.lag for r in rows) == list(range(-12, 13))
    n0 = {r.lag: r.n for r in rows}[0]
    for r in rows:
        assert -1.0 <= r.r <= 1.0
        assert r.n == n0 - abs(r.lag), (r.lag, r.n, n0)
    rows.sort(key=lambda r: r.rnk)
    rs = [r.r for r in rows]
    assert rs == sorted(rs, reverse=True)


def test_profile_similarity_recomputes_top_twin(spark, sf_dir):
    """Recompute the top twin's cosine from raw counts in Python and
    compare; ranks must be 1..10 with cosine in [0, 1] (counts are
    non-negative, so cosine cannot be negative)."""
    import math

    rows = QUERIES["q_evt_profile_similarity"](spark, sf_dir).collect()
    assert len(rows) == 10
    rows.sort(key=lambda r: r.rnk)
    assert [r.rnk for r in rows] == list(range(1, 11))
    assert all(0.0 <= r.cos_sim <= 1.0 for r in rows)
    e = load_table(spark, sf_dir, "events")
    prof = {}
    for row in (
        e.groupBy("user_id", F.hour("ts").alias("hod")).count().collect()
    ):
        prof.setdefault(row.user_id, {})[row.hod] = row["count"]
    qu = min(prof)
    qp = prof[qu]
    top = rows[0]
    tp = prof[top.user_id]
    dot = sum(c * qp.get(h, 0) for h, c in tp.items())
    cos = dot / (
        math.sqrt(sum(c * c for c in tp.values()))
        * math.sqrt(sum(c * c for c in qp.values()))
    )
    assert abs(cos - top.cos_sim) < 1e-5, (cos, top.cos_sim)


def test_gap_detection_conserves_missing_ids(spark, sf_dir):
    """The merged gap ranges must partition the missing-id set exactly:
    disjoint, sorted, non-adjacent (else the merge failed), and their
    total size must equal |expected universe| - |ingested|."""
    from token_burn_listener_spark.operators.events import _GAP_DROP_MOD

    rows = QUERIES["q_evt_gap_detection"](spark, sf_dir).collect()
    rows.sort(key=lambda r: r.rnk)
    e = load_table(spark, sf_dir, "events").select("event_id")
    mn, mx = e.agg(F.min("event_id"), F.max("event_id")).collect()[0]
    n_ing = e.filter(F.col("event_id") % _GAP_DROP_MOD != 0).count()
    assert sum(r.n_missing for r in rows) == (mx - mn + 1) - n_ing
    prev_end = None
    for r in rows:
        assert mn <= r.gap_start <= r.gap_end <= mx
        assert r.n_missing == r.gap_end - r.gap_start + 1
        if prev_end is not None:
            # strictly separated: adjacent ranges would mean merge failed
            assert r.gap_start > prev_end + 1
        prev_end = r.gap_end


def test_cumulative_uniques_converges_to_total_distinct(spark, sf_dir):
    """The curve's defining identities: the final cumulative value is
    the corpus's total distinct-user count, the series is
    non-decreasing, Σ new_users telescopes to the same total, and the
    day grid is dense (one row per calendar day, no holes)."""
    rows = QUERIES["q_evt_cumulative_uniques"](spark, sf_dir).collect()
    rows.sort(key=lambda r: r.rnk)
    e = load_table(spark, sf_dir, "events")
    total = e.select("user_id").distinct().count()
    assert rows[-1].cum_users == total
    assert sum(r.new_users for r in rows) == total
    cums = [r.cum_users for r in rows]
    assert cums == sorted(cums)
    days = [r.day for r in rows]
    assert len(days) == (days[-1] - days[0]).days + 1


def test_detect_gaps_exact_at_extreme_and_negative_ids(spark):
    """ADVICE r5: block bucketing must be exact integer floor division.
    The old `F.floor(event_id / 100)` path went through double division,
    which rounds ids above 2^53 (e.g. 2^53+15 -> 2^53+16), bucketing rows
    into a different block than the Python `//`-sized grid expects and
    silently corrupting gap ranges. Pin both regimes: ids just past the
    double-precision cliff, and negative ids (floor != truncate)."""
    from token_burn_listener_spark.operators.events import detect_gaps

    base = 2**53  # doubles can no longer represent every integer here
    big_ids = (
        [base + k for k in range(10)] + [base + 15] + [base + 230, base + 235]
    )
    ing = spark.createDataFrame([(i,) for i in big_ids], "event_id long")
    got = sorted(
        (r.gap_start, r.gap_end)
        for r in detect_gaps(spark, ing, base, base + 235).collect()
    )
    assert got == [
        (base + 10, base + 14),
        (base + 16, base + 229),
        (base + 231, base + 234),
    ]

    neg_ids = [-250, -249, -245, -232, -230]
    ing_n = spark.createDataFrame([(i,) for i in neg_ids], "event_id long")
    got_n = sorted(
        (r.gap_start, r.gap_end)
        for r in detect_gaps(spark, ing_n, -250, -230).collect()
    )
    assert got_n == [(-248, -246), (-244, -233), (-231, -231)]

    # ADVICE r6: ids within one block of Long.MIN_VALUE. The previous
    # `(event_id - pmod(event_id, B)) div B` bucketing overflowed the
    # subtraction here (ANSI throw); the div-plus-floor-correction form
    # has no subtraction on event_id and stays exact at the extreme.
    lo = -(2**63)  # Long.MIN_VALUE
    min_ids = [lo, lo + 1, lo + 5, lo + 40]
    ing_m = spark.createDataFrame([(i,) for i in min_ids], "event_id long")
    got_m = sorted(
        (r.gap_start, r.gap_end)
        for r in detect_gaps(spark, ing_m, lo, lo + 40).collect()
    )
    assert got_m == [(lo + 2, lo + 4), (lo + 6, lo + 39)]

    hi = 2**63 - 1  # Long.MAX_VALUE: the lead filter's event_id+1 and the
    # top grid block's b*B + B-1 both sit past the long range here
    max_ids = [hi - 40, hi - 5, hi - 1, hi]
    ing_x = spark.createDataFrame([(i,) for i in max_ids], "event_id long")
    got_x = sorted(
        (r.gap_start, r.gap_end)
        for r in detect_gaps(spark, ing_x, hi - 40, hi).collect()
    )
    assert got_x == [(hi - 39, hi - 6), (hi - 4, hi - 2)]
