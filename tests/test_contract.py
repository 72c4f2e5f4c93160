"""Driver-contract and infrastructure sanity tests."""

from __future__ import annotations

import os

from token_burn_listener_spark.registry import ORACLES, QUERIES, load_all_modules
from token_burn_listener_spark.scratch import materialize

load_all_modules()


def test_every_oracle_key_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


def test_key_naming_convention():
    assert all(k.startswith("q_") for k in QUERIES)


def test_bench_headline_keys_registered():
    import bench

    missing = [k for k in bench.HEADLINE_KEYS if k not in QUERIES]
    assert not missing, f"bench references unimplemented keys: {missing}"


def test_next_driver_window_comment_matches_positions():
    """Freshness-cycling drift guard (registry.py STANDING INVARIANT):
    the next-round window written out in the rotation comment must be
    EXACTLY the canary plus the keys at DRIVER_ORDER positions 50..98 —
    the slice that becomes the head after the mechanical rotation edit.
    If an insertion/promotion shifts the queue, this fails until the
    comment is rewritten, keeping the documented plan machine-true."""
    import re

    import token_burn_listener_spark.registry as registry

    src = open(registry.__file__, encoding="utf-8").read()
    m = re.search(r"r\d\d window \(.*?\n(.*?)\n# ---", src, re.S)
    assert m, "rotation comment lost its next-window listing"
    listed = re.findall(r"q_\w+", m.group(1))
    order = registry.DRIVER_ORDER
    assert listed == [order[0]] + order[50:99], (
        "next-window comment diverged from DRIVER_ORDER positions: "
        f"comment has {len(listed)} keys, first mismatch at "
        f"{next((i for i, (a, b) in enumerate(zip(listed, [order[0]] + order[50:99])) if a != b), 'length')}"
    )


def test_materialize_ignores_partial_dirs(tmp_path):
    """A crashed (no _SUCCESS) scratch dir must be rebuilt, not reused."""
    final = str(tmp_path / "copy")

    def write(_df, path):
        os.makedirs(path)
        with open(os.path.join(path, "part-0"), "w") as f:
            f.write("data")
        with open(os.path.join(path, "_SUCCESS"), "w") as f:
            f.write("")

    # simulate a partial prior write at the final path (no _SUCCESS)
    os.makedirs(final)
    with open(os.path.join(final, "part-0"), "w") as f:
        f.write("partial")

    materialize(None, final, write)
    assert os.path.exists(os.path.join(final, "_SUCCESS"))
    with open(os.path.join(final, "part-0")) as f:
        assert f.read() == "data"  # rebuilt, not the stale partial


def test_materialize_reuses_complete_dirs(tmp_path):
    final = str(tmp_path / "copy")
    calls = []

    def write(_df, path):
        os.makedirs(path)
        with open(os.path.join(path, "_SUCCESS"), "w") as f:
            f.write("")
        calls.append(path)

    materialize(None, final, write)
    materialize(None, final, write)
    assert len(calls) == 1


def test_hll_union_estimate_error_bound(spark, sf_dir):
    """Merged HLL estimates must sit within 2% of the exact distinct count
    (lgConfigK=12 default: ~1.6% RSE; the fixture cardinalities are far
    below saturation so the estimate is typically exact)."""
    rows = QUERIES["q_agg_hll_union"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        err = abs(r.est_users - r.exact_users) / max(r.exact_users, 1)
        assert err <= 0.02, (r.event_type, r.est_users, r.exact_users)


def test_feed_sink_append_overwrite_and_fence(spark, sf_dir, tmp_path):
    """r12 review pins for the custom event_feed sink/reader contract:
    (1) append mode publishes AFTER existing parts instead of renaming
    over them; (2) overwrite mode replaces them; (3) a fenced EMPTY
    commit reads back as an empty DataFrame; (4) an unfenced dir (a
    simulated half-commit: parts present, no _FEEDCOMMIT/_SUCCESS) is
    rejected rather than partially read."""
    import os

    from pyspark.sql import functions as F

    from token_burn_listener_spark.sources.feed import register_feed_source
    from token_burn_listener_spark.tables import load_table

    register_feed_source(spark)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "event_type",
        "value",
    )
    n = ev.count()
    target = str(tmp_path / "feed")

    def read_count():
        return (
            spark.read.format("event_feed").option("path", target).load()
        ).count()

    w = ev.write.format("event_feed").option("path", target)
    w.mode("append").save()
    assert read_count() == n
    w.mode("append").save()  # second append must ADD, not clobber
    assert read_count() == 2 * n
    w.mode("overwrite").save()  # overwrite must replace both commits
    assert read_count() == n

    # fenced empty commit is readable as empty
    empty_target = str(tmp_path / "empty")
    (
        ev.filter(F.lit(False))
        .write.format("event_feed")
        .option("path", empty_target)
        .mode("append")
        .save()
    )
    assert os.path.exists(os.path.join(empty_target, "_FEEDCOMMIT"))
    assert (
        spark.read.format("event_feed").option("path", empty_target).load()
    ).count() == 0

    # unfenced dir (half-commit) is rejected
    half = str(tmp_path / "half")
    os.makedirs(half)
    with open(os.path.join(half, "part-00000.jsonl"), "w") as f:
        f.write('{"event_id": 1, "ts_us": 0, "user_id": 1, '
                '"event_type": "view", "value": 1.0}\n')
    import pytest as _pytest

    with _pytest.raises(Exception, match="commit fence"):
        (
            spark.read.format("event_feed").option("path", half).load()
        ).count()


def test_preflight_sweep_never_touches_live_jvm_dirs(tmp_path, monkeypatch):
    """r13 pin for tools/scale_probe.preflight_sweep (VERDICT r12 #8):
    only Spark scratch dirs that PREDATE the oldest live JVM are swept —
    a dir a live JVM could own (created after it started) must survive,
    because an idle JVM holds no open fds there (the fd-only heuristic
    swept a live parity JVM's blockmgr mid-run; this is its regression
    test)."""
    import importlib.util
    import os
    import time

    spec = importlib.util.spec_from_file_location(
        "scale_probe",
        os.path.join(os.path.dirname(__file__), "..", "tools", "scale_probe.py"),
    )
    sp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sp)

    old = tmp_path / "blockmgr-dead"
    new = tmp_path / "blockmgr-live"
    old.mkdir()
    new.mkdir()
    (old / "shuffle_0_0_0.data").write_bytes(b"x" * 128)
    past = time.time() - 3600
    os.utime(old, (past, past))

    # a "live JVM" started 10 minutes ago: the hour-old dir is provably
    # dead, the fresh one could be the live JVM's and must survive
    monkeypatch.setattr(sp, "_oldest_live_java_start", lambda: time.time() - 600)
    sp.preflight_sweep(tmp_root=str(tmp_path))
    assert not old.exists(), "dead-JVM scratch should be swept"
    assert new.exists(), "possibly-live scratch must never be touched"

    # no JVM at all: everything is sweepable
    monkeypatch.setattr(sp, "_oldest_live_java_start", lambda: None)
    sp.preflight_sweep(tmp_root=str(tmp_path))
    assert not new.exists()
