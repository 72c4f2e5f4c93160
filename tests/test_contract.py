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
