"""Headline-key measurement probe (optimization round r13, guide §1).

For each bench headline key, in bench order, measures three things the
one-number bench line conflates:

- ``t_construct``: wall time of the query FUNCTION call itself — plan
  construction, any construction-time jobs (codebook collects, layout
  builds, plan asserts), py4j chatter.
- ``t_noop``: wall time of ``df.write.format("noop").save()`` — computes
  every column of every row and discards it (guide §1.4), i.e. the
  computation without the driver-side collect transfer. Streaming keys
  run their real harness inside the function, so noop re-times the
  returned batch result only — for those read t_construct instead.
- ``t_collect``: wall time of ``.collect()`` on a SECOND construction —
  the bench's actual timed action, for comparability (warm JVM: these
  numbers sit below bench's first-run lines; the DELTAS are the signal).

Also dumps ``explain('formatted')`` per key to ``plans/<tag>/<key>_<suffix>.txt``
when ``--plans <tag> <suffix>`` is given.

Usage:
    python tools/headline_probe.py 2>/dev/null            # all headline keys
    python tools/headline_probe.py q_llm_pq_adc 2>/dev/null
    python tools/headline_probe.py --plans r13 before 2>/dev/null
"""

from __future__ import annotations

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from token_burn_listener_spark.registry import QUERIES, load_all_modules  # noqa: E402
from token_burn_listener_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    args = sys.argv[1:]
    plans_tag = plans_suffix = None
    if "--plans" in args:
        i = args.index("--plans")
        plans_tag, plans_suffix = args[i + 1], args[i + 2]
        args = args[:i] + args[i + 3:]

    from bench import HEADLINE_KEYS

    keys = [k for k in HEADLINE_KEYS if not args or any(k.startswith(a) for a in args)]
    load_all_modules()
    spark = get_spark("headline-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as bench.py
    for table in ("region", "customer", "orders", "lineitem", "events", "documents"):
        spark.read.parquet(f"{SF_DIR}/{table}.parquet").count()
    from token_burn_listener_spark.streaming.replay import (
        ensure_events_replay,
        ensure_events_replay_multi,
    )

    ensure_events_replay(spark, SF_DIR)
    ensure_events_replay_multi(spark, SF_DIR)

    out: dict[str, dict[str, float]] = {}
    for key in keys:
        fn = QUERIES.get(key)
        if fn is None:
            continue
        spark.sparkContext.setJobDescription(f"probe:{key}:construct+noop")
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        if plans_tag:
            pdir = os.path.join(_ROOT, "plans", plans_tag)
            os.makedirs(pdir, exist_ok=True)
            with open(os.path.join(pdir, f"{key}_{plans_suffix}.txt"), "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                ))
        spark.sparkContext.setJobDescription(f"probe:{key}:collect")
        t3 = time.perf_counter()
        rows = fn(spark, SF_DIR).collect()
        t4 = time.perf_counter()
        out[key] = {
            "t_construct": round(t1 - t0, 3),
            "t_noop": round(t2 - t1, 3),
            "t_collect": round(t4 - t3, 3),
            "rows": len(rows),
        }
        print(f"probe: {key}: construct={t1-t0:.3f} noop={t2-t1:.3f} "
              f"collect={t4-t3:.3f} rows={len(rows)}", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
