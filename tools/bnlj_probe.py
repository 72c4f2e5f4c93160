"""Minimal repro for the LocalRelation x LocalRelation nested-loop stall
(r14, VERDICT r13 #8; first hit by the reverted r13 pq_adc rewrite).

The r13 A/B observed a ~15 s stall when a crossJoin's BOTH sides were
LocalRelations (driver-embedded literal tables): the join plans as
BroadcastNestedLoopJoin over LocalTableScan children, and the per-row
cost explodes far past what the row counts justify. This tool isolates
that shape at increasing sizes, next to two control shapes of identical
output cardinality:

- ``local x local``   — both sides createDataFrame LocalRelations
- ``local x range``   — one side a distributed range (the usual shape)
- ``range x range``   — both sides distributed

Usage: python tools/bnlj_probe.py [n_left n_right]   (default 64 1000)

The guard that makes this un-regressable is in tools/audit_plans.py: any
registered key whose optimized plan joins two LocalRelations is flagged
regardless of the nested-loop allowlist (the allowlist vouches for the
CARDINALITY of documented crossJoins, not for this pathological shape).
"""

from __future__ import annotations

import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from token_burn_listener_spark.session import get_spark  # noqa: E402


def main() -> int:
    n_l = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n_r = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    spark = get_spark("bnlj-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # payload mirrors the r13 trigger: a row of 64 doubles (the pq
    # codebook slice that was re-entered as literals)
    def local(n, tag):
        return spark.createDataFrame(
            [(i, [float(i + j) for j in range(64)]) for i in range(n)],
            f"{tag}_id long, {tag}_v array<double>",
        )

    def dist(n, tag):
        from pyspark.sql import functions as F

        return spark.range(n).select(
            F.col("id").alias(f"{tag}_id"),
            F.expr(
                "transform(sequence(0, 63), j -> cast(id + j as double))"
            ).alias(f"{tag}_v"),
        )

    shapes = {
        "local x local": (local(n_l, "a"), local(n_r, "b")),
        "local x range": (local(n_l, "a"), dist(n_r, "b")),
        "range x range": (dist(n_l, "a"), dist(n_r, "b")),
    }
    for name, (a, b) in shapes.items():
        j = a.crossJoin(b)
        t0 = time.perf_counter()
        n = j.count()
        t1 = time.perf_counter()
        t0f = time.perf_counter()
        j.write.format("noop").mode("overwrite").save()
        t1f = time.perf_counter()
        plan1 = j._jdf.queryExecution().executedPlan().toString().splitlines()[0]
        print(
            f"{name}: count {t1 - t0:6.2f}s  noop {t1f - t0f:6.2f}s "
            f" ({n} rows)  top: {plan1.strip()[:90]}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
