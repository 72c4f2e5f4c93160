"""Head-to-head PQ-encode kernel measurement (VERDICT r11 #1c).

pq_adc's encode argmin was the record's worst absolute four-decade time
(1373.3 s at 20 M vectors in the r9-r10 window form). The r11
min(struct(d, c)) rewrite fixed the PLAN (map-side partial agg, no
n·128 shuffle+sort) but still evaluates ~8·16 interpreted
zip_with/aggregate HOF lambdas per vector. The r12 Arrow kernel
(_pq_encode_kernel) vectorizes the identical arithmetic batch-wise and
emits INTEGER code ids only — IEEE basic ops in the oracle's exact fold
order, no libm, ties by first-minimum — so the char_entropy-style
bit-exactness argument carries despite the float distances (see the
kernel docstring for why numpy's np.sum was deliberately avoided).

This tool keeps the promotion honest, winnow_kernel_bench-style:

- VALUE IDENTITY: full (vec_id, m, c) code sets compared at 1x (2k
  fixture vectors) AND at x100 (200k scaled vectors) — the argmin
  tie-break and fold-order arguments verified empirically, not assumed.
- HEAD TO HEAD: both forms timed at 1x and Nx through scale_probe's
  force() (full-plan evaluation, no column-pruning holes).

Usage: python tools/pq_kernel_bench.py [N]   (default 1000)
Results land in SCALE.md r12.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from token_burn_listener_spark.llm.similarity import (  # noqa: E402
    _PQ_K,
    _PQ_M,
    _pq_codes_arrow,
    _pq_codes_jvm,
    as_double,
)
from token_burn_listener_spark.registry import load_all_modules  # noqa: E402
from token_burn_listener_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")


def _inputs(spark, root: str):
    """(e, cb, grid) exactly as q_llm_pq_adc builds them."""
    e = spark.read.parquet(f"{root}/embeddings.parquet").select(
        "vec_id", as_double("embedding").alias("emb")
    )
    cb = (
        e.filter(F.col("vec_id").between(1, _PQ_K))
        .select((F.col("vec_id") - 1).alias("c"), F.col("emb").alias("cemb"))
        .localCheckpoint(eager=False)
    )
    grid = spark.range(1).select(
        F.explode(F.sequence(F.lit(0), F.lit(_PQ_M - 1))).alias("m")
    )
    return e, cb, grid


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    load_all_modules()
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "scale_probe",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "scale_probe.py"),
    )
    sp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sp)
    spark = get_spark("pq-kernel-bench")
    spark.sparkContext.setLogLevel("ERROR")
    scaled = sp.build_scaled(spark, n, {"embeddings": ["vec_id"]})
    mid = sp.build_scaled(spark, 100, {"embeddings": ["vec_id"]})
    for root in (SF_DIR, mid, scaled):
        spark.read.parquet(f"{root}/embeddings.parquet").count()

    # value identity at 1x AND x100 (full code sets, sorted tuples)
    parity = {}
    for label, root in (("1x", SF_DIR), ("100x", mid)):
        e, cb, grid = _inputs(spark, root)
        jvm = sorted(map(tuple, _pq_codes_jvm(e, cb, grid).collect()))
        arrow = sorted(map(tuple, _pq_codes_arrow(e, cb).collect()))
        assert jvm == arrow, (
            f"pq codes diverge at {label}: {len(jvm)} jvm vs "
            f"{len(arrow)} arrow rows, first differing pair "
            # default guards the prefix case (one side lost/duplicated
            # whole rows): zip then finds no unequal pair and a bare
            # next() would die with StopIteration instead of this message
            f"{next(((a, b) for a, b in zip(jvm, arrow) if a != b), None)}"
        )
        parity[label] = len(jvm)
        print(f"parity {label}: {len(jvm)} code rows identical",
              file=sys.stderr)

    report = {"parity_rows": parity, "kernels": {}}
    for name in ("jvm", "arrow"):
        def codes_fn(root):
            e, cb, grid = _inputs(spark, root)
            return (
                _pq_codes_jvm(e, cb, grid) if name == "jvm"
                else _pq_codes_arrow(e, cb)
            )

        t0 = time.perf_counter()
        a1 = sp.force(codes_fn(SF_DIR))
        base = time.perf_counter() - t0
        t0 = time.perf_counter()
        a2 = sp.force(codes_fn(scaled))
        big = time.perf_counter() - t0
        report["kernels"][name] = {
            "t_1x": round(base, 3),
            f"t_{n}x": round(big, 3),
            "factor": round(big / base, 2),
            "action": a1 if a1 == a2 else f"{a1}/{a2}",
        }
        print(f"pq_encode/{name}: 1x={base:.2f}s {n}x={big:.2f}s "
              f"factor={big / base:.2f}", file=sys.stderr)
    print(json.dumps({"n": n, "results": report}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
