"""Head-to-head text-kernel measurements (VERDICT r10 #2/#3).

r10 left two interpreted/JVM per-doc constants as the record's worst:
q_llm_char_entropy's all-JVM sorted-run decimal fold (350.8 s at 5 M
docs — correct, pinned, exactly linear, but ~L decimal struct ops per
doc) and q_llm_repetition's zip_with trigram form (65.5 s — interpreted
per-gram concat lambdas). Both are integer-exact at the counting layer,
so the winnow promotion rule applies: move ONLY the integer counting to
an Arrow kernel, keep every float/decimal op in the JVM with unchanged
expression text, measure head-to-head, promote the winner.

    kernel                       1x      1000x (5 M docs)
    char_entropy jvm_fold       (r10 record: 350.8)
    char_entropy arrow_hybrid   (production since r11)
    repetition   jvm_zipwith    (r10 record: 65.5)
    repetition   arrow_tuples   (production since r11)

Run this tool to refresh the table (results land in SCALE.md). Both JVM
forms live HERE as the measured alternatives — re-run whenever either
kernel changes to keep the comparison honest. Value-identity asserted
at 1x before timing.

Usage: python tools/text_kernel_bench.py [N]   (default 1000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from token_burn_listener_spark.registry import (  # noqa: E402
    QUERIES,
    load_all_modules,
)
from token_burn_listener_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")


def char_entropy_jvm_fold(spark, sf_dir: str):
    """The r8–r10 production char_entropy: all-JVM sorted-run decimal
    fold, chars pinned behind an explode(array(e)) Generate barrier
    (unpinned, the run-close term re-sorts the doc per distinct char).
    Kept verbatim as the measured JVM alternative."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dec = "decimal(28,12)"
    base = d.filter(F.length("text") > 0).select(
        "doc_id",
        F.explode(F.array(F.array_sort(F.split("text", "")))).alias("chars"),
    )
    n = F.size("chars")

    def term(run):
        p = run.cast("double") / n.cast("double")
        return (p * F.log(p)).cast(dec)

    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast(dec).alias("s"),
        F.lit(0).cast("long").alias("k"),
    )

    def step(acc, x):
        same = x == acc["prev"]
        closed = (acc["s"] + term(acc["run"])).cast(dec)
        return F.struct(
            x.alias("prev"),
            F.when(same, acc["run"] + 1)
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
            F.when(same | (acc["run"] == 0), acc["s"])
            .otherwise(closed)
            .alias("s"),
            F.when(same, acc["k"]).otherwise(acc["k"] + 1).alias("k"),
        )

    def fin(acc):
        return F.struct(
            F.when(acc["run"] > 0, (acc["s"] + term(acc["run"])).cast(dec))
            .otherwise(acc["s"])
            .alias("s"),
            acc["k"].alias("k"),
        )

    ent = F.aggregate(F.col("chars"), init, step, fin)
    return base.select("doc_id", ent.alias("e"), n.alias("nc")).select(
        "doc_id",
        F.col("e.k").alias("ndv"),
        F.col("nc").cast("long").alias("n_chars"),
        F.round((-F.col("e.s")).cast("double"), 6).alias("entropy_nats"),
        F.round(F.log(F.col("e.k").cast("double")), 6).alias(
            "max_entropy_nats"
        ),
    )


def repetition_jvm_zipwith(spark, sf_dir: str):
    """The r5–r10 production repetition: trigrams via zip_with over
    shifted slices (itself the measured winner over the
    element_at-in-lambda O(tokens²) form), dedup via array_distinct.
    Kept verbatim as the measured JVM alternative."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    grams = F.expr(
        "zip_with("
        "  slice(split(text, ' '), 1, greatest(size(split(text, ' ')) - 2, 0)),"
        "  zip_with("
        "    slice(split(text, ' '), 2, greatest(size(split(text, ' ')) - 2, 0)),"
        "    slice(split(text, ' '), 3, greatest(size(split(text, ' ')) - 2, 0)),"
        "    (b, c) -> concat(b, ' ', c)),"
        "  (a, bc) -> concat(a, ' ', bc))"
    )
    return (
        d.select("doc_id", grams.alias("grams"))
        .filter(F.size("grams") > 0)
        .select(
            "doc_id",
            F.round(
                1.0 - F.size(F.array_distinct("grams")) / F.size("grams"), 6
            ).alias("rep_ratio"),
        )
    )


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
    spark = get_spark("text-kernel-bench")
    spark.sparkContext.setLogLevel("ERROR")
    scaled = sp.build_scaled(spark, n, {"documents": ["doc_id"]})
    for root in (SF_DIR, scaled):
        spark.read.parquet(f"{root}/documents.parquet").count()

    pairs = {
        "char_entropy": (char_entropy_jvm_fold, QUERIES["q_llm_char_entropy"]),
        "repetition": (repetition_jvm_zipwith, QUERIES["q_llm_repetition"]),
    }
    report = {}
    for key, (jvm_fn, arrow_fn) in pairs.items():
        jvm_rows = sorted(map(tuple, jvm_fn(spark, SF_DIR).collect()))
        arrow_rows = sorted(map(tuple, arrow_fn(spark, SF_DIR).collect()))
        assert jvm_rows == arrow_rows, f"{key}: JVM vs Arrow value mismatch"
        print(f"{key} parity: {len(jvm_rows)} rows identical",
              file=sys.stderr)
        report[key] = {"parity_rows": len(jvm_rows), "kernels": {}}
        for name, fn in (("jvm", jvm_fn), ("arrow", arrow_fn)):
            t0 = time.perf_counter()
            a1 = sp.force(fn(spark, SF_DIR))
            base = time.perf_counter() - t0
            t0 = time.perf_counter()
            a2 = sp.force(fn(spark, scaled))
            big = time.perf_counter() - t0
            report[key]["kernels"][name] = {
                "t_1x": round(base, 3),
                f"t_{n}x": round(big, 3),
                "factor": round(big / base, 2),
                "action": a1 if a1 == a2 else f"{a1}/{a2}",
            }
            print(f"{key}/{name}: 1x={base:.2f}s {n}x={big:.2f}s "
                  f"factor={big / base:.2f}", file=sys.stderr)
    print(json.dumps({"n": n, "results": report}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
