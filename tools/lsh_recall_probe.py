"""Planted-pair recall + wall time for the banded LSH family on the
entropy corpus (VERDICT r11 #3).

The --entropy-docs corpus (scale_probe.py) plants one near-dup pair per
two copies of every 50th base doc (copies 2k/2k+1 share their first
~80% of token positions — measured char-shingle J ≈ 0.688). This tool
runs a banded key on that corpus and reports:

- wall time (force(), full evaluation)
- found pairs (the key's output: band-collision AND verified J >= 0.4)
- planted-pair RECALL: |found ∩ planted| / |planted| — the number that
  must hold when the band shape steepens (4x2 -> 6x3 trades background
  selectivity J² -> J³ for per-pair detection 1-(1-J²)⁴ ≈ 0.92 ->
  1-(1-J³)⁶ ≈ 0.91 at J ≈ 0.69: within noise BY DESIGN, verified here
  by measurement).

The planted set is derived from the corpus construction itself: copy =
doc_id div STRIDE, base = doc_id % STRIDE; base % 50 == 0 plants pairs
(2k, 2k+1). Recall uses the RAW planted count as denominator (pairs
whose realized J dips below the 0.4 verify gate count against recall on
every band shape equally — same gate both forms, so the A/B is fair).

Usage: python tools/lsh_recall_probe.py N key[,key...]
       (N = entropy-corpus scale; e.g. 30 for both forms, 100 for the
        steep form the 4x2 twin's disk ceiling blocks)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from token_burn_listener_spark.registry import QUERIES, load_all_modules  # noqa: E402
from token_burn_listener_spark.session import get_spark  # noqa: E402

STRIDE = 10_000_000  # scale_probe's copy key stride


def planted_pairs(spark, root: str):
    """(doc_a, doc_b) the corpus construction planted, doc_a < doc_b."""
    d = spark.read.parquet(f"{root}/documents.parquet").select("doc_id")
    base = F.col("doc_id") % STRIDE
    copy = (F.col("doc_id") / STRIDE).cast("long")
    paired = d.select(
        F.col("doc_id"),
        base.alias("base"),
        copy.alias("copy"),
    ).filter((F.col("base") % 50 == 0))
    a = paired.filter(F.col("copy") % 2 == 0).select(
        F.col("base").alias("b1"),
        (F.col("copy") / 2).cast("long").alias("k"),
        F.col("doc_id").alias("doc_a"),
    )
    b = paired.filter(F.col("copy") % 2 == 1).select(
        F.col("base").alias("b1"),
        ((F.col("copy") - 1) / 2).cast("long").alias("k"),
        F.col("doc_id").alias("doc_b"),
    )
    return a.join(b, ["b1", "k"]).select("doc_a", "doc_b")


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    keys = (
        sys.argv[2].split(",") if len(sys.argv) > 2
        else ["q_llm_minhash_steep"]
    )
    load_all_modules()
    bad = [k for k in keys if k not in QUERIES]
    if bad:
        print(f"unknown keys: {bad}", file=sys.stderr)
        return 2
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "scale_probe",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "scale_probe.py"),
    )
    sp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sp)
    spark = get_spark("lsh-recall-probe")
    spark.sparkContext.setLogLevel("ERROR")
    root = sp.build_scaled(
        spark, n, {"documents": ["doc_id"]}, entropy_docs=True
    )
    spark.read.parquet(f"{root}/documents.parquet").count()
    planted = planted_pairs(spark, root).localCheckpoint(eager=False)
    n_planted = planted.count()
    report = {}
    for k in keys:
        # pin ONE evaluation: the timed force materializes the (small)
        # pair output into the checkpoint, and both counts below read it
        # back — re-constructing the query per count would re-run the
        # full banded join (~wall_sec each) two more times for nothing
        df = QUERIES[k](spark, root).localCheckpoint(eager=False)
        t0 = time.perf_counter()
        action = sp.force(df)
        wall = time.perf_counter() - t0
        found = (
            df.select("doc_a", "doc_b")
            .join(planted, ["doc_a", "doc_b"])
            .count()
        )
        n_found_total = df.count()
        report[k] = {
            "wall_sec": round(wall, 3),
            "action": action,
            "pairs_found": n_found_total,
            "planted": n_planted,
            "planted_found": found,
            "recall": round(found / n_planted, 4) if n_planted else None,
        }
        print(f"{k}: {wall:.1f}s, {n_found_total} pairs, recall "
              f"{found}/{n_planted}", file=sys.stderr)
    print(json.dumps({"n": n, "entropy": True, "results": report}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
