"""Head-to-head MinHash signature-build measurement (r14, VERDICT r13 #1).

The r10–r13 signature build exploded the per-doc shingle array, computed
len(salts) sha256 digests per shingle OCCURRENCE, extracted each of the
n_fns hash windows with a ``conv(substring(hex), 16, 10)`` string
round-trip, and regrouped with a min aggregate. r14 replaces it with one
Arrow kernel pass (``_minhash_sigs`` in llm/dedup.py): per-doc mins
straight off the one-row-per-doc shingle table, each DISTINCT shingle
digested once per batch.

This tool keeps both forms honest:

1. **Value identity at 1x** — the kernel and JVM sig tables are joined
   on doc_id and every sig column compared; any mismatch aborts before
   timing (the bit-exactness proof's empirical leg; the analytical leg
   is in _minhash_sigs' docstring).
2. **Head-to-head timing** at ``N`` corpus copies (docs re-keyed so the
   copies stay distinct), both forms materialized through the noop sink
   (guide §1.4).

Usage: python tools/sig_kernel_bench.py [N]   (default 10; 1 = fixture)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from token_burn_listener_spark.llm.dedup import (  # noqa: E402
    _MH_STEEP_FNS,
    _MH_STEEP_SALTS,
    _minhash_sigs,
    shingled,
)
from token_burn_listener_spark.session import get_spark  # noqa: E402
from token_burn_listener_spark.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")


def jvm_sigs(d, n_fns: int, salts: list[str]):
    """The r12–r13 production signature build, kept verbatim as the
    measured JVM alternative: explode + hoisted salted sha2 digests +
    min(conv(substring)) aggregate."""
    e = d.select("doc_id", F.explode("sh").alias("g")).select(
        "doc_id",
        *[
            F.sha2(
                F.col("g") if not salt else F.concat(F.col("g"), F.lit(salt)),
                256,
            ).alias(f"sha{k}")
            for k, salt in enumerate(salts)
        ],
    )
    return e.groupBy("doc_id").agg(
        *[
            F.min(
                F.conv(
                    F.substring(f"sha{h // 8}", 1 + 8 * (h % 8), 8), 16, 10
                ).cast("long")
            ).alias(f"sig{h}")
            for h in range(n_fns)
        ]
    )


def noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("sig-kernel-bench")
    spark.sparkContext.setLogLevel("ERROR")

    salts = list(_MH_STEEP_SALTS)
    docs = load_table(spark, SF_DIR, "documents")

    # --- 1x value identity (both banding widths) ---
    d1 = shingled(docs).localCheckpoint()
    for n_fns, s in ((8, [""]), (_MH_STEEP_FNS, salts)):
        k = _minhash_sigs(d1, n_fns, tuple(s)).alias("k")
        j = jvm_sigs(d1, n_fns, s).alias("j")
        cols = [f"sig{h}" for h in range(n_fns)]
        diff = F.lit(False)
        for c in cols:
            diff = diff | ~F.col(f"k.{c}").eqNullSafe(F.col(f"j.{c}"))
        mism = (
            k.join(j, F.col("k.doc_id") == F.col("j.doc_id"), "full")
            .where(
                F.col("k.doc_id").isNull() | F.col("j.doc_id").isNull() | diff
            )
            .count()
        )
        assert mism == 0, f"{n_fns}-fn sig tables differ on {mism} docs"
        print(f"identity ok: {n_fns}-fn kernel == JVM on every doc")

    # --- xN timing (steep 18-fn shape, the production width) ---
    big = docs
    if n > 1:
        n_docs = docs.count()
        big = (
            spark.range(n)
            .crossJoin(docs)
            .select(
                (F.col("doc_id") + F.col("id") * F.lit(n_docs)).alias("doc_id"),
                "text",
            )
        )
    dbig = shingled(big).localCheckpoint()
    dbig.count()  # pin materialized before timing
    t_jvm = noop(jvm_sigs(dbig, _MH_STEEP_FNS, salts))
    t_ker = noop(_minhash_sigs(dbig, _MH_STEEP_FNS, tuple(salts)))
    t_jvm2 = noop(jvm_sigs(dbig, _MH_STEEP_FNS, salts))
    t_ker2 = noop(_minhash_sigs(dbig, _MH_STEEP_FNS, tuple(salts)))
    print(
        f"x{n}: jvm {t_jvm:.2f}/{t_jvm2:.2f}s  kernel {t_ker:.2f}/{t_ker2:.2f}s"
        f"  (18 fns, {len(salts)} digests per shingle)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
