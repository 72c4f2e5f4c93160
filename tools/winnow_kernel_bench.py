"""Head-to-head winnow kernel measurement (VERDICT r9 #2).

The winnowing fingerprint was the record's worst absolute per-row
constant (r9: 335.7 s at 5 M docs with the plan shape already map-only
and zero-exchange). The prescribed experiment — flatten the per-gram
HOF stack AND try an Arrow variant, measure both at 1000x, keep the
winner — ran in r10:

    kernel     1x      1000x (5 M docs)   factor
    r9 HOF     4.35    335.7 (part-hollow) 77.2
    sql_flat   2.14     95.3               44.5
    arrow      1.17     24.5               20.9   <- production

All three are value-identical (5000-row exact parity asserted below),
so the DuckDB oracle holds for any of them. The Arrow kernel is now the
production q_llm_winnow (llm/prep.py); the flat-SQL form lives HERE as
the measured JVM alternative — re-run this tool whenever either kernel
changes to keep the comparison honest.

Usage: python tools/winnow_kernel_bench.py [N]   (default 1000)
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


def winnow_sql_flat(spark, sf_dir: str):
    """The best-measured PURE-JVM winnow kernel (the r10 flat form):
    one expanded mod-deferred polynomial per gram (stepwise (a*31+b)%p
    ≡ Σ c_{i+k}·31^(4-k) mod p — the expanded sum tops out at ~5.2e12,
    far inside int64, so ANSI cannot overflow), least() over four
    element_at reads for the window min, codes/hashes pinned behind
    explode(array(e)) Generate barriers so CollapseProject cannot
    re-inline them into consumer lambdas (O(chars²) otherwise)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    codes = F.expr(
        "transform(split(text, ''), c -> CAST(ascii(c) AS BIGINT))"
    )
    with_codes = d.select("doc_id", F.explode(F.array(codes)).alias("codes"))
    hashes = F.expr(
        "CASE WHEN size(codes) >= 5 THEN"
        " transform(sequence(1, size(codes) - 4), i ->"
        "   (element_at(codes, i) * 923521L"
        "    + element_at(codes, i + 1) * 29791L"
        "    + element_at(codes, i + 2) * 961L"
        "    + element_at(codes, i + 3) * 31L"
        "    + element_at(codes, i + 4)) % 2147483647L)"
        " ELSE array(aggregate(codes, 0L,"
        "            (a, b) -> (a * 31 + b) % 2147483647)) END"
    )
    with_h = with_codes.select("doc_id", F.explode(F.array(hashes)).alias("h"))
    winnow = F.expr(
        "array_sort(array_distinct("
        " CASE WHEN size(h) >= 4 THEN"
        "  transform(sequence(1, size(h) - 3), j ->"
        "    least(element_at(h, j), element_at(h, j + 1),"
        "          element_at(h, j + 2), element_at(h, j + 3)))"
        " ELSE array(array_min(h)) END))"
    )
    return with_h.select(
        "doc_id",
        F.size("h").cast("long").alias("n_grams"),
        F.array_join(
            F.transform(winnow, lambda x: x.cast("string")), ","
        ).alias("winnow"),
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
    spark = get_spark("winnow-kernel-bench")
    spark.sparkContext.setLogLevel("ERROR")
    scaled = sp.build_scaled(spark, n, {"documents": ["doc_id"]})
    for root in (SF_DIR, scaled):
        spark.read.parquet(f"{root}/documents.parquet").count()

    # parity of the two kernels at 1x, value-exact (sorted rows)
    sql_rows = sorted(map(tuple, winnow_sql_flat(spark, SF_DIR).collect()))
    arrow_rows = sorted(
        map(tuple, QUERIES["q_llm_winnow"](spark, SF_DIR).collect())
    )
    assert sql_rows == arrow_rows, "kernel mismatch: SQL vs Arrow"
    print(f"parity: {len(sql_rows)} rows identical", file=sys.stderr)

    report = {}
    for name, fn in (
        ("sql_flat", winnow_sql_flat),
        ("arrow", QUERIES["q_llm_winnow"]),
    ):
        t0 = time.perf_counter()
        a1 = sp.force(fn(spark, SF_DIR))
        base = time.perf_counter() - t0
        t0 = time.perf_counter()
        a2 = sp.force(fn(spark, scaled))
        big = time.perf_counter() - t0
        report[name] = {
            "t_1x": round(base, 3),
            f"t_{n}x": round(big, 3),
            "factor": round(big / base, 2),
            "action": a1 if a1 == a2 else f"{a1}/{a2}",
        }
        print(f"{name}: 1x={base:.2f}s {n}x={big:.2f}s "
              f"factor={big / base:.2f}", file=sys.stderr)
    print(json.dumps({"n": n, "kernels": report}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
