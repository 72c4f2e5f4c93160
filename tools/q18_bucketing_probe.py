"""Measure the q18 orderkey-bucketing claim at scale (VERDICT r9 #3).

SCALE.md's r9 record MEASURED that q_tpch_q18ish's 1000x cost is the
~150 M-group l_orderkey aggregate (the shuffle-partition knob made it
WORSE: 567.7 s at 256 partitions), and ASSERTED that the structural fix
is pre-bucketing lineitem+orders on the order key — the r9 lesson being
that attributions are wrong until measured. This probe measures it:

1. reuse the cached 1000x key-shifted root (customer/lineitem/orders);
2. pay the one-time layout cost: write lineitem and orders bucketed
   64-way on the order key (repartitioned to one file per bucket,
   sorted in-bucket) — reported separately as `layout_s`, because at
   100 TB this is the amortized once-per-ingest cost the bucketed
   layout trades for every downstream run;
3. time the q18 shape (identical logical query) over the plain parquet
   root vs the bucketed tables, with the full-evaluation force()
   action, and count Exchanges in each physical plan.

The bucketed form's groupBy(l_orderkey) consumes the scan's
HashPartitioning(l_orderkey, 64) directly — no exchange, no 150 M-group
shuffle — and the big⋈orders join co-locates the same way. Expected:
exchanges drop from 3+ to the customer join's only, and wall time drops
materially under the plain form's; either way the JSON records it.

Usage: python tools/q18_bucketing_probe.py [N]   (default 1000)
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from token_burn_listener_spark.registry import (  # noqa: E402
    QUERIES,
    load_all_modules,
)
from token_burn_listener_spark.scratch import SCRATCH_ROOT  # noqa: E402
from token_burn_listener_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
BUCKETS = 64


def q18_shape(big, o, c):
    """The q_tpch_q18ish logical query over caller-supplied tables."""
    agg = (
        big.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        agg.join(o, agg["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
    )


def n_exchanges(spark, df) -> int:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    return len(re.findall(r"^\(\d+\) Exchange", plan, re.MULTILINE))


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
    spark = get_spark("q18-bucketing-probe")
    spark.sparkContext.setLogLevel("ERROR")
    tables = {t: sp.TABLES[t] for t in ("customer", "lineitem", "orders")}
    scaled = sp.build_scaled(spark, n, tables)
    for t in tables:
        spark.read.parquet(f"{scaled}/{t}.parquet").count()

    # one-time bucketed layout of the scaled facts (cached across runs).
    # The table names carry the same SF_DIR sha1 tag build_scaled() keys
    # its cache on (ADVICE r10): a fixture switch must force a rebuild,
    # never silently reuse tables bucketed from a different source.
    import hashlib

    src = hashlib.sha1(os.path.abspath(SF_DIR).encode()).hexdigest()[:10]
    layout_s = {}
    specs = {
        f"q18bkt_{src}_lineitem_x{n}": ("lineitem", "l_orderkey"),
        f"q18bkt_{src}_orders_x{n}": ("orders", "o_orderkey"),
    }
    for name, (t, key) in specs.items():
        if not spark.catalog.tableExists(name):
            t0 = time.perf_counter()
            (
                spark.read.parquet(f"{scaled}/{t}.parquet")
                .repartition(BUCKETS, F.col(key))
                .write.bucketBy(BUCKETS, key)
                .sortBy(key)
                .option("path", f"{SCRATCH_ROOT}/{name}")
                .mode("overwrite")
                .saveAsTable(name)
            )
            layout_s[t] = round(time.perf_counter() - t0, 3)
            print(f"layout {name}: {layout_s[t]}s", file=sys.stderr)

    plain = lambda: QUERIES["q_tpch_q18ish"](spark, scaled)  # noqa: E731
    c = spark.read.parquet(f"{scaled}/customer.parquet")
    bucketed = lambda: q18_shape(  # noqa: E731
        spark.table(f"q18bkt_{src}_lineitem_x{n}"),
        spark.table(f"q18bkt_{src}_orders_x{n}"),
        c,
    )

    report = {"n": n, "buckets": BUCKETS, "layout_s": layout_s}
    for name, fn in (("plain", plain), ("bucketed", bucketed)):
        df = fn()
        report[f"{name}_exchanges"] = n_exchanges(spark, df)
        t0 = time.perf_counter()
        action = sp.force(df)
        report[name] = {
            "t": round(time.perf_counter() - t0, 3),
            "action": action,
        }
        print(f"{name}: {report[name]['t']}s "
              f"exchanges={report[f'{name}_exchanges']}", file=sys.stderr)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
