"""Driver-window rehearsal: the EXACT external-driver flow, pre-flighted.

The per-round driver builds its OWN vanilla SparkSession (none of this
repo's session confs), imports ``__spark_entry__``, and records the first
50 keys of ``queries()`` against ``oracle_sql()``. check_parity covers the
same math but through ``get_spark`` — which could mask a dependency on a
session conf the driver never sets (the r03→r04 nanosAsLong lesson). This
tool removes that gap: a bare ``SparkSession.builder.master(...)`` with no
repo confs, the contract module imported exactly as the driver does, and
check_parity's own comparator on the result.

Usage:
    python tools/rehearse_window.py              # head 50 = next driver window
    python tools/rehearse_window.py 30           # head N
    python tools/rehearse_window.py 50 100       # DRIVER_ORDER slice [A, B)
                                                 #   (a FUTURE round's window)

Round 6 run (2026-08-14): head 50 → 50 pass, 0 fail — the full r06
window (r5-added octet, r4b tail, Python sources, UDF surface) is green
under the driver's own session shape.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if len(args) == 2:
        start, end = int(args[0]), int(args[1])
    elif len(args) == 1:
        start, end = 0, int(args[0])
    else:
        start, end = 0, 50

    from pyspark.sql import SparkSession

    # Vanilla on purpose: no shuffle sizing, no nanosAsLong, no TZ pin —
    # whatever the queries need must be applied at runtime by the package
    # (session.configure via tables.load_table), as in the real driver.
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', 8)}]")
        .appName("rehearse-window")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as contract

    qs = contract.queries()
    oracles = contract.oracle_sql()
    window = list(qs)[start:end]

    spec = importlib.util.spec_from_file_location(
        "check_parity", os.path.join(_ROOT, "tools", "check_parity.py")
    )
    cp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cp)
    con = cp.duck_connection(SF_DIR)

    print(f"rehearsing DRIVER_ORDER[{start}:{end}] = {len(window)} keys at {SF_DIR}")
    n_pass = n_rows = n_fail = 0
    failures = []
    for k in window:
        t0 = time.time()
        try:
            sdf = qs[k](spark, SF_DIR).toPandas()
        except Exception as exc:
            n_fail += 1
            failures.append(k)
            print(f"FAIL {k}: spark raised: {type(exc).__name__}: {exc}")
            continue
        if k not in oracles:
            if len(sdf) > 0:
                n_rows += 1
                print(f"rows {k}: {len(sdf)} ({time.time() - t0:.1f}s)")
            else:
                n_fail += 1
                failures.append(k)
                print(f"FAIL {k}: rows-only query returned 0 rows")
            continue
        try:
            ddf = con.execute(oracles[k]).df()
        except Exception as exc:
            n_fail += 1
            failures.append(k)
            print(f"FAIL {k}: duckdb raised: {exc}")
            continue
        problems = cp.compare(k, sdf, ddf, strict_types=True)
        if problems:
            n_fail += 1
            failures.append(k)
            print(f"FAIL {k}: {problems}")
        else:
            n_pass += 1
            print(f"ok   {k}: {len(sdf)} rows ({time.time() - t0:.1f}s)")

    print(f"\nwindow rehearsal: {n_pass} pass, {n_fail} fail, {n_rows} rows-only")
    if failures:
        print("failed:", " ".join(failures))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
