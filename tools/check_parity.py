"""Local replica of the driver's correctness gate.

Runs every registered query at a scale factor and compares against its
DuckDB oracle: row count + column names/types + order-insensitive exact
value comparison (a stricter stand-in for the driver's value hash — if this
passes, any order-insensitive hash of the same values passes).

Usage:
    python tools/check_parity.py [key_prefix ...]   # default: all keys
    python tools/check_parity.py --head 50          # simulate driver window
    python tools/check_parity.py --strict-types     # also diff dtype kinds
    SF_DIR=/root/testdata/sf0.01 python tools/check_parity.py q_join

Strictness matches the driver (r03 lesson): a Spark result column holding
list/struct cells is a hard FAIL here because the driver's pandas
canonicalizer cannot sort such cells.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from token_burn_listener_spark.registry import (
    QUERIES,
    ORACLES,
    load_all_modules,
    ordered_keys,
)
from token_burn_listener_spark.session import get_spark
from token_burn_listener_spark.tables import TABLE_NAMES

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize dtypes, sort rows."""
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = s.astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(s):
            s = s.astype("Int64")
        elif pd.api.types.is_float_dtype(s):
            s = s.astype("float64")
        elif s.dtype == object:
            s = s.map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
        out[c] = s
    ndf = pd.DataFrame(out)
    ndf = ndf.sort_values(by=list(ndf.columns), kind="mergesort", na_position="last")
    return ndf.reset_index(drop=True)


def complex_cells(df: pd.DataFrame) -> list[str]:
    """Columns whose cells the driver's canonicalizer cannot sort.

    The driver sorts result rows with pandas ``sort_values``; list / ndarray /
    dict cells raise ``TypeError: unhashable type`` there (r03 q_arr_basic RED
    row). check_parity used to tuple-ize them (masking the failure) — now any
    such column is a hard FAIL so the local gate predicts the driver gate.
    Queries must emit arrays as joined strings / JSON instead.
    """
    bad = []
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            head = s.dropna().head(50)
            if any(isinstance(v, (list, np.ndarray, dict, set)) for v in head):
                bad.append(c)
    return bad


def compare(
    key: str,
    spark_pdf: pd.DataFrame,
    duck_pdf: pd.DataFrame,
    strict_types: bool = False,
) -> list[str]:
    problems = []
    for c in complex_cells(spark_pdf):
        problems.append(
            f"col {c}: list/struct-typed cells — driver canonicalizer cannot "
            "sort these (emit array_join/to_json instead)"
        )
    if problems:
        return problems
    if strict_types:
        import datetime as _dt

        def kind(s: pd.Series) -> str:
            if pd.api.types.is_datetime64_any_dtype(s):
                return "datetime"
            if pd.api.types.is_integer_dtype(s):
                return "int"
            if pd.api.types.is_float_dtype(s):
                return "float"
            if pd.api.types.is_bool_dtype(s):
                return "bool"
            # Spark DateType lands as object-of-date; DuckDB DATE as
            # datetime64. Same kind to the driver (values compare equal,
            # q_date_arith driver-green r03), so same kind here.
            head = s.dropna().head(20)
            if len(head) and all(isinstance(v, _dt.date) for v in head):
                return "datetime"
            return "object"
        for c in sorted(set(spark_pdf.columns) & set(duck_pdf.columns)):
            ks, kd = kind(spark_pdf[c]), kind(duck_pdf[c])
            if ks != kd:
                problems.append(f"col {c}: dtype kind spark={ks} duck={kd}")
        if problems:
            return problems
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    if len(s) == len(d):
        for c in s.columns:
            sv, dv = s[c], d[c]
            if pd.api.types.is_float_dtype(sv):
                eq = (sv.isna() & dv.isna()) | (sv == dv)
            else:
                eq = (sv.isna() & dv.isna()) | (sv == dv).fillna(False)
            bad = (~eq).to_numpy().nonzero()[0]
            if len(bad):
                i = bad[0]
                problems.append(
                    f"col {c}: {len(bad)}/{len(s)} values differ; first at row {i}: "
                    f"spark={sv.iloc[i]!r} duck={dv.iloc[i]!r}"
                )
    return problems


def main() -> int:
    prefixes = sys.argv[1:]
    load_all_modules()
    # DRIVER_ORDER sequence, so a full run exercises the exact ordering the
    # external driver will use (streaming keys mid-sequence and all).
    # ``--head N`` limits to the first N keys of that order — the faithful
    # simulation of the driver's 50-key correctness window.
    strict_types = False
    if "--strict-types" in prefixes:
        strict_types = True
        prefixes = [p for p in prefixes if p != "--strict-types"]
    head = None
    start = 0
    # ``--head N`` = first N keys; ``--slice A B`` = DRIVER_ORDER positions
    # A..B-1 (0-based) — the rehearsal for a FUTURE round's window
    # (e.g. --slice 50 100 = r+1). Flags are parsed wherever they appear;
    # an unknown --flag is a hard error, never a silent zero-key run.
    i = 0
    while i < len(prefixes):
        tok = prefixes[i]
        if tok == "--head":
            head = int(prefixes[i + 1])
            del prefixes[i : i + 2]
        elif tok == "--slice":
            start, head = int(prefixes[i + 1]), int(prefixes[i + 2])
            del prefixes[i : i + 3]
        elif tok.startswith("--"):
            raise SystemExit(f"unknown flag {tok!r}")
        else:
            i += 1
    if prefixes and (start or head is not None):
        raise SystemExit("--head/--slice index DRIVER_ORDER, not a prefix-"
                         "filtered list; use one or the other")
    keys = [
        k
        for k in ordered_keys()
        if not prefixes or any(k.startswith(p) for p in prefixes)
    ][start : head if head is not None else len(QUERIES)]
    print(f"checking {len(keys)} queries at {SF_DIR}")
    spark = get_spark("parity-check")
    con = duck_connection(SF_DIR)
    n_pass = n_fail = n_rows_only = 0
    failures = []
    for k in keys:
        t0 = time.time()
        try:
            sdf = QUERIES[k](spark, SF_DIR).toPandas()
        except Exception:
            n_fail += 1
            failures.append(k)
            print(f"FAIL {k}: spark raised\n{traceback.format_exc()}")
            continue
        if k not in ORACLES:
            # Match the driver's rows>0 smoke semantics: empty output fails.
            if len(sdf) > 0:
                n_rows_only += 1
                note = ""
                cc = complex_cells(sdf)
                if cc:
                    note = f"  [warn: list/struct cells in {cc}]"
                print(f"rows {k}: {len(sdf)} rows ({time.time()-t0:.1f}s){note}")
            else:
                n_fail += 1
                failures.append(k)
                print(f"FAIL {k}: rows-only query returned 0 rows")
            continue
        try:
            ddf = con.execute(ORACLES[k]).df()
        except Exception:
            n_fail += 1
            failures.append(k)
            print(f"FAIL {k}: duckdb raised\n{traceback.format_exc()}")
            continue
        problems = compare(k, sdf, ddf, strict_types=strict_types)
        if problems:
            n_fail += 1
            failures.append(k)
            print(f"FAIL {k} ({time.time()-t0:.1f}s)")
            for p in problems:
                print(f"   - {p}")
        else:
            n_pass += 1
            print(f"ok   {k}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    if failures:
        print("failed:", " ".join(failures))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
