"""Head-to-head k-means assignment kernel measurement (VERDICT r12 #3).

q_llm_kmeans is the last big interpreted-HOF hotspot: 61.8 s / factor
12.9 at 1000x (SCALE.md r9) — 2 Lloyd iterations x k=4 in-row
zip_with/aggregate fold assignments, the exact interpreted lambda-eval
profile q_llm_pq_adc graduated from in r12. The candidate Arrow kernel
(_kmeans_assign_kernel) vectorizes the identical arithmetic batch-wise:

- emits the INTEGER cluster id; the embedding column is PASS-THROUGH
  transport (returned byte-identical, never recomputed), so no float
  computed in Python ever crosses back — the house invariant holds;
- float work to pick the argmin uses IEEE basic ops only (subtract,
  multiply, add) in the oracle's exact left-fold order (explicit
  per-position loop, np.sum deliberately avoided — pairwise regrouping);
  the float32 -> float64 widening is exact, matching x.cast("double");
- ties break by np.argmin's first-minimum rule over centroids sorted by
  cluster id == the JVM's array_min over (d2, cluster) structs == the
  oracle's ORDER BY d2, cluster.

This tool keeps the promotion honest, pq_kernel_bench-style:

- VALUE IDENTITY: (a) full (vec_id, cluster) first-iteration assignment
  sets and (b) the complete q_llm_kmeans output (cluster, pos, c,
  n_members) compared between forms at 1x AND x100.
- HEAD TO HEAD: the full 2-iteration kmeans_iterate timed with each
  assignment form at 1x and Nx through scale_probe's force().

Usage: python tools/kmeans_kernel_bench.py [N]   (default 1000)
Results land in SCALE.md r13.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from token_burn_listener_spark.llm.similarity import (  # noqa: E402
    _assign,
    _assign_arrow,
    _init_centroid_values,
    _literal_centroids,
    kmeans_iterate,
)
from token_burn_listener_spark.registry import load_all_modules  # noqa: E402
from token_burn_listener_spark.session import get_spark  # noqa: E402
from token_burn_listener_spark.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")


def _first_assign(spark, root: str, form: str):
    """(vec_id, cluster) after the FIRST assignment pass, per form."""
    e = load_table(spark, root, "embeddings")
    cents_vals = _init_centroid_values(e)
    if form == "jvm":
        a = _assign(e, _literal_centroids(cents_vals))
        return a.select("vec_id", "cluster")
    return _assign_arrow(e, cents_vals).select("vec_id", "cluster")


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
    sp.preflight_sweep()
    spark = get_spark("kmeans-kernel-bench")
    spark.sparkContext.setLogLevel("ERROR")
    scaled = sp.build_scaled(spark, n, {"embeddings": ["vec_id"]})
    mid = sp.build_scaled(spark, 100, {"embeddings": ["vec_id"]})
    for root in (SF_DIR, mid, scaled):
        spark.read.parquet(f"{root}/embeddings.parquet").count()

    # value identity at 1x AND x100: first-pass assignments + final output
    parity = {}
    for label, root in (("1x", SF_DIR), ("100x", mid)):
        jvm = sorted(map(tuple, _first_assign(spark, root, "jvm").collect()))
        arrow = sorted(
            map(tuple, _first_assign(spark, root, "arrow").collect())
        )
        assert jvm == arrow, (
            f"assignments diverge at {label}: {len(jvm)} jvm vs "
            f"{len(arrow)} arrow rows, first differing pair "
            f"{next(((a, b) for a, b in zip(jvm, arrow) if a != b), None)}"
        )
        out_jvm = sorted(map(tuple, kmeans_iterate(
            spark, root, 2, assign_form="jvm").collect()))
        out_arrow = sorted(map(tuple, kmeans_iterate(
            spark, root, 2, assign_form="arrow").collect()))
        assert out_jvm == out_arrow, (
            f"kmeans output diverges at {label}: first differing row "
            f"{next(((a, b) for a, b in zip(out_jvm, out_arrow) if a != b), None)}"
        )
        parity[label] = {"assign_rows": len(jvm), "out_rows": len(out_jvm)}
        print(f"parity {label}: {len(jvm)} assignments + {len(out_jvm)} "
              "output rows identical", file=sys.stderr)

    report = {"parity": parity, "kernels": {}}
    for name in ("jvm", "arrow"):
        t0 = time.perf_counter()
        a1 = sp.force(kmeans_iterate(spark, SF_DIR, 2, assign_form=name))
        base = time.perf_counter() - t0
        t0 = time.perf_counter()
        a2 = sp.force(kmeans_iterate(spark, scaled, 2, assign_form=name))
        big = time.perf_counter() - t0
        report["kernels"][name] = {
            "t_1x": round(base, 3),
            f"t_{n}x": round(big, 3),
            "factor": round(big / base, 2),
            "action": a1 if a1 == a2 else f"{a1}/{a2}",
        }
        print(f"kmeans/{name}: 1x={base:.2f}s {n}x={big:.2f}s "
              f"factor={big / base:.2f}", file=sys.stderr)
    print(json.dumps({"n": n, "results": report}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
