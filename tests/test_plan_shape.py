"""Optimized-plan shape assertions for the Generate materialization barriers.

The winnow/simhash kernels pin their per-char/per-shingle intermediates
with ``explode(array(e))`` — a Generate node CollapseProject cannot
cross. That pin is load-bearing for PERFORMANCE only: if a future Spark
version adds a rule that collapses a single-element explode, Catalyst
would silently re-inline the intermediate into every consumer lambda
(O(chars) → O(chars²) re-hash per row — the measured 64× SimHash blowup
at r4 and the 24 GB winnow exchange at r9) while every value-level test
stays green. These tests make that optimizer change fail loudly instead
(ADVICE r9): the OPTIMIZED plan must still contain the Generate nodes,
and the projections ABOVE them must reference the pinned attribute, not
a re-inlined copy of the kernel expression.

(q_llm_winnow left this family in r10 — its production kernel is now the
measured-faster Arrow mapInPandas, which has no Generate to pin; the
flat-SQL form it replaced stays measurable in tools/winnow_kernel_bench.)
"""

from __future__ import annotations

from token_burn_listener_spark.registry import QUERIES, load_all_modules

load_all_modules()


def _assert_barrier(spark, sf_dir, key: str, n_generate: int, marker: str):
    """The optimized plan must keep >= n_generate Generate nodes, and
    `marker` (a fragment of the pinned kernel expression) must not appear
    ABOVE the first Generate — its presence there means CollapseProject
    crossed the pin and re-inlined the kernel into a consumer projection.
    """
    plan = str(
        QUERIES[key](spark, sf_dir)._jdf.queryExecution().optimizedPlan()
    )
    assert plan.count("Generate ") >= n_generate, (
        f"{key}: expected >= {n_generate} Generate barrier(s) in the "
        f"optimized plan — an optimizer rule collapsed the "
        f"explode(array(e)) pin; re-hash blowup is back:\n{plan}"
    )
    # the plan string prints top-down: everything before the FIRST
    # Generate line is the consumer side of the barrier
    above = plan.split("Generate ")[0]
    assert marker not in above, (
        f"{key}: kernel expression `{marker}` re-inlined above the "
        f"Generate barrier — CollapseProject crossed the pin:\n{plan}"
    )


def test_simhash_generate_barrier(spark, sf_dir):
    # simhash pins the hashed shingles; the 64 bit-vote aggregates must
    # consume `hs`, never re-hash the shingles 64×
    _assert_barrier(spark, sf_dir, "q_llm_simhash", 1, "xxhash64(")


def test_char_entropy_generate_barrier(spark, sf_dir):
    # char_entropy pins the sorted char array; the fold's run-close term
    # divides by size(chars) and must read the bound attribute — inlined,
    # every closed run re-splits and re-sorts the whole document
    _assert_barrier(spark, sf_dir, "q_llm_char_entropy", 1, "array_sort(")
