"""Windowed-warm-up cost of the default TreeDepthCapAdapter (VERDICT r3 #6).

The dynamic NUTS samplers' *default* warm-up adapter list includes
``TreeDepthCapAdapter(mode="rebatch")`` (samplers.py).  Its finalize
re-tunes ``rebatch_depth`` — a *static* (compiled-in) transition
parameter — at every stage boundary, so under a multi-window
``WindowedWarmUpStager`` each boundary *move* forces one recompile of the
following window's stage program (an unchanged boundary returns the
transition unmodified, and a revisited boundary value hits the jit
cache).  This script measures that cost on a 5+-window run:

    python -m benchmarks.windowed_cost [--n-chain 512] [--n-warm 800]

It samples a funnel-like target (depth distribution wide enough that the
tuned boundary can actually move between windows) under the
reference-default adapter list vs the framework-default list, and under
plain vs windowed stagers, reporting wall, XLA compile counts/seconds,
and the sequence of tuned boundaries.
"""

from __future__ import annotations

import argparse
import json
import time

import jax.numpy as jnp
import numpy as np

from mici_tpu import (
    adapters,
    integrators,
    profiling,
    samplers,
    stagers,
    systems,
)


def _funnel_system(dim=16):
    # Neal's funnel: tree depths vary strongly with the funnel coordinate,
    # so the realized depth histogram (and hence the tuned boundary) can
    # move between warm-up windows.
    def neg_log_dens(q):
        v, x = q[0], q[1:]
        return (0.5 * v**2 / 9.0
                + 0.5 * jnp.sum(x**2) * jnp.exp(-v)
                + 0.5 * (dim - 1) * v)

    return systems.EuclideanMetricSystem(neg_log_dens)


def run_case(label, adapter_list, stager, *, n_chain, n_warm, n_main,
             dim, seed=42):
    system = _funnel_system(dim)
    integ = integrators.LeapfrogIntegrator(system, step_size=0.1)
    sampler = samplers.DynamicMultinomialHMC(
        system, integ, seed, max_tree_depth=10,
    )
    rng = np.random.default_rng(seed)
    init_states = list(rng.standard_normal((n_chain, dim)))
    boundaries = []
    orig_finalize = adapters.TreeDepthCapAdapter.finalize

    def tracking_finalize(self, adapt_states, chain_states, transition,
                          key):
        new_transition, new_states = orig_finalize(
            self, adapt_states, chain_states, transition, key)
        boundaries.append(getattr(new_transition, "rebatch_depth", None))
        return new_transition, new_states

    adapters.TreeDepthCapAdapter.finalize = tracking_finalize
    try:
        with profiling.compile_telemetry() as telemetry:
            t0 = time.perf_counter()
            sampler.sample_chains(
                n_warm, n_main, init_states,
                adapters=adapter_list, stager=stager,
                display_progress=False,
            )
            wall = time.perf_counter() - t0
    finally:
        adapters.TreeDepthCapAdapter.finalize = orig_finalize
    return {
        "case": label,
        "wall_s": round(wall, 2),
        "n_compiles": telemetry.n_compiles,
        "compile_s": round(telemetry.compile_seconds_total, 2),
        "boundaries": boundaries,
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n-chain", type=int, default=512)
    parser.add_argument("--n-warm", type=int, default=800)
    parser.add_argument("--n-main", type=int, default=200)
    parser.add_argument("--dim", type=int, default=16)
    args = parser.parse_args()

    # Force >= 5 slow windows plus init/final fast stages.
    windowed = stagers.WindowedWarmUpStager(
        n_init_slow_window_iter=40, n_init_fast_stage_iter=60,
        n_final_fast_stage_iter=60, slow_window_multiplier=1.5,
    )
    # Slow metric adapter triggers the windowed default; include it in
    # both lists so only the depth adapter differs.
    ref_list = [
        adapters.DualAveragingStepSizeAdapter(),
        adapters.OnlineVarianceMetricAdapter(),
    ]
    default_list = ref_list + [adapters.TreeDepthCapAdapter(mode="rebatch")]

    results = []
    for label, adapter_list in [
        ("windowed_reference_adapters", ref_list),
        ("windowed_default_adapters", default_list),
    ]:
        results.append(run_case(
            label, adapter_list, windowed, n_chain=args.n_chain,
            n_warm=args.n_warm, n_main=args.n_main, dim=args.dim,
        ))
        print(json.dumps(results[-1]), flush=True)

    ref, dflt = results
    summary = {
        "extra_compiles": dflt["n_compiles"] - ref["n_compiles"],
        "extra_compile_s": round(
            dflt["compile_s"] - ref["compile_s"], 2),
        "wall_overhead_s": round(dflt["wall_s"] - ref["wall_s"], 2),
        "boundary_moves": sum(
            1 for a, b in zip(dflt["boundaries"], dflt["boundaries"][1:])
            if a != b),
        "boundaries": dflt["boundaries"],
    }
    print(json.dumps({"summary": summary}))


if __name__ == "__main__":
    main()
