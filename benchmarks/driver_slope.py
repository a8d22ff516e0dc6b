"""Driver fixed-cost vs steady-state slope at config-1 shape (VERDICT #3).

Times sample_chains (no traces) at several n_main values; the slope of
wall vs iterations is the compiled program's true steady-state rate and
the intercept is the per-call host-side cost (init state prep, device
upload, final state fetch + per-chain unstacking over the dev tunnel).
Also times the stage-chunk program body alone via direct dispatch.

Run: python -m benchmarks.driver_slope
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np

from benchmarks import configs


def time_driver(n_chain, n_main):
    sampler, init_states, kwargs = configs.config_1_static_hmc(
        n_chain=n_chain)
    call_kwargs = dict(kwargs, display_progress=False, trace_funcs=[])
    sampler.sample_chains(0, 2, init_states, **call_kwargs)  # compile
    t0 = time.perf_counter()
    sampler.sample_chains(0, n_main, init_states, **call_kwargs)
    return time.perf_counter() - t0


def time_phases(n_chain, n_main):
    """Split one call into init / compute / fetch phases by instrumenting
    the module-level helpers."""
    from mici_tpu import samplers as S

    sampler, init_states, kwargs = configs.config_1_static_hmc(
        n_chain=n_chain)
    call_kwargs = dict(kwargs, display_progress=False, trace_funcs=[])
    sampler.sample_chains(0, 2, init_states, **call_kwargs)

    phases = {}
    orig_chunk = S._run_stage_chunk
    orig_unstack = S._unstack_states

    def timed_chunk(*args, **kw):
        t0 = time.perf_counter()
        out = orig_chunk(*args, **kw)
        jax.block_until_ready(out[0].pos)
        np.asarray(jax.device_get(out[0].pos[:1, :1]))  # force tunnel sync
        phases["chunk_dispatch_s"] = phases.get(
            "chunk_dispatch_s", 0.0) + time.perf_counter() - t0
        return out

    def timed_unstack(batched, n):
        t0 = time.perf_counter()
        out = orig_unstack(batched, n)
        phases["final_unstack_s"] = time.perf_counter() - t0
        return out

    S._run_stage_chunk = timed_chunk
    S._unstack_states = timed_unstack
    try:
        t0 = time.perf_counter()
        sampler.sample_chains(0, n_main, init_states, **call_kwargs)
        phases["total_s"] = time.perf_counter() - t0
    finally:
        S._run_stage_chunk = orig_chunk
        S._unstack_states = orig_unstack
    return phases


def main():
    n_chain = 4096
    results = {"n_chain": n_chain}
    walls = {}
    for n_main in (300, 1200, 4800):
        walls[n_main] = round(time_driver(n_chain, n_main), 2)
        print(f"n_main={n_main}: {walls[n_main]} s", flush=True)
    results["walls"] = walls
    # slope/intercept from endpoints
    slope = (walls[4800] - walls[300]) / (4800 - 300)
    intercept = walls[300] - slope * 300
    results["steady_chain_it_per_s"] = round(n_chain / slope)
    results["fixed_overhead_s"] = round(intercept, 2)
    print(f"steady-state: {n_chain / slope:,.0f} chain-it/s; "
          f"fixed per-call overhead: {intercept:.2f} s", flush=True)
    results["phases_1200"] = {
        k: round(v, 2) for k, v in time_phases(n_chain, 1200).items()
    }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
