"""Config-1 driver-vs-kernel gap attribution probe (VERDICT round-3 #3).

Measures, on the real chip, the components of the config-1 driver wall:
raw device->host bandwidth, bare compute without trace output, and the
driver at several trace-streaming settings.  Usage:

    python -m benchmarks.gap_probe [--n-chain 4096] [--n-main 1200]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks import configs


def _timed(fn, *, repeats=2):
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def measure_d2h_bandwidth(n_bytes=256 << 20):
    """Bulk device->host rate with full page-touch verification.

    ``jax.device_get`` through the axon tunnel can return a lazily
    materialized buffer, so the transfer is only complete once every
    byte has been read on host (a plain ``device_get`` timed 13 TB/s).
    Note the dev tunnel's bulk rate is wildly window-dependent —
    measured 7 MB/s to 8 GB/s for identical fetches an hour apart
    (docs/BENCHMARKS.md round-4) — so treat single readings as a
    chip-state probe, not a constant.
    """
    n = n_bytes // 4
    arr = jax.jit(lambda x: x * 1.000001)(jnp.zeros((n,), jnp.float32))
    jax.block_until_ready(arr)
    float(np.asarray(jax.device_get(arr[:8])).sum())

    def fetch():
        float(np.asarray(jax.device_get(arr)).sum())

    sec = _timed(fetch)
    return n_bytes / sec / 1e9


def run_driver(n_chain, n_main, *, trace_funcs="default", chunk_size=None,
               trace_summary=False, n_warm=0):
    sampler, init_states, kwargs = configs.config_1_static_hmc(
        n_chain=n_chain)
    call_kwargs = dict(kwargs, display_progress=False)
    if trace_funcs is None:
        call_kwargs["trace_funcs"] = []
    if chunk_size is not None:
        call_kwargs["chunk_size"] = chunk_size
    if trace_summary:
        call_kwargs["trace_summary"] = trace_summary
    # Warm call compiles; timed call measures steady state.
    sampler.sample_chains(0, 2, init_states, **call_kwargs)
    t0 = time.perf_counter()
    out = sampler.sample_chains(n_warm, n_main, init_states, **call_kwargs)
    elapsed = time.perf_counter() - t0
    return elapsed, out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n-chain", type=int, default=4096)
    parser.add_argument("--n-main", type=int, default=1200)
    args = parser.parse_args()
    n_chain, n_main = args.n_chain, args.n_main
    results = {"n_chain": n_chain, "n_main": n_main,
               "platform": jax.devices()[0].platform,
               "device": str(jax.devices()[0])}

    results["d2h_GBps"] = round(measure_d2h_bandwidth(), 2)
    print(f"device->host bandwidth: {results['d2h_GBps']} GB/s", flush=True)

    trace_bytes = n_chain * n_main * 101 * 8
    results["trace_GB"] = round(trace_bytes / 1e9, 2)

    for label, kw in [
        ("no_traces", {"trace_funcs": None}),
        ("summary_only", {"trace_summary": "only"}),
        ("full_single_chunk", {}),
        ("full_chunk_100", {"chunk_size": 100}),
        ("full_chunk_200", {"chunk_size": 200}),
    ]:
        elapsed, _ = run_driver(n_chain, n_main, **kw)
        rate = n_chain * n_main / elapsed
        results[label] = {
            "wall_s": round(elapsed, 2),
            "chain_it_per_s": round(rate),
            "leapfrog_steps_per_s": round(rate * 10),
        }
        print(f"{label}: {elapsed:.2f} s = {rate:,.0f} chain-it/s",
              flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
