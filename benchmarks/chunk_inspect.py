"""Inspect the compiled config-1 stage-chunk program (VERDICT #3).

Times mici_tpu.samplers._run_stage_chunk directly (full final-state
fetch) and prints HLO op histograms of its compiled module next to the
equivalent minimal kernel, so the driver-vs-kernel gap can be attributed
to specific lowered structures rather than guessed at.

Run: python -m benchmarks.chunk_inspect [--n-iter 300]
"""

from __future__ import annotations

import argparse
import collections
import json
import re
import time

import jax
import numpy as np

from benchmarks import configs
from benchmarks.kernel_ab import make_k2
from mici_tpu import samplers as S


def build_driver_args(n_chain):
    sampler, init_states, _ = configs.config_1_static_hmc(n_chain=n_chain)
    init_states = [sampler._coerce_init_state(s) for s in init_states]
    states = S._stack_states(init_states)
    system = sampler._get_system()
    states = S._prepare_states_batch(system, states)
    states = sampler._finalize_init_states(states, n_chain)
    chain_keys = jax.random.split(jax.random.PRNGKey(0), n_chain)
    trans_keys = tuple(sampler.transitions)
    transitions = dict(sampler.transitions)
    params = {k: {} for k in trans_keys}
    return transitions, states, chain_keys, params, trans_keys


def op_histogram(compiled_text):
    hist = collections.Counter()
    for line in compiled_text.splitlines():
        m = re.match(r"\s*(?:ROOT\s+)?%?[\w.\-]+\s*=\s*[\w\[\]{},\s]*\s*"
                     r"([a-z\-]+[a-z0-9\-]*)\(", line)
        if m:
            hist[m.group(1)] += 1
    return hist


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n-chain", type=int, default=4096)
    parser.add_argument("--n-iter", type=int, default=300)
    args = parser.parse_args()
    n_chain, n_iter = args.n_chain, args.n_iter

    transitions, states, chain_keys, params, trans_keys = (
        build_driver_args(n_chain))

    def run_chunk():
        return S._run_stage_chunk(
            transitions, states, chain_keys, params, {},
            trans_keys=trans_keys, adapters=(), trace_funcs=None,
            n_iter=n_iter,
        )

    out = run_chunk()
    np.asarray(jax.device_get(out[0].pos))  # full sync
    t0 = time.perf_counter()
    out = run_chunk()
    np.asarray(jax.device_get(out[0].pos))
    chunk_s = time.perf_counter() - t0
    rate = n_chain * n_iter / chunk_s
    print(f"driver chunk: {chunk_s:.2f} s = {rate:,.0f} chain-it/s",
          flush=True)

    # Compiled HLO of the chunk program.
    lowered = S._run_stage_chunk.lower(
        transitions, states, chain_keys, params, {},
        trans_keys=trans_keys, adapters=(), trace_funcs=None,
        n_iter=n_iter,
    )
    chunk_hlo = lowered.compile().as_text()

    _, cov = configs.correlated_gaussian()
    import jax.numpy as jnp

    prec_mat = jnp.asarray(np.linalg.inv(cov), jnp.zeros(()).dtype)
    kernel = make_k2(prec_mat, n_iter)
    q0 = jnp.zeros((n_chain, 100), prec_mat.dtype)
    keys0 = jax.random.split(jax.random.PRNGKey(0), n_chain)
    kernel_hlo = kernel.lower(q0, keys0).compile().as_text()

    hist_chunk = op_histogram(chunk_hlo)
    hist_kernel = op_histogram(kernel_hlo)
    keys = sorted(set(hist_chunk) | set(hist_kernel),
                  key=lambda k: -(hist_chunk.get(k, 0)))
    print(f"{'op':28s} {'driver':>8s} {'kernel':>8s}")
    for k in keys:
        print(f"{k:28s} {hist_chunk.get(k, 0):8d} "
              f"{hist_kernel.get(k, 0):8d}", flush=True)
    with open("/tmp/runs/chunk_driver.hlo", "w") as f:
        f.write(chunk_hlo)
    with open("/tmp/runs/chunk_kernel.hlo", "w") as f:
        f.write(kernel_hlo)
    print(json.dumps({"chunk_s": round(chunk_s, 2),
                      "chain_it_per_s": round(rate)}))


if __name__ == "__main__":
    main()
