"""Bare-kernel vs driver A/B for config 1 (VERDICT round-3 #3).

The gap probe (benchmarks/gap_probe.py) shows config-1 driver throughput
is unchanged with trace streaming disabled entirely, so the
driver-vs-kernel gap is in the *compiled compute path*, not transfers.
This script times a sequence of progressively more driver-like static-HMC
kernels at the config-1 shape so the gap decomposes into measured
components:

  k0_matmul_minimal   pure matmul-form leapfrog, one fold_in key/iter
  k1_perchain_keys    + per-chain split/normal keys (driver PRNG layout)
  k2_vmap_formulation + vmap-of-per-chain-functions (driver formulation)
  k3_stats_outputs    + per-iteration statistic outputs stacked by scan
  driver              sample_chains(no traces) for reference

Run: python -m benchmarks.kernel_ab [--n-chain 4096] [--n-iter 1200]
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks import configs
from mici_tpu import precision


N_STEP = 10
STEP_SIZE = 0.2


def _sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0]))


def _timed_iters(fn, args, n_iter_static, repeats=2):
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def make_k0(prec_mat, n_iter):
    """Matmul-form leapfrog; single folded key per iteration."""

    @jax.jit
    def run(q, key):
        def body(carry, i):
            q, key = carry
            key, k_mom, k_acc = jax.random.split(key, 3)
            p = jax.random.normal(k_mom, q.shape, q.dtype)
            h0 = (0.5 * jnp.einsum("ci,ij,cj->c", q, prec_mat, q)
                  + 0.5 * jnp.sum(p * p, axis=1))
            q_new, p_new = q, p
            for _ in range(N_STEP):
                p_new = p_new - 0.5 * STEP_SIZE * (q_new @ prec_mat)
                q_new = q_new + STEP_SIZE * p_new
                p_new = p_new - 0.5 * STEP_SIZE * (q_new @ prec_mat)
            h1 = (0.5 * jnp.einsum("ci,ij,cj->c", q_new, prec_mat, q_new)
                  + 0.5 * jnp.sum(p_new * p_new, axis=1))
            u = jax.random.uniform(k_acc, (q.shape[0],), q.dtype)
            accept = u < jnp.exp(h0 - h1)
            q = jnp.where(accept[:, None], q_new, q)
            return (q, key), None

        with precision.matmul_precision_scope():
            (q, _), _ = jax.lax.scan(body, (q, key), jnp.arange(n_iter))
        return q

    return run


def make_k1(prec_mat, n_iter):
    """Per-chain key streams (driver PRNG layout), matmul-form math."""

    @jax.jit
    def run(q, keys):
        def body(carry, _):
            q, keys = carry
            splits = jax.vmap(lambda k: jax.random.split(k, 3))(keys)
            keys, k_mom, k_acc = splits[:, 0], splits[:, 1], splits[:, 2]
            p = jax.vmap(
                lambda k, shape=q.shape[1:]: jax.random.normal(
                    k, shape, q.dtype),
            )(k_mom)
            h0 = (0.5 * jnp.einsum("ci,ij,cj->c", q, prec_mat, q)
                  + 0.5 * jnp.sum(p * p, axis=1))
            q_new, p_new = q, p
            for _ in range(N_STEP):
                p_new = p_new - 0.5 * STEP_SIZE * (q_new @ prec_mat)
                q_new = q_new + STEP_SIZE * p_new
                p_new = p_new - 0.5 * STEP_SIZE * (q_new @ prec_mat)
            h1 = (0.5 * jnp.einsum("ci,ij,cj->c", q_new, prec_mat, q_new)
                  + 0.5 * jnp.sum(p_new * p_new, axis=1))
            u = jax.vmap(
                lambda k: jax.random.uniform(k, (), q.dtype))(k_acc)
            accept = u < jnp.exp(h0 - h1)
            q = jnp.where(accept[:, None], q_new, q)
            return (q, keys), None

        with precision.matmul_precision_scope():
            (q, _), _ = jax.lax.scan(body, (q, keys), None, length=n_iter)
        return q

    return run


def make_k2(prec_mat, n_iter, with_stats=False):
    """vmap-of-per-chain-function formulation (how the driver traces)."""

    def chain_grad(qc):
        return prec_mat @ qc

    def chain_iter(qc, key):
        key, k_mom, k_acc = jax.random.split(key, 3)
        pc = jax.random.normal(k_mom, qc.shape, qc.dtype)
        h0 = 0.5 * qc @ (prec_mat @ qc) + 0.5 * pc @ pc
        qn, pn = qc, pc
        for _ in range(N_STEP):
            pn = pn - 0.5 * STEP_SIZE * chain_grad(qn)
            qn = qn + STEP_SIZE * pn
            pn = pn - 0.5 * STEP_SIZE * chain_grad(qn)
        h1 = 0.5 * qn @ (prec_mat @ qn) + 0.5 * pn @ pn
        u = jax.random.uniform(k_acc, (), qc.dtype)
        accept = u < jnp.exp(h0 - h1)
        qc = jnp.where(accept, qn, qc)
        stats = {
            "accept_stat": jnp.minimum(1.0, jnp.exp(h0 - h1)),
            "hamiltonian": h1,
            "accepted": accept,
        } if with_stats else None
        return qc, key, stats

    @jax.jit
    def run(q, keys):
        def body(carry, _):
            q, keys = carry
            q, keys, stats = jax.vmap(chain_iter)(q, keys)
            return (q, keys), stats

        with precision.matmul_precision_scope():
            (q, _), stats = jax.lax.scan(
                body, (q, keys), None, length=n_iter)
        return (q, stats) if with_stats else q

    return run


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n-chain", type=int, default=4096)
    parser.add_argument("--n-iter", type=int, default=1200)
    args = parser.parse_args()
    n_chain, n_iter = args.n_chain, args.n_iter

    _, cov = configs.correlated_gaussian()
    dtype = jnp.zeros(()).dtype
    prec_mat = jnp.asarray(np.linalg.inv(cov), dtype)
    dim = prec_mat.shape[0]
    rng = np.random.default_rng(1)
    q0 = jnp.asarray(rng.standard_normal((n_chain, dim)), dtype)
    key0 = jax.random.PRNGKey(0)
    keys0 = jax.random.split(key0, n_chain)

    results = {"n_chain": n_chain, "n_iter": n_iter, "dim": dim,
               "n_step": N_STEP, "dtype": str(dtype)}
    cases = [
        ("k0_matmul_minimal", make_k0(prec_mat, n_iter), (q0, key0)),
        ("k1_perchain_keys", make_k1(prec_mat, n_iter), (q0, keys0)),
        ("k2_vmap_formulation", make_k2(prec_mat, n_iter), (q0, keys0)),
        ("k3_stats_outputs", make_k2(prec_mat, n_iter, with_stats=True),
         (q0, keys0)),
    ]
    for label, fn, fn_args in cases:
        sec = _timed_iters(fn, fn_args, n_iter)
        rate = n_chain * n_iter / sec
        results[label] = {
            "wall_s": round(sec, 2),
            "chain_it_per_s": round(rate),
            "leapfrog_steps_per_s": round(rate * N_STEP),
        }
        print(f"{label}: {sec:.2f} s = {rate:,.0f} chain-it/s "
              f"({rate * N_STEP / 1e6:.1f}M leapfrog/s)", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
