"""Fixed-point-solver A/B on the headline config (ROADMAP #3).

The SoftAbs RMHMC implicit-leapfrog kernel (BASELINE config 3) spends
its per-leaf budget in the two fixed-point solves.  All solvers find the
same fixed points (to tolerance), so the stationary distribution and
per-iteration ESS are unchanged — a solver swap is a pure wall-time
trade between per-iteration cost (function evaluations, linear algebra)
and lockstep rounds saved.  This probe measures steady-state throughput
of the config-3 kernel under each shipped fixed-point solver
(mici_tpu/solvers.py: direct, Steffensen, Newton, Anderson) at the
headline batch size, plus convergence-failure rates so a "faster" solver
that silently trades failures for speed is visible.

Usage: python -m benchmarks.solver_ab [--n-chain N] [--n-main N]
Prints one JSON row per solver; record results in docs/BENCHMARKS.md.
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np

from mici_tpu import solvers
from mici_tpu.diagnostics import effective_sample_size

SOLVERS = {
    "direct": solvers.solve_fixed_point_direct,
    "steffensen": solvers.solve_fixed_point_steffensen,
    "newton": solvers.solve_fixed_point_newton,
    "anderson": solvers.solve_fixed_point_anderson,
}


def run_solver_variant(label, solver, n_chain=1024, n_warm=32, n_main=192,
                       chunk=16, step_size=0.2, max_tree_depth=4,
                       fp_tol=1e-5, fp_max_iters=30, reverse_check_tol=1e-3):
    import jax
    import jax.numpy as jnp

    from benchmarks.configs import banana_exact_sample, banana_neg_log_dens
    from mici_tpu import integrators, systems, transitions
    from mici_tpu.precision import matmul_precision_scope
    from mici_tpu.states import ChainState

    system = systems.SoftAbsRiemannianMetricSystem(
        banana_neg_log_dens, softabs_coeff=1.0)
    integrator = integrators.ImplicitLeapfrogIntegrator(
        system, step_size=step_size, reverse_check_tol=reverse_check_tol,
        fixed_point_solver=solver,
        fixed_point_solver_kwargs={
            "convergence_tol": fp_tol, "max_iters": fp_max_iters,
        })
    transition = transitions.MultinomialDynamicIntegrationTransition(
        system, integrator, max_tree_depth=max_tree_depth)

    @functools.partial(jax.jit, static_argnums=(2,))
    def run(states, keys, n_iter):
        def chain(state, key):
            def body(state, k):
                k1, k2 = jax.random.split(k)
                state = state.replace(
                    mom=system.sample_momentum(state, k1))
                state, stats = transition.sample(state, k2)
                return state, (state.pos, stats["accept_stat"],
                               stats["convergence_error"])

            ks = jax.random.split(key, n_iter)
            return jax.lax.scan(body, state, ks)

        with matmul_precision_scope():
            return jax.vmap(chain)(states, keys)

    dtype = jnp.zeros(()).dtype
    pos0 = jnp.asarray(banana_exact_sample(n_chain, seed=1), dtype)
    states = jax.vmap(
        lambda q: system.prepare_state(
            ChainState(pos=q, mom=jnp.zeros_like(q), dir=1)),
    )(pos0)

    def host_sync(x):
        return np.asarray(x[:1, :1])

    keys = jax.random.split(jax.random.PRNGKey(0), n_chain)
    for i in range(n_warm // chunk):
        states, _ = run(states, keys, chunk)
        keys = jax.random.split(jax.random.PRNGKey(1000 + i), n_chain)
    host_sync(states.pos)

    pos_chunks, acc_chunks, conv_chunks = [], [], []
    t0 = time.perf_counter()
    for i in range(n_main // chunk):
        keys = jax.random.split(jax.random.PRNGKey(2000 + i), n_chain)
        states, (pos, acc, conv) = run(states, keys, chunk)
        pos_chunks.append(pos)
        acc_chunks.append(acc)
        conv_chunks.append(conv)
    host_sync(states.pos)
    elapsed = time.perf_counter() - t0

    pos = np.concatenate([np.asarray(c) for c in pos_chunks], axis=1)
    acc = np.concatenate([np.asarray(c) for c in acc_chunks], axis=1)
    conv = np.concatenate([np.asarray(c) for c in conv_chunks], axis=1)
    ess = np.array([
        effective_sample_size(pos[:, :, d]) for d in range(pos.shape[-1])
    ])
    return {
        "solver": label,
        "n_chain": n_chain,
        "n_main": n_main,
        "wall_s": round(elapsed, 2),
        "chain_iters_per_sec": round(n_chain * n_main / elapsed, 1),
        "ess_per_sec": round(float(ess.mean()) / elapsed, 2),
        "ess_per_chain_iter": round(
            float(ess.mean()) / (n_chain * n_main), 5),
        "mean_accept": round(float(acc.mean()), 4),
        "convergence_failure_rate": round(float(conv.mean()), 5),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n-chain", type=int, default=1024)
    parser.add_argument("--n-main", type=int, default=192)
    parser.add_argument("--solvers", nargs="*", default=list(SOLVERS))
    args = parser.parse_args()

    rows = []
    for label in args.solvers:
        row = run_solver_variant(
            label, SOLVERS[label], n_chain=args.n_chain, n_main=args.n_main)
        rows.append(row)
        print(json.dumps(row), flush=True)

    best = max(rows, key=lambda r: r["ess_per_sec"])
    base = next((r for r in rows if r["solver"] == "direct"), rows[0])
    print(json.dumps({
        "summary": "best_vs_direct",
        "best": best["solver"],
        "speedup": round(
            best["ess_per_sec"] / base["ess_per_sec"], 3),
    }))


if __name__ == "__main__":
    main()
