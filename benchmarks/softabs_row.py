"""Large-N SoftAbs RMHMC artifact row: end-to-end dispatched-eigh exercise.

VERDICT round-4 weak #3 asked for an artifact row that exercises the
large-N SoftAbs eigh regime end-to-end (the headline SoftAbs config is
dim 2; the roofline rows take the Cholesky path).  Round-5 measurements
changed the landscape the item assumed:

* the Pallas lane-kernel eigh has a **>9.5-minute Mosaic backend compile
  at n = 32** (round-4's unattributed 197.5 s compile) — it cannot be
  the auto path or the blocked-eigh pivot on TPU;
* the blocked block-Jacobi eigh **loses 11x to XLA's native eigh** at
  its target regime ((B=64, N=256): 1.72 s vs 0.151 s steady);
* the new pure-XLA :func:`mici_tpu.ops.batched_linalg.parallel_jacobi_eigh`
  beats XLA standalone at lane-friendly sizes ((B=512, N=32): 0.073 s
  vs 0.093 s) with ~3 s compiles and a tiny graph that inlines safely
  inside the implicit integrators' nested ``while_loop``s (the round-1
  QDWH compile-blowup motivation);
* and this row's own end-to-end A/B then caught the first round-5
  window (parallel for 8 < N <= 64 at batch >= 64) being wrong by 4x:
  at (B=64, N=64) through the driver, forced-XLA ran 47.6 chain-it/s
  vs the parallel path's 11.3 (BENCH round 5).

So the auto dispatch window is held strictly to the measured-win
region: parallel Jacobi only for 8 < N <= 32 at batch >= 512 TPU f32,
XLA everywhere else (mici_tpu/ops/dispatch.py).  This row runs
SoftAbs-metric RMHMC **at dim 64** through the generic
``sample_chains`` driver — the regime the A/B reversal was measured in,
now auto-routed to XLA — with same-shape forced-mode arms
(``parallel``, ``blocked``) recorded in the artifact, so the dispatch
decision stays backed by an end-to-end measurement every round.

Reference analogue: the SoftAbs metric system + matrix
(/root/reference/src/mici/systems.py:1737-1920,
/root/reference/src/mici/matrices.py:1631-1685).

**Target with an exact moment oracle at any dim.**  A rotated product of
identical 1-D quartics: with ``z = Q^T x`` for a fixed orthogonal ``Q``,

    nld(x) = sum_i v(z_i),        v(t) = t^2 / 2 + (lam / 4) t^4.

Moments of ``x``: E[x] = 0 and Cov[x] = var_1d * I exactly (each ``z_i``
is iid with variance ``var_1d`` from 1-D quadrature; an orthogonal
rotation of an isotropic covariance is itself).  The Hessian
``H(x) = Q diag(1 + 3 lam z^2) Q^T`` is **dense and position-dependent**,
so the eigendecomposition is genuine work, while the statistical gate
stays exact.  Analytic gradient / Hessian / matrix-Tressian-product are
supplied (like the reference benchmark's analytic-derivative setup) so
the per-step cost is the metric linear algebra, not dim forward-mode
Hessian passes.

A/B arms use a per-mode structural tag on the model functions so each
mode compiles its own program (dispatch mode is a trace-time global and
is NOT part of the jit cache key — without the tag the later modes would
silently reuse the first mode's executable).
"""

from __future__ import annotations

import time

import numpy as np

DIM = 64
N_CHAIN = 64  # the (B=64, N=64) regime where the end-to-end A/B
# reversed the first round-5 dispatch window (see module docstring).
LAM = 0.5
SOFTABS_COEFF = 1.0
# Step size from a measured sweep (dim 40, CPU): 0.5 diverges the direct
# fixed-point iteration (convergence_error 1.0), 0.25 -> accept 0.67 with
# 8% solver failures, 0.1 -> accept 0.97 with none; 0.15 sits at high
# acceptance with zero failures.  The SoftAbs metric whitens each rotated
# coordinate identically, so the sweep transfers across dim.
STEP_SIZE = 0.15
N_STEP = 4


def quartic_1d_var(lam=LAM):
    """Variance of the 1-D density exp(-(t^2/2 + lam t^4/4)) by quadrature."""
    t = np.linspace(-8.0, 8.0, 8001)
    dens = np.exp(-(0.5 * t**2 + 0.25 * lam * t**4))
    z = np.trapezoid(dens, t)
    return float(np.trapezoid(t**2 * dens, t) / z)


def make_softabs_setup(dim=DIM, n_chain=N_CHAIN, seed=0,
                       step_size=STEP_SIZE, n_step=N_STEP, mode_tag="auto"):
    """SoftAbs RMHMC on the rotated-quartic target (module docstring).

    ``mode_tag`` rides along as an unused default argument of the model
    functions: numerically inert, but it makes setups for different
    dispatch modes structurally distinct so each compiles fresh under
    its own ``force_dispatch`` scope.
    """
    import jax.numpy as jnp

    from mici_tpu import integrators, samplers, systems

    dtype = jnp.zeros(()).dtype
    rng = np.random.default_rng(seed)
    q_host, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
    q_rot = jnp.asarray(q_host, dtype)
    lam = LAM

    def neg_log_dens(x, _tag=mode_tag):
        z = q_rot.T @ x
        return 0.5 * jnp.sum(z**2) + 0.25 * lam * jnp.sum(z**4)

    def grad_neg_log_dens(x, _tag=mode_tag):
        z = q_rot.T @ x
        return q_rot @ (z + lam * z**3)

    def hess_neg_log_dens(x, _tag=mode_tag):
        z = q_rot.T @ x
        return (q_rot * (1.0 + 3.0 * lam * z**2)) @ q_rot.T

    def mtp_neg_log_dens(x, _tag=mode_tag):
        # H(x) = Q diag(d(z)) Q^T with d(z) = 1 + 3 lam z^2, z = Q^T x,
        # so  mtp(m)_k = sum_ij m_ij dH_ij/dx_k
        #             = [Q (6 lam z * diag(Q^T m Q))]_k.
        z = q_rot.T @ x

        def mtp(m):
            m = jnp.asarray(m)
            return q_rot @ (
                6.0 * lam * z * jnp.diagonal(q_rot.T @ m @ q_rot)
            )

        hess = (q_rot * (1.0 + 3.0 * lam * z**2)) @ q_rot.T
        return mtp, hess

    system = systems.SoftAbsRiemannianMetricSystem(
        neg_log_dens, grad_neg_log_dens=grad_neg_log_dens,
        hess_neg_log_dens=hess_neg_log_dens,
        mtp_neg_log_dens=mtp_neg_log_dens, softabs_coeff=SOFTABS_COEFF,
    )
    integrator = integrators.ImplicitLeapfrogIntegrator(
        system, step_size=step_size,
        fixed_point_solver_kwargs={
            "convergence_tol": 1e-5, "max_iters": 30,
        },
    )
    sampler = samplers.StaticMetropolisHMC(
        system, integrator, seed, n_step=n_step,
    )
    var_1d = quartic_1d_var(lam)
    init = list(
        rng.standard_normal((n_chain, dim)) * np.sqrt(var_1d),
    )
    return sampler, init


def _timed_run(sampler, init, n_warm, n_main, trace_dim_cap=8):
    kwargs = {
        "adapters": None,
        "trace_funcs": [lambda state: {"pos": state.pos[:trace_dim_cap]}],
        # Implicit SoftAbs RMHMC at dim 64 runs ~seconds per iteration
        # on slow chip windows: the auto chunk of 16 iterations made one
        # device execution of ~1-2 minutes, which the shared dev TPU
        # worker's execution deadline killed ("TPU worker process
        # crashed or restarted" — measured round 5, reproducible with a
        # plain matmul scan at ~150 s).  Guard-mode time-capped
        # chunking: a static 4-iteration chunk (known safe, one compiled
        # length) that only shrinks if a chunk's measured wall blows the
        # target; results are bit-identical under any chunking.
        "chunk_size": 4,
        "max_chunk_seconds": 12.0,
    }
    t0 = time.perf_counter()
    out = sampler.sample_chains(
        n_warm, n_main, init, display_progress=False, **kwargs,
    )
    return time.perf_counter() - t0, out


def _measure_mode(mode, dim, n_chain, n_warm, n_main, n_repeat, seed):
    """Median wall for one dispatch mode (fresh per-mode programs)."""
    from mici_tpu import ops

    ctx = ops.force_dispatch(mode) if mode != "auto" else None
    walls, out = [], None
    if ctx is not None:
        ctx.__enter__()
    try:
        sampler, init = make_softabs_setup(
            dim, n_chain, seed, mode_tag=mode,
        )
        _timed_run(sampler, init, n_warm, n_main)  # warm compile
        for _ in range(max(1, n_repeat)):
            sampler, init = make_softabs_setup(
                dim, n_chain, seed, mode_tag=mode,
            )
            wall, out = _timed_run(sampler, init, n_warm, n_main)
            walls.append(wall)
    finally:
        if ctx is not None:
            ctx.__exit__(None, None, None)
    return float(np.median(walls)), walls, out


def run_softabs_eigh_row(probe_rate=None, dim=DIM, n_chain=N_CHAIN,
                         n_warm=8, n_main=48, n_repeat=1, seed=0,
                         ab_modes=("parallel", "blocked")):
    """Run the SoftAbs eigh row and return a JSON-ready artifact dict.

    Includes: median wall / chain-iters/s for the auto-dispatched
    program, the exact-moment statistical gate, which eigh path the auto
    policy takes at this (batch, N, dtype), and same-shape A/B walls for
    each mode in ``ab_modes`` with the auto-over-mode speedups, so the
    dispatch-window decision is backed by end-to-end measurement in the
    artifact itself.
    """
    import jax.numpy as jnp

    from benchmarks.oracles import check_moments
    from mici_tpu.diagnostics import effective_sample_size_per_dim
    from mici_tpu.ops import dispatch as _dispatch

    if _dispatch._use_parallel_eigh(n_chain, dim, jnp.float32):
        auto_path = "parallel"
    else:
        auto_path = "xla"
    row = {
        "config": f"softabs_eigh_dim{dim}",
        "regime": "eigh_bound",
        "dim": dim,
        "n_chain": n_chain,
        "n_warm": n_warm,
        "n_main": n_main,
        "n_step": N_STEP,
        "step_size": STEP_SIZE,
        "eigh_auto_path": auto_path,
    }

    # --- auto dispatch (the production path) ---------------------------
    elapsed, walls, out = _measure_mode(
        "auto", dim, n_chain, n_warm, n_main, n_repeat, seed,
    )
    traces = np.asarray(out.traces["pos"])
    ess = effective_sample_size_per_dim(traces)
    accept = float(np.nanmean(np.asarray(out.statistics["accept_stat"])))
    row.update({
        "wall_time_s": round(elapsed, 3),
        "wall_repeats": [round(w, 3) for w in walls],
        "chain_iters_per_sec": round(
            n_chain * (n_warm + n_main) / elapsed, 1),
        "mean_ess": round(float(ess.mean()), 1),
        "ess_per_sec": round(float(ess.mean()) / elapsed, 2),
        "mean_accept": round(accept, 3),
    })

    # --- exact-moment statistical gate on the same run ------------------
    var_1d = quartic_1d_var()
    cap = traces.shape[-1]
    # Tolerances ~5 MC standard errors at the realized ESS:
    # SE(mean) = sqrt(var/ess), SE_rel(var) ~ sqrt(2/ess).
    ess_floor = max(float(ess.min()), 16.0)
    mean_atol = 5.0 * np.sqrt(var_1d / ess_floor)
    var_rtol = 5.0 * np.sqrt(2.0 / ess_floor)
    row["moment_gate"] = check_moments(
        traces, np.zeros(cap), np.full(cap, var_1d),
        mean_atol=float(mean_atol), var_rtol=float(var_rtol),
    )

    if probe_rate:
        from benchmarks.roofline import PROBE_FLOPS_PER_STEP

        row["chip_probe_steps_per_sec"] = probe_rate
        row["probe_peak_tflops"] = round(
            probe_rate * PROBE_FLOPS_PER_STEP / 1e12, 3,
        )
    return row


def run_softabs_ab_arms(auto_iters_per_sec, dim=DIM, n_chain=N_CHAIN,
                        n_warm=2, n_main=16, seed=0,
                        ab_modes=("parallel", "blocked")):
    """Same-shape forced-dispatch A/B arms for the SoftAbs row.

    Separate from the auto row (and run after it) so a pathologically
    slow arm — forced-XLA eigh inside the implicit integrators' nested
    ``while_loop``s cost minutes of compile in round-1 measurements —
    can time out without losing the production row.  Arms run fewer
    iterations than the gated auto row (per-iteration work is
    identical under any chunking, so per-iteration *rates* compare
    across different iteration counts); each arm reports its wall and
    the auto/arm per-iteration speedup.
    """
    ab = {"ab_n_warm": n_warm, "ab_n_main": n_main}
    for mode in ab_modes:
        try:
            mode_elapsed, mode_walls, _ = _measure_mode(
                mode, dim, n_chain, n_warm, n_main, 1, seed,
            )
        except Exception as exc:  # pragma: no cover - robustness
            ab[f"{mode}_error"] = f"{type(exc).__name__}: {exc}"
            continue
        mode_rate = n_chain * (n_warm + n_main) / mode_elapsed
        ab[f"{mode}_wall_time_s"] = round(mode_elapsed, 3)
        ab[f"{mode}_wall_repeats"] = [round(w, 3) for w in mode_walls]
        ab[f"{mode}_chain_iters_per_sec"] = round(mode_rate, 1)
        if auto_iters_per_sec:
            ab[f"auto_over_{mode}_speedup"] = round(
                auto_iters_per_sec / mode_rate, 2)
    return ab


def main(argv=None):
    """CLI / subprocess entry.

    ``bench.py`` runs this row in a **subprocess** (``--subprocess``):
    round 5 measured long device executions faulting the shared TPU
    worker, which poisons every later JAX call in the launching
    process — isolating the row means a fault costs one error row
    instead of the whole artifact.  Subprocess protocol: the gated
    auto-dispatch row prints as ``SOFTABS_ROW <json>`` *immediately*
    after it is measured, then the A/B arms print as
    ``SOFTABS_AB <json>`` — so a timeout or fault during the (slower,
    optional) arms can never lose the production row.  Both lines are
    parsed and merged by ``bench.run_softabs_row_isolated``.
    """
    import argparse
    import json
    import os

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--probe-rate", type=float, default=None)
    parser.add_argument("--subprocess", action="store_true")
    parser.add_argument("--skip-ab", action="store_true")
    args = parser.parse_args(argv)
    cache_dir = os.environ.get("MICI_TPU_XLA_CACHE")
    if cache_dir:
        from mici_tpu.profiling import enable_persistent_compilation_cache

        enable_persistent_compilation_cache(cache_dir)
    row = run_softabs_eigh_row(probe_rate=args.probe_rate)
    if args.subprocess:
        print("SOFTABS_ROW " + json.dumps(row), flush=True)
    if not args.skip_ab:
        ab = run_softabs_ab_arms(row.get("chain_iters_per_sec"))
        row.update(ab)
        if args.subprocess:
            print("SOFTABS_AB " + json.dumps(ab), flush=True)
    if not args.subprocess:
        print(json.dumps(row, indent=1))


if __name__ == "__main__":
    main()
