"""Shared harness for the headline (BASELINE config 3) tight-loop kernel.

One definition of the SoftAbs RMHMC banana kernel and its chunked
steady-state timing loop, consumed by both ``bench.py`` (the driver
artifact's headline measurement) and ``benchmarks/solver_ab.py`` (the
fixed-point-solver A/B probe).  Keeping a single construction site
guarantees the probe measures exactly the kernel the headline reports —
any tweak to tolerances, chunking or the sync barrier lands in both.

The defaults here ARE the headline constants; ``bench.py`` re-exports
them for its docstring/reporting.
"""

from __future__ import annotations

import functools
import time

import numpy as np

#: Headline constants (BASELINE config 3 at the 1024-chain batch size).
N_CHAIN = 1024
CHUNK = 16           # one compiled program is reused for warm-up and main
N_WARM = 32
N_MAIN = 192
STEP_SIZE = 0.2
MAX_TREE_DEPTH = 4  # measured ESS/s optimum under vmapped lockstep
SOFTABS_COEFF = 1.0
FP_TOL = 1e-5
FP_MAX_ITERS = 30
REV_TOL = 1e-3


def run_headline_kernel(n_chain=N_CHAIN, n_warm=N_WARM, n_main=N_MAIN,
                        chunk=CHUNK, step_size=STEP_SIZE,
                        max_tree_depth=MAX_TREE_DEPTH,
                        softabs_coeff=SOFTABS_COEFF, fp_tol=FP_TOL,
                        fp_max_iters=FP_MAX_ITERS, rev_tol=REV_TOL,
                        fixed_point_solver=None,
                        extra_stats=()):
    """Steady-state run of the config-3 kernel; returns (metrics, traces).

    Builds the SoftAbs RMHMC banana transition (default settings
    throughout — ``loop_mode="fused"``; the headline measures what users
    get), runs ``n_warm`` iterations to warm the single chunk-sized
    compiled program, then times ``n_main`` iterations reusing it.
    Chains start from exact stationary draws
    (``benchmarks.configs.banana_exact_sample``) so ESS measures
    stationary mixing.

    Args:
        fixed_point_solver: Optional solver override for the implicit
            integrator (the solver A/B probe's knob); ``None`` keeps the
            shipped default (direct iteration).
        extra_stats: Iterable of transition-statistic names to trace per
            iteration in addition to positions; returned stacked as
            ``metrics["stats"][name]`` with shape ``(n_chain, n_main)``.

    Returns:
        Tuple of a metrics dict (wall time, chain-iterations/sec, total
        ESS, ESS/sec, per-chain-iteration ESS, leapfrog steps/sec, any
        ``extra_stats`` arrays) and the position traces with shape
        ``(n_chain, n_main, 2)``.
    """
    import jax
    import jax.numpy as jnp

    from benchmarks.configs import banana_exact_sample, banana_neg_log_dens
    from mici_tpu import integrators, systems, transitions
    from mici_tpu.diagnostics import effective_sample_size
    from mici_tpu.precision import matmul_precision_scope
    from mici_tpu.states import ChainState

    extra_stats = tuple(extra_stats)
    # The chunked loops execute whole chunks; round the warm/main
    # iteration counts to the executed multiples so every reported
    # metric divides by what actually ran (and tiny n_main still runs).
    chunk = max(1, min(chunk, n_main))
    n_warm -= n_warm % chunk
    n_main -= n_main % chunk
    system = systems.SoftAbsRiemannianMetricSystem(
        banana_neg_log_dens, softabs_coeff=softabs_coeff)
    integrator_kwargs = {
        "step_size": step_size,
        "reverse_check_tol": rev_tol,
        "fixed_point_solver_kwargs": {
            "convergence_tol": fp_tol, "max_iters": fp_max_iters,
        },
    }
    if fixed_point_solver is not None:
        integrator_kwargs["fixed_point_solver"] = fixed_point_solver
    integrator = integrators.ImplicitLeapfrogIntegrator(
        system, **integrator_kwargs)
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
                traced = (state.pos, stats["n_step"],
                          *(stats[name] for name in extra_stats))
                return state, traced

            ks = jax.random.split(key, n_iter)
            return jax.lax.scan(body, state, ks)

        # Engine matmul-precision policy (TPU bf16-matmul default breaks
        # the implicit solves — see mici_tpu/precision.py).
        with matmul_precision_scope():
            return jax.vmap(chain)(states, keys)

    dtype = jnp.zeros(()).dtype
    # Exact stationary init: ESS measures stationary mixing (the reference
    # denominator run starts from the same exact draws) and the banana
    # moment validation becomes a pure kernel-preservation check.
    pos0 = jnp.asarray(banana_exact_sample(n_chain, seed=1), dtype)
    states = jax.vmap(
        lambda q: system.prepare_state(
            ChainState(pos=q, mom=jnp.zeros_like(q), dir=1)),
    )(pos0)

    def host_sync(x):
        # On remote-tunneled backends ``block_until_ready`` can return
        # before execution completes; a (tiny) host fetch is a reliable
        # barrier.
        return np.asarray(x[:1, :1])

    # Warm-up chunks (compile the single chunk-sized program once).
    keys = jax.random.split(jax.random.PRNGKey(0), n_chain)
    for i in range(n_warm // chunk):
        states, _ = run(states, keys, chunk)
        keys = jax.random.split(jax.random.PRNGKey(1000 + i), n_chain)
    host_sync(states.pos)

    # Timed main run: reuse the compiled chunk program.
    chunks = []
    t0 = time.perf_counter()
    for i in range(n_main // chunk):
        keys = jax.random.split(jax.random.PRNGKey(2000 + i), n_chain)
        states, traced = run(states, keys, chunk)
        chunks.append(traced)
    host_sync(states.pos)
    elapsed = time.perf_counter() - t0

    stacked = [
        np.concatenate([np.asarray(c[j]) for c in chunks], axis=1)
        for j in range(2 + len(extra_stats))
    ]
    pos_trace, n_steps = stacked[0], stacked[1]
    ess = np.array([
        effective_sample_size(pos_trace[:, :, d]) for d in range(2)
    ])
    mean_ess = float(ess.mean())
    metrics = {
        "n_warm": n_warm,
        "n_main": n_main,
        "elapsed": elapsed,
        "ess_total_mean_dim": mean_ess,
        "ess_per_sec": mean_ess / elapsed,
        "ess_per_chain_iter": mean_ess / (n_chain * n_main),
        "chain_iters_per_sec": n_chain * n_main / elapsed,
        "leapfrog_steps_per_sec": float(n_steps.sum()) / elapsed,
        "stats": dict(zip(extra_stats, stacked[2:])),
    }
    return metrics, pos_trace
