"""The five BASELINE.json benchmark configurations as runnable setups.

Each ``config_*`` function returns ``(sampler, init_states, kwargs)`` such
that ``sampler.sample_chains(n_warm_up, n_main, init_states, **kwargs)``
runs the configuration.  See BASELINE.md for the source definitions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mici_tpu import adapters, integrators, samplers, systems


def _float_dtype():
    return jnp.zeros(()).dtype


def correlated_gaussian(dim=100, seed=0):
    """100-D correlated Gaussian target (configs 1 and 5)."""
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((dim, dim)) / np.sqrt(dim)
    cov = a @ a.T + np.eye(dim)
    prec = jnp.asarray(np.linalg.inv(cov), _float_dtype())

    def neg_log_dens(q):
        return 0.5 * q @ (prec @ q)

    return neg_log_dens, cov


def config_1_static_hmc(n_chain=4, dim=100, seed=0):
    """Static HMC + leapfrog, 100-D correlated Gaussian, fixed step size.

    BASELINE.json config 1.
    """
    neg_log_dens, _ = correlated_gaussian(dim, seed)
    system = systems.EuclideanMetricSystem(neg_log_dens)
    integrator = integrators.LeapfrogIntegrator(system, step_size=0.2)
    sampler = samplers.StaticMetropolisHMC(
        system, integrator, seed, n_step=10,
    )
    rng = np.random.default_rng(seed + 1)
    init_states = list(rng.standard_normal((n_chain, dim)))
    return sampler, init_states, {"adapters": None}


def hierarchical_logistic_regression(n_data=256, n_feature=8, seed=0):
    """Hierarchical logistic regression posterior (config 2).

    Model: per-feature coefficient scales with log-normal hyper-prior:
        log_tau ~ N(0, 1); beta_j ~ N(0, exp(log_tau)); y ~ Bernoulli(
        sigmoid(X beta)).
    Unconstrained parameter vector q = (log_tau, beta).
    """
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n_data, n_feature))
    true_beta = rng.standard_normal(n_feature)
    logits = x @ true_beta
    y = (rng.uniform(size=n_data) < 1 / (1 + np.exp(-logits))).astype(
        np.float64)
    xj = jnp.asarray(x, _float_dtype())
    yj = jnp.asarray(y, _float_dtype())

    def neg_log_dens(q):
        log_tau, beta = q[0], q[1:]
        logits = xj @ beta
        loglik = jnp.sum(
            yj * logits - jnp.logaddexp(0.0, logits),
        )
        log_prior = (
            -0.5 * log_tau**2
            - 0.5 * jnp.sum(beta**2) * jnp.exp(-2 * log_tau)
            - n_feature * log_tau
        )
        return -(loglik + log_prior)

    return neg_log_dens, n_feature + 1


def config_2_nuts_adaptive(n_chain=4, seed=0, max_tree_depth=3,
                           **transition_kwargs):
    """NUTS + dual averaging + windowed diagonal metric adaptation on a
    hierarchical logistic regression posterior.  BASELINE.json config 2.
    """
    neg_log_dens, dim = hierarchical_logistic_regression(seed=seed)
    system = systems.EuclideanMetricSystem(neg_log_dens)
    integrator = integrators.LeapfrogIntegrator(system)
    # Depth cap chosen by a measured lockstep sweep (see config 5 /
    # docs/BENCHMARKS.md round-2b): the adapted kernel U-turns at ~6.8
    # leapfrog steps and per-iteration ESS is identical for caps 3-8,
    # while lockstep wall time scales with the cap.  The reference
    # comparison mirrors the same cap.
    sampler = samplers.DynamicMultinomialHMC(
        system, integrator, seed, max_tree_depth=max_tree_depth,
        **transition_kwargs,
    )
    rng = np.random.default_rng(seed + 1)
    init_states = list(rng.standard_normal((n_chain, dim)) * 0.5)
    kwargs = {
        "adapters": [
            adapters.DualAveragingStepSizeAdapter(),
            adapters.OnlineVarianceMetricAdapter(),
        ],
    }
    return sampler, init_states, kwargs


def banana_neg_log_dens(q):
    """2D banana-shaped posterior (config 3)."""
    return 0.5 * q[0] ** 2 / 8.0 + 0.5 * (q[1] - q[0] ** 2 / 4.0) ** 2


def banana_exact_sample(n_chain, seed=1):
    """Exact draws from the banana target (q0 ~ N(0, sqrt(8));
    q1 | q0 ~ N(q0^2/4, 1)).

    Benchmark init: starting every chain at stationarity removes the
    burn-in confound from ESS measurement (the same exact init is used
    for the reference-side runs, benchmarks/reference.py config 3) and
    turns the moment validation into a pure kernel-preservation check.
    """
    rng = np.random.default_rng(seed)
    q0 = rng.standard_normal(n_chain) * np.sqrt(8.0)
    q1 = q0**2 / 4.0 + rng.standard_normal(n_chain)
    return np.stack([q0, q1], axis=1)


def config_3_riemannian(n_chain=1024, seed=0, fp_tol=1e-5,
                        reverse_check_tol=1e-3, max_tree_depth=4,
                        exact_init=True, **transition_kwargs):
    """SoftAbs-metric RMHMC: implicit leapfrog + fixed-point solves on a
    banana-shaped posterior.  BASELINE.json config 3.
    """
    system = systems.SoftAbsRiemannianMetricSystem(
        banana_neg_log_dens, softabs_coeff=1.0,
    )
    integrator = integrators.ImplicitLeapfrogIntegrator(
        system, step_size=0.2, reverse_check_tol=reverse_check_tol,
        fixed_point_solver_kwargs={
            "convergence_tol": fp_tol, "max_iters": 30,
        },
    )
    # Depth cap from a measured lockstep sweep (docs/BENCHMARKS.md
    # round-2b): depth 4 is the ESS/s optimum for this target (depth 3
    # truncates the banana's long trajectories, depth 5 wastes lockstep
    # time); the reference comparison mirrors the same cap.
    sampler = samplers.DynamicMultinomialHMC(
        system, integrator, seed, max_tree_depth=max_tree_depth,
        **transition_kwargs,
    )
    if exact_init:
        init_states = list(banana_exact_sample(n_chain, seed + 1))
    else:
        rng = np.random.default_rng(seed + 1)
        init_states = list(rng.standard_normal((n_chain, 2)) * 0.5)
    return sampler, init_states, {"adapters": None}


def config_4_constrained_torus(n_chain=128, seed=0, max_tree_depth=5,
                               **transition_kwargs):
    """Constrained HMC on a torus manifold with Newton projection.

    BASELINE.json config 4 (the reference README worked example,
    /root/reference/README.md:292-406): torus with major radius R=1, minor
    radius r=0.5 embedded in R^3, density with respect to the Hausdorff
    measure from a Gaussian-like potential.
    """
    r_major, r_minor = 1.0, 0.5

    def constr(q):
        x, y, z = q[0], q[1], q[2]
        return jnp.array([
            ((x**2 + y**2) ** 0.5 - r_major) ** 2 + z**2 - r_minor**2,
        ])

    def neg_log_dens(q):
        x, y, z = q[0], q[1], q[2]
        return 0.5 * ((x - 1.0) ** 2 + y**2 + 2.0 * z**2)

    system = systems.DenseConstrainedEuclideanMetricSystem(
        neg_log_dens, constr, dens_wrt_hausdorff=True,
    )
    # tolerances default to dtype-aware values (f64: reference defaults;
    # f32: rescaled just above the f32 residual floor)
    integrator = integrators.ConstrainedLeapfrogIntegrator(
        system, step_size=0.15, n_inner_step=2,
    )
    sampler = samplers.DynamicMultinomialHMC(
        system, integrator, seed, max_tree_depth=max_tree_depth,
        **transition_kwargs,
    )
    rng = np.random.default_rng(seed + 1)
    thetas = rng.uniform(0, 2 * np.pi, (n_chain, 2))
    init = np.stack([
        (r_major + r_minor * np.cos(thetas[:, 0])) * np.cos(thetas[:, 1]),
        (r_major + r_minor * np.cos(thetas[:, 0])) * np.sin(thetas[:, 1]),
        r_minor * np.sin(thetas[:, 0]),
    ], axis=1)
    init_states = list(init)
    return sampler, init_states, {"adapters": None}


def config_6_dense_riemannian(n_chain=1024, dim=16, seed=0):
    """Dense-metric Riemannian NUTS: per-chain dense metric factorized at
    every flow evaluation — the showcase for the dispatched Pallas
    batched-Cholesky/tri-solve kernels (docs/BENCHMARKS.md round 2 table).

    Not a BASELINE.json config; complements config 3 (whose SoftAbs metric
    is eigendecomposition-based) with the Cholesky-based dense hot path.
    """
    scale = jnp.asarray(np.linspace(0.5, 2.0, dim), _float_dtype())

    def neg_log_dens(q):
        return 0.5 * jnp.sum((q / scale) ** 2) + 0.25 * jnp.sum(q**4) / dim

    def metric_func(q):
        return (1.0 + jnp.sum(q**2) / dim) * jnp.eye(dim, dtype=q.dtype) \
            + (0.1 / dim) * jnp.outer(q, q)

    system = systems.DenseRiemannianMetricSystem(neg_log_dens, metric_func)
    integrator = integrators.ImplicitLeapfrogIntegrator(
        system, step_size=0.1,
        fixed_point_solver_kwargs={
            "convergence_tol": 1e-5, "max_iters": 20,
        },
    )
    sampler = samplers.DynamicMultinomialHMC(
        system, integrator, seed, max_tree_depth=4,
    )
    rng = np.random.default_rng(seed + 1)
    init_states = list(rng.standard_normal((n_chain, dim)) * 0.3)
    return sampler, init_states, {"adapters": None}


def config_5_massively_parallel(n_chain=4096, dim=100, seed=0, mesh=None,
                                max_tree_depth=4, **transition_kwargs):
    """4096 NUTS chains, vmapped (and optionally sharded over a mesh) with
    host-streamed traces.  BASELINE.json config 5.
    """
    neg_log_dens, _ = correlated_gaussian(dim, seed)
    system = systems.EuclideanMetricSystem(neg_log_dens)
    integrator = integrators.LeapfrogIntegrator(system)
    # Vmapped NUTS executes the max tree depth over the whole batch each
    # iteration, so the depth cap is a first-order throughput knob.  A
    # measured sweep on this target (docs/BENCHMARKS.md round-2b) found
    # identical per-iteration ESS for caps 4-7 (the adapted kernel
    # U-turns at ~14 leapfrog steps) while the depth-7 lockstep cost
    # 2.25x more wall time; the reference comparison runs the same cap.
    sampler = samplers.DynamicMultinomialHMC(
        system, integrator, seed, max_tree_depth=max_tree_depth,
        **transition_kwargs,
    )
    rng = np.random.default_rng(seed + 1)
    init_states = list(rng.standard_normal((n_chain, dim)))
    kwargs = {
        "adapters": [adapters.DualAveragingStepSizeAdapter()],
        "chunk_size": 64,
    }
    if mesh is not None:
        kwargs["mesh"] = mesh
    return sampler, init_states, kwargs
