"""End-to-end statistical correctness tests against quadrature oracles.

Long-ish vectorized chains on low-dimensional targets whose moments are
computed by dense numerical integration — validates that each sampler
family targets the correct distribution (beyond the per-step invariant and
parity tests).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mici_tpu import integrators, systems, transitions
from mici_tpu.states import ChainState

SEED = 777


def _banana_nld_np(q0, q1):
    return 0.5 * q0**2 / 8.0 + 0.5 * (q1 - q0**2 / 4.0) ** 2


def _banana_moments():
    """Moments of the banana density by dense 2D quadrature."""
    q0 = np.linspace(-12, 12, 481)
    q1 = np.linspace(-6, 40, 481)
    g0, g1 = np.meshgrid(q0, q1, indexing="ij")
    dens = np.exp(-_banana_nld_np(g0, g1))
    z = dens.sum()
    m0 = (g0 * dens).sum() / z
    m1 = (g1 * dens).sum() / z
    v0 = ((g0 - m0) ** 2 * dens).sum() / z
    v1 = ((g1 - m1) ** 2 * dens).sum() / z
    return np.array([m0, m1]), np.array([v0, v1])


def _run_chains(system, transition, n_chain, n_iter, init_scale=0.5,
                dim=2):
    @functools.partial(jax.jit, static_argnums=(2,))
    def run(keys, pos0, n):
        def chain(q, key):
            state = system.prepare_state(
                ChainState(pos=q, mom=jnp.zeros_like(q), dir=1))

            def body(state, k):
                k1, k2 = jax.random.split(k)
                state = state.replace(
                    mom=system.sample_momentum(state, k1))
                state, stats = transition.sample(state, k2)
                return state, state.pos

            ks = jax.random.split(key, n)
            _, pos = jax.lax.scan(body, state, ks)
            return pos

        return jax.vmap(chain)(pos0, keys)

    rng = np.random.default_rng(SEED)
    pos0 = jnp.asarray(rng.standard_normal((n_chain, dim)) * init_scale)
    keys = jax.random.split(jax.random.PRNGKey(SEED), n_chain)
    return np.asarray(run(keys, pos0, n_iter))


@pytest.mark.parametrize("make_system_integrator", [
    # Euclidean NUTS baseline
    lambda: (
        systems.EuclideanMetricSystem(
            lambda q: 0.5 * q[0] ** 2 / 8.0
            + 0.5 * (q[1] - q[0] ** 2 / 4.0) ** 2),
        lambda s: integrators.LeapfrogIntegrator(s, 0.5),
    ),
    # SoftAbs Riemannian implicit leapfrog — exercises the full implicit
    # machinery end to end
    lambda: (
        systems.SoftAbsRiemannianMetricSystem(
            lambda q: 0.5 * q[0] ** 2 / 8.0
            + 0.5 * (q[1] - q[0] ** 2 / 4.0) ** 2, softabs_coeff=1.0),
        lambda s: integrators.ImplicitLeapfrogIntegrator(
            s, step_size=0.25,
            fixed_point_solver_kwargs={"convergence_tol": 1e-10}),
    ),
])
def test_banana_moments(make_system_integrator):
    system, make_integ = make_system_integrator()
    integ = make_integ(system)
    transition = transitions.MultinomialDynamicIntegrationTransition(
        system, integ, max_tree_depth=6)
    pos = _run_chains(system, transition, n_chain=24, n_iter=600)
    pos = pos[:, 200:].reshape(-1, 2)
    mean_oracle, var_oracle = _banana_moments()
    mean_est = pos.mean(0)
    var_est = pos.var(0)
    np.testing.assert_allclose(mean_est, mean_oracle, atol=0.45)
    np.testing.assert_allclose(
        var_est / var_oracle, 1.0, atol=0.3)


def test_constrained_circle_uniformity():
    """Constrained HMC on the circle with uniform density: the angle
    distribution must be uniform (Kolmogorov-Smirnov style check)."""

    def constr(q):
        return jnp.array([jnp.sum(q**2) - 1.0])

    system = systems.DenseConstrainedEuclideanMetricSystem(
        lambda q: jnp.zeros(()), constr, dens_wrt_hausdorff=True)
    integ = integrators.ConstrainedLeapfrogIntegrator(
        system, step_size=0.3,
        projection_solver_kwargs={"constraint_tol": 1e-11,
                                  "position_tol": 1e-10})
    transition = transitions.MultinomialDynamicIntegrationTransition(
        system, integ, max_tree_depth=4)

    @functools.partial(jax.jit, static_argnums=(2,))
    def run(keys, pos0, n):
        def chain(q, key):
            state = system.prepare_state(
                ChainState(pos=q, mom=jnp.zeros_like(q), dir=1))

            def body(state, k):
                k1, k2 = jax.random.split(k)
                state = state.replace(
                    mom=system.sample_momentum(state, k1))
                state, _ = transition.sample(state, k2)
                return state, state.pos

            ks = jax.random.split(key, n)
            _, pos = jax.lax.scan(body, state, ks)
            return pos

        return jax.vmap(chain)(pos0, keys)

    n_chain, n_iter = 16, 400
    rng = np.random.default_rng(SEED)
    theta0 = rng.uniform(0, 2 * np.pi, n_chain)
    pos0 = jnp.asarray(np.stack([np.cos(theta0), np.sin(theta0)], axis=1))
    keys = jax.random.split(jax.random.PRNGKey(1), n_chain)
    pos = np.asarray(run(keys, pos0, n_iter)).reshape(-1, 2)
    angles = np.mod(np.arctan2(pos[:, 1], pos[:, 0]), 2 * np.pi)
    # KS statistic vs uniform
    sorted_angles = np.sort(angles) / (2 * np.pi)
    n = len(sorted_angles)
    ks = np.max(np.abs(sorted_angles - np.arange(1, n + 1) / n))
    # with ~6400 correlated samples allow a loose bound
    assert ks < 0.05
    # all points on circle
    np.testing.assert_allclose(
        np.linalg.norm(pos, axis=1), 1.0, atol=1e-7)
