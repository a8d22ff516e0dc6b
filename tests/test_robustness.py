"""Robustness tests: pathological targets must degrade to rejections.

The reference turns numerical failures into rejections via exceptions
(mici/transitions.py:33-43); here the same guarantee is that error flags
and NaN-guards keep chain states finite no matter how badly the model
behaves in some region.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mici_tpu import integrators, samplers, systems, transitions
from mici_tpu.states import ChainState

SEED = 1122
DIM = 2


def _run(system, transition, n_iter=50, n_chain=4, scale=0.5):
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
                return state, (state.pos, stats)

            ks = jax.random.split(key, n)
            _, out = jax.lax.scan(body, state, ks)
            return out

        return jax.vmap(chain)(pos0, keys)

    rng = np.random.default_rng(SEED)
    pos0 = jnp.asarray(rng.standard_normal((n_chain, DIM)) * scale)
    keys = jax.random.split(jax.random.PRNGKey(SEED), n_chain)
    return run(keys, pos0, n_iter)


def test_nan_region_target():
    """Density NaN outside a ball: proposals entering it are rejected and
    chain positions stay finite."""

    def nld(q):
        r2 = jnp.sum(q**2)
        return jnp.where(r2 < 9.0, 0.5 * r2, jnp.nan)

    system = systems.EuclideanMetricSystem(nld)
    integ = integrators.LeapfrogIntegrator(system, 0.8)
    trans = transitions.MultinomialDynamicIntegrationTransition(
        system, integ, max_tree_depth=5)
    pos, stats = _run(system, trans)
    assert np.all(np.isfinite(np.asarray(pos)))
    # positions stay inside the finite-density region
    assert np.all(np.sum(np.asarray(pos) ** 2, axis=-1) < 9.0)


def test_inf_gradient_target():
    """Log-density with infinite gradient at a point (|q| cusp)."""

    def nld(q):
        return jnp.sum(jnp.abs(q) ** 0.5) + 0.05 * jnp.sum(q**2)

    system = systems.EuclideanMetricSystem(nld)
    integ = integrators.LeapfrogIntegrator(system, 0.3)
    trans = transitions.MultinomialDynamicIntegrationTransition(
        system, integ, max_tree_depth=5)
    pos, stats = _run(system, trans, n_iter=100)
    assert np.all(np.isfinite(np.asarray(pos)))


def test_heavy_tail_target():
    """Cauchy-like heavy tails: no overflow, finite positions."""

    def nld(q):
        return jnp.sum(jnp.log1p(q**2))

    system = systems.EuclideanMetricSystem(nld)
    integ = integrators.LeapfrogIntegrator(system, 0.9)
    trans = transitions.MultinomialDynamicIntegrationTransition(
        system, integ, max_tree_depth=6)
    pos, stats = _run(system, trans, n_iter=200)
    assert np.all(np.isfinite(np.asarray(pos)))


def test_metropolis_nan_region():
    def nld(q):
        r2 = jnp.sum(q**2)
        return jnp.where(r2 < 9.0, 0.5 * r2, jnp.nan)

    system = systems.EuclideanMetricSystem(nld)
    integ = integrators.LeapfrogIntegrator(system, 1.0)
    trans = transitions.MetropolisStaticIntegrationTransition(
        system, integ, 10)
    pos, stats = _run(system, trans)
    assert np.all(np.isfinite(np.asarray(pos)))
    acc = np.asarray(stats["accept_stat"])
    assert np.all((acc >= 0) & (acc <= 1))


def test_riemannian_singular_metric_region():
    """SoftAbs metric with near-singular Hessian regions stays finite
    (failures flagged as convergence errors, not NaN states)."""

    def nld(q):
        return 0.25 * jnp.sum(q**4)  # Hessian -> 0 at origin

    system = systems.SoftAbsRiemannianMetricSystem(nld, softabs_coeff=5.0)
    integ = integrators.ImplicitLeapfrogIntegrator(
        system, step_size=0.5,
        fixed_point_solver_kwargs={"max_iters": 15})
    trans = transitions.MultinomialDynamicIntegrationTransition(
        system, integ, max_tree_depth=4)
    pos, stats = _run(system, trans, n_iter=40)
    assert np.all(np.isfinite(np.asarray(pos)))


def test_divergent_chain_does_not_poison_batch():
    """One chain started in a NaN region flags while others sample fine."""

    def nld(q):
        r2 = jnp.sum(q**2)
        return jnp.where(r2 < 25.0, 0.5 * r2, jnp.nan)

    system = systems.EuclideanMetricSystem(nld)
    integ = integrators.LeapfrogIntegrator(system, 0.5)
    trans = transitions.MultinomialDynamicIntegrationTransition(
        system, integ, max_tree_depth=4)

    def chain(q, key):
        state = system.prepare_state(
            ChainState(pos=q, mom=jnp.ones_like(q), dir=1))
        state, stats = trans.sample(state, key)
        return state.pos, stats["accept_stat"]

    q0 = jnp.asarray([[0.5, 0.5], [100.0, 100.0]])  # second starts in NaN
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    pos, acc = jax.jit(jax.vmap(chain))(q0, keys)
    # good chain moved and stayed finite
    assert np.all(np.isfinite(np.asarray(pos[0])))
    assert float(acc[0]) > 0
    # bad chain did not corrupt the good one's state shape/values
    assert np.asarray(pos).shape == (2, 2)
