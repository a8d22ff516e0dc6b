"""Tests for Markov transition kernels.

Mirrors reference test strategy (mici tests/test_transitions.py): statistics
schema conformance, invariance of target moments under repeated transitions,
and failure-flag propagation.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mici_tpu import integrators, systems, transitions
from mici_tpu.states import ChainState

SEED = 3046987
DIM = 4


@pytest.fixture(scope="module")
def gaussian_setup():
    rng = np.random.default_rng(SEED)
    a = rng.standard_normal((DIM, DIM))
    cov = a @ a.T + DIM * np.eye(DIM)
    prec = np.linalg.inv(cov)

    def nld(q):
        return 0.5 * q @ (jnp.asarray(prec) @ q)

    system = systems.EuclideanMetricSystem(nld)
    integrator = integrators.LeapfrogIntegrator(system, 0.5)
    return system, integrator, cov


def _run_chain(system, mom_trans, int_trans, n_iter, key, q0):
    @functools.partial(jax.jit, static_argnums=(1,))
    def run(key, n):
        state = system.prepare_state(
            ChainState(pos=q0, mom=jnp.zeros_like(q0), dir=1))

        def body(state, k):
            k1, k2 = jax.random.split(k)
            state, _ = mom_trans.sample(state, k1)
            state, stats = int_trans.sample(state, k2)
            return state, (state.pos, stats)

        keys = jax.random.split(key, n)
        _, (qs, stats) = jax.lax.scan(body, state, keys)
        return qs, stats

    return run(key, n_iter)


TRANSITION_MAKERS = {
    "static_metropolis": lambda sys_, integ: (
        transitions.MetropolisStaticIntegrationTransition(sys_, integ, 8)),
    "random_metropolis": lambda sys_, integ: (
        transitions.MetropolisRandomIntegrationTransition(
            sys_, integ, (2, 10))),
    "multinomial_nuts": lambda sys_, integ: (
        transitions.MultinomialDynamicIntegrationTransition(
            sys_, integ, max_tree_depth=6)),
    "slice_nuts": lambda sys_, integ: (
        transitions.SliceDynamicIntegrationTransition(
            sys_, integ, max_tree_depth=6)),
    "multinomial_nuts_euclid_crit": lambda sys_, integ: (
        transitions.MultinomialDynamicIntegrationTransition(
            sys_, integ, max_tree_depth=6,
            termination_criterion=transitions.euclidean_no_u_turn_criterion)),
    "multinomial_nuts_no_extra": lambda sys_, integ: (
        transitions.MultinomialDynamicIntegrationTransition(
            sys_, integ, max_tree_depth=6, do_extra_subtree_checks=False)),
}


@pytest.mark.parametrize("name", list(TRANSITION_MAKERS))
def test_gaussian_moments(gaussian_setup, name):
    """Chain targets the correct distribution (moment check)."""
    system, integrator, cov = gaussian_setup
    int_trans = TRANSITION_MAKERS[name](system, integrator)
    mom_trans = transitions.IndependentMomentumTransition(system)
    qs, stats = _run_chain(
        system, mom_trans, int_trans, 4000,
        jax.random.PRNGKey(SEED), jnp.zeros(DIM))
    qs = np.asarray(qs)[1000:]
    assert not np.any(np.asarray(stats["diverging"])) if "diverging" in \
        stats else True
    assert np.all(np.isfinite(qs))
    # sample covariance should approximate target covariance
    est_cov = np.cov(qs.T)
    assert np.abs(est_cov - cov).max() / np.abs(cov).max() < 0.25
    assert np.abs(qs.mean(0)).max() < 1.0
    # accept stats should be well behaved
    acc = np.asarray(stats["accept_stat"])
    assert np.all((acc >= 0) & (acc <= 1))
    assert acc.mean() > 0.5


@pytest.mark.parametrize("name", list(TRANSITION_MAKERS))
def test_statistic_types_schema(gaussian_setup, name):
    """sample returns exactly the statistics declared in statistic_types."""
    system, integrator, cov = gaussian_setup
    int_trans = TRANSITION_MAKERS[name](system, integrator)
    state = system.prepare_state(
        ChainState(pos=jnp.zeros(DIM), mom=jnp.ones(DIM), dir=1))
    _, stats = int_trans.sample(state, jax.random.PRNGKey(0))
    assert set(stats) == set(int_trans.statistic_types)


def test_correlated_momentum_transition(gaussian_setup):
    """Crank-Nicolson update preserves momentum marginal distribution."""
    system, integrator, cov = gaussian_setup
    trans = transitions.CorrelatedMomentumTransition(system, 0.3)
    state = system.prepare_state(
        ChainState(pos=jnp.zeros(DIM), mom=None, dir=1))

    @jax.jit
    def run(key):
        def body(st, k):
            st, _ = trans.sample(st, k)
            return st, st.mom

        keys = jax.random.split(key, 5000)
        st0 = state.replace(
            mom=system.sample_momentum(state, jax.random.PRNGKey(1)))
        _, moms = jax.lax.scan(body, st0, keys)
        return moms

    moms = np.asarray(run(jax.random.PRNGKey(2)))
    # marginal of momenta should be N(0, metric) = N(0, I)
    assert np.abs(np.cov(moms.T) - np.eye(DIM)).max() < 0.2
    # successive momenta should be correlated (rho = sqrt(1-c^2) ~ 0.954)
    corr = np.corrcoef(moms[:-1, 0], moms[1:, 0])[0, 1]
    assert 0.8 < corr < 0.99


def test_correlated_momentum_validation(gaussian_setup):
    system, integrator, _ = gaussian_setup
    with pytest.raises(ValueError):
        transitions.CorrelatedMomentumTransition(system, 1.5)


def test_divergence_flag(gaussian_setup):
    """A huge step size triggers the divergence statistic, accept_stat 0."""
    system, _, _ = gaussian_setup
    integrator = integrators.LeapfrogIntegrator(system, 1e4)
    trans = transitions.MultinomialDynamicIntegrationTransition(
        system, integrator, max_tree_depth=4, max_delta_h=100.0)
    state = system.prepare_state(
        ChainState(pos=jnp.ones(DIM), mom=jnp.ones(DIM), dir=1))
    new_state, stats = trans.sample(state, jax.random.PRNGKey(0))
    assert bool(stats["diverging"])
    assert float(stats["accept_stat"]) == 0.0
    # state should not have moved to a non-finite position
    assert np.all(np.isfinite(np.asarray(new_state.pos)))


def test_static_metropolis_involution(gaussian_setup):
    """Direction indicator handling matches the reference semantics.

    On acceptance dir equals its initial value; on rejection it is negated
    (mici/transitions.py:256-315).
    """
    system, integrator, _ = gaussian_setup
    trans = transitions.MetropolisStaticIntegrationTransition(
        system, integrator, 4)
    state = system.prepare_state(
        ChainState(pos=jnp.zeros(DIM), mom=jnp.full(DIM, 0.1), dir=1))
    accepted_dirs = set()
    for i in range(10):
        new_state, stats = trans.sample(state, jax.random.PRNGKey(i))
        accepted_dirs.add(int(new_state.dir))
    assert accepted_dirs <= {-1, 1}


def test_vmap_nuts(gaussian_setup):
    """NUTS transition vmaps across chains with per-chain tree depths."""
    system, integrator, cov = gaussian_setup
    trans = transitions.MultinomialDynamicIntegrationTransition(
        system, integrator, max_tree_depth=5)
    n_chain = 8
    rng = np.random.default_rng(SEED)
    q0 = rng.standard_normal((n_chain, DIM))
    keys = jax.random.split(jax.random.PRNGKey(3), n_chain)

    def single(q, key):
        k1, k2 = jax.random.split(key)
        state = system.prepare_state(
            ChainState(pos=q, mom=None, dir=1))
        state = state.replace(mom=system.sample_momentum(state, k1))
        new_state, stats = trans.sample(state, k2)
        return new_state.pos, stats["tree_depth"], stats["accept_stat"]

    pos, depths, accs = jax.jit(jax.vmap(single))(jnp.asarray(q0), keys)
    assert pos.shape == (n_chain, DIM)
    assert np.all(np.isfinite(np.asarray(pos)))
    # compare against unvmapped reference execution
    for i in range(n_chain):
        pos_i, depth_i, acc_i = jax.jit(single)(jnp.asarray(q0[i]), keys[i])
        np.testing.assert_allclose(pos[i], pos_i, atol=1e-10)
        assert int(depths[i]) == int(depth_i)


def test_nuts_trajectory_termination_sanity(gaussian_setup):
    """Tree depth should neither always hit max nor always be zero."""
    system, integrator, _ = gaussian_setup
    trans = transitions.MultinomialDynamicIntegrationTransition(
        system, integrator, max_tree_depth=8)
    mom_trans = transitions.IndependentMomentumTransition(system)
    _, stats = _run_chain(
        system, mom_trans, trans, 200, jax.random.PRNGKey(7),
        jnp.zeros(DIM))
    depths = np.asarray(stats["tree_depth"])
    assert depths.max() < 8
    assert depths.mean() > 1
