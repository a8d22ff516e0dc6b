"""Small API behavior checks mirroring reference error/validation semantics."""

import jax.numpy as jnp
import numpy as np
import pytest

from mici_tpu import errors, integrators, samplers, systems, transitions
from mici_tpu.states import ChainState


def _system():
    return systems.EuclideanMetricSystem(lambda q: 0.5 * jnp.sum(q**2))


def test_step_size_none_raises():
    """Stepping with unset step size raises AdaptationError.

    Reference: mici/integrators.py:63-80.
    """
    system = _system()
    integrator = integrators.LeapfrogIntegrator(system)
    state = system.prepare_state(
        ChainState(pos=np.zeros(2), mom=np.ones(2), dir=1))
    with pytest.raises(errors.AdaptationError):
        integrator.step(state)


def test_static_transition_validates_n_step():
    system = _system()
    integ = integrators.LeapfrogIntegrator(system, 0.5)
    with pytest.raises(ValueError):
        transitions.MetropolisStaticIntegrationTransition(system, integ, 0)


def test_random_transition_validates_range():
    system = _system()
    integ = integrators.LeapfrogIntegrator(system, 0.5)
    with pytest.raises(ValueError):
        transitions.MetropolisRandomIntegrationTransition(
            system, integ, (5, 2))


def test_dynamic_transition_validates_depth():
    system = _system()
    integ = integrators.LeapfrogIntegrator(system, 0.5)
    with pytest.raises(ValueError):
        transitions.MultinomialDynamicIntegrationTransition(
            system, integ, max_tree_depth=0)


def test_tractable_flow_integrator_requires_flows():
    """Non-tractable-flow systems are rejected by flow integrators.

    Reference: mici/integrators.py:92-131.
    """
    system = systems.SoftAbsRiemannianMetricSystem(
        lambda q: 0.5 * jnp.sum(q**2))
    with pytest.raises(ValueError):
        integrators.LeapfrogIntegrator(system, 0.5)


def test_metric_coercion_validation():
    with pytest.raises(ValueError):
        systems.EuclideanMetricSystem(
            lambda q: 0.5 * jnp.sum(q**2),
            metric=np.zeros((2, 2, 2)))


def test_sampler_rng_coercions():
    system = _system()
    integ = integrators.LeapfrogIntegrator(system, 0.5)
    for rng in [42, np.random.default_rng(3)]:
        sampler = samplers.DynamicMultinomialHMC(system, integ, rng)
        out = sampler.sample_chains(
            0, 3, [np.zeros(2)], adapters=None, display_progress=False)
        assert out.traces["pos"].shape == (1, 3, 2)


def test_unknown_replace_field_rejected():
    state = ChainState(pos=np.zeros(2), mom=np.ones(2), dir=1)
    with pytest.raises(ValueError):
        state.replace(nonexistent=1)


def test_eager_debug_mode_end_to_end():
    """The full sampling driver runs under ``jax.disable_jit()``.

    The eager/debug analogue of the reference's ``jax_nojit`` backend
    (mici/autodiff/__init__.py:80-93): with jit disabled every model
    function, integrator step and transition executes op by op in
    Python, so users can breakpoint/print inside their ``neg_log_dens``.
    """
    import jax

    system = _system()
    integ = integrators.LeapfrogIntegrator(system)
    sampler = samplers.DynamicMultinomialHMC(
        system, integ, 42, max_tree_depth=3)
    rng = np.random.default_rng(0)
    with jax.disable_jit():
        out = sampler.sample_chains(
            5, 10, [rng.standard_normal(2) for _ in range(4)],
            display_progress=False)
    assert out.traces["pos"].shape == (4, 10, 2)
    assert np.all(np.isfinite(out.traces["pos"]))
    assert np.isfinite(out.statistics["accept_stat"]).all()
