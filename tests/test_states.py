"""Tests for chain state pytree and aux-cache threading.

Mirrors reference test strategy (mici tests/test_states.py:99-303): the
reference asserts cache hit/miss call counts; here the equivalent guarantee
— exactly one model evaluation per position inside compiled code — is
verified by counting primitive evaluations in traced jaxprs and by aux
consistency checks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mici_tpu import errors, integrators, systems
from mici_tpu.states import ChainState

DIM = 3


def test_state_immutable():
    state = ChainState(pos=np.zeros(DIM), mom=np.ones(DIM), dir=1)
    with pytest.raises(errors.ReadOnlyStateError):
        state.pos = np.ones(DIM)


def test_replace_and_copy():
    state = ChainState(pos=np.zeros(DIM), mom=np.ones(DIM), dir=1)
    new = state.replace(pos=jnp.full(DIM, 2.0))
    np.testing.assert_array_equal(np.asarray(new.pos), 2.0)
    np.testing.assert_array_equal(np.asarray(state.pos), 0.0)
    assert state.copy() is state


def test_error_bits():
    state = ChainState(pos=np.zeros(DIM), mom=np.ones(DIM), dir=1)
    state = state.with_error_bit(errors.DIVERGENCE_BIT, True)
    state = state.with_error_bit(errors.CONVERGENCE_BIT, False)
    assert int(state.error) == errors.DIVERGENCE_BIT
    state = state.with_error_bit(errors.CONVERGENCE_BIT, True)
    assert int(state.error) == (
        errors.DIVERGENCE_BIT | errors.CONVERGENCE_BIT)
    assert bool(state.has_error)
    assert int(state.clear_error().error) == 0


def test_pytree_roundtrip():
    state = ChainState(pos=np.zeros(DIM), mom=np.ones(DIM), dir=-1)
    leaves, treedef = jax.tree_util.tree_flatten(state)
    rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
    assert int(rebuilt.dir) == -1
    np.testing.assert_array_equal(np.asarray(rebuilt.mom), 1.0)


def _count_evals(jaxpr_text, marker="integer_pow"):
    return jaxpr_text.count(marker)


def test_single_gradient_eval_per_leapfrog_step():
    """The aux threading yields exactly one gradient per leapfrog step.

    The reference achieves this with its memoization cache
    (mici/states.py:37-157); here the jaxpr of n fused steps must contain
    exactly n+1 evaluations of the (cubed-position) gradient including the
    initial preparation.
    """
    call_count = {"n": 0}

    def nld(q):
        call_count["n"] += 1
        return 0.25 * jnp.sum(q**4)

    system = systems.EuclideanMetricSystem(nld)
    integrator = integrators.LeapfrogIntegrator(system, 0.1)

    def run(pos, mom):
        state = system.prepare_state(ChainState(pos=pos, mom=mom, dir=1))
        for _ in range(3):
            state = integrator.step(state)
        return state.pos

    call_count["n"] = 0
    jax.make_jaxpr(run)(jnp.zeros(DIM), jnp.ones(DIM))
    # value_and_grad evaluates nld once per position: 1 (prepare) + 3 steps
    assert call_count["n"] == 4


def test_aux_refreshed_by_flows():
    def nld(q):
        return 0.25 * jnp.sum(q**4)

    system = systems.EuclideanMetricSystem(nld)
    state = system.prepare_state(
        ChainState(pos=np.ones(DIM), mom=np.ones(DIM), dir=1))
    flowed = system.h2_flow(state, 0.5)
    np.testing.assert_allclose(
        np.asarray(flowed.aux["grad_neg_log_dens"]),
        np.asarray(flowed.pos) ** 3, rtol=1e-10)
    # h1_flow keeps position (and aux) unchanged
    kicked = system.h1_flow(flowed, 0.1)
    assert kicked.aux is flowed.aux


def test_mom_none_allowed():
    state = ChainState(pos=np.zeros(DIM))
    assert state.mom is None
    leaves, treedef = jax.tree_util.tree_flatten(state)
    rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
    assert rebuilt.mom is None


def test_value_hashed_static_functions_share_jit_cache():
    """Identically-defined model functions (same code, equal closure
    values) produce pytree statics that compare equal, so recreating a
    system does not retrace compiled programs; differing closure values
    or code objects stay distinct (no false cache sharing)."""
    import jax

    from mici_tpu import systems

    def make(scale):
        def nld(q):
            return 0.5 * scale * (q**2).sum()

        return systems.EuclideanMetricSystem(nld)

    s_a, s_b, s_c = make(1.0), make(1.0), make(2.0)
    _, aux_a = jax.tree_util.tree_flatten(s_a)
    _, aux_b = jax.tree_util.tree_flatten(s_b)
    _, aux_c = jax.tree_util.tree_flatten(s_c)
    assert aux_a == aux_b
    assert hash(aux_a) == hash(aux_b)
    assert aux_a != aux_c

    def nld_other(q):
        return (q**4).sum()

    _, aux_d = jax.tree_util.tree_flatten(
        systems.EuclideanMetricSystem(nld_other))
    assert aux_a != aux_d

    calls = []
    @jax.jit
    def h(system, q):
        calls.append(1)
        state = system.prepare_state(ChainState(pos=q, mom=q))
        return system.h(state)

    q = jnp.ones(3)
    v_a = h(s_a, q)
    n_after_first = len(calls)
    v_b = h(s_b, q)           # same definition: no retrace
    assert len(calls) == n_after_first
    v_c = h(s_c, q)           # different closure value: retrace
    assert len(calls) == n_after_first + 1
    assert float(v_a) == float(v_b)
    assert float(v_a) != float(v_c)


def test_bound_method_statics_share_jit_cache():
    """Systems whose pytree statics hold *bound methods of the system
    itself* (SoftAbs exposes its metric as ``system._hess_only``) must
    still compare equal across identically configured instances —
    structural, cycle-tolerant equality in `_pytree._values_equal`.
    Regression: without it every fresh SoftAbs system missed the jit
    trace cache and re-paid a ~20 s stage-program trace (measured,
    BASELINE config 3 through the driver)."""
    import jax

    from mici_tpu import systems

    def make(coeff):
        def nld(q):
            return 0.5 * (q**2).sum() + 0.25 * (q**4).sum()

        return systems.SoftAbsRiemannianMetricSystem(
            nld, softabs_coeff=coeff)

    s_a, s_b, s_c = make(1.0), make(1.0), make(2.0)
    _, aux_a = jax.tree_util.tree_flatten(s_a)
    _, aux_b = jax.tree_util.tree_flatten(s_b)
    _, aux_c = jax.tree_util.tree_flatten(s_c)
    assert aux_a == aux_b
    assert hash(aux_a) == hash(aux_b)
    assert aux_a != aux_c

    calls = []

    @jax.jit
    def h(system, q):
        calls.append(1)
        state = system.prepare_state(ChainState(pos=q, mom=q))
        return system.h(state)

    q = jnp.ones(3)
    v_a = h(s_a, q)
    n_after_first = len(calls)
    v_b = h(s_b, q)           # same configuration: no retrace
    assert len(calls) == n_after_first
    h(s_c, q)                 # different softabs coefficient: retrace
    assert len(calls) == n_after_first + 1
    assert float(v_a) == float(v_b)
