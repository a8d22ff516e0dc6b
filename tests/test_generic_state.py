"""Generic ChainState: arbitrary state variables through the MCMC driver.

Reference: mici/states.py:160-230 — ``ChainState(**variables)`` supports any
variable set, so non-Hamiltonian transitions over arbitrary variables can be
driven by the same generic ``MarkovChainMonteCarloMethod``.  These tests
exercise that capability in the TPU rebuild: a Gaussian random-walk
Metropolis kernel over a free variable ``x`` (no system, no momentum) runs
through ``sample_chains`` inside the compiled vmapped stage engine.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mici_tpu._pytree import register_pytree
from mici_tpu.errors import ReadOnlyStateError
from mici_tpu.samplers import MarkovChainMonteCarloMethod
from mici_tpu.states import ChainState
from mici_tpu.transitions import Transition


@register_pytree(data_fields=("scale",))
class GaussianRandomWalkTransition(Transition):
    """Metropolis random walk over free variable ``x``, N(0, 1) target."""

    def __init__(self, scale=0.8):
        self.scale = jnp.asarray(scale)

    @property
    def state_variables(self):
        return {"x"}

    @property
    def statistic_types(self):
        return {"accept_stat": (float, jnp.nan)}

    def sample(self, state, rng):
        key_prop, key_acc = jax.random.split(rng)
        x = state.x
        prop = x + self.scale * jax.random.normal(key_prop, jnp.shape(x))
        log_ratio = 0.5 * (jnp.sum(x**2) - jnp.sum(prop**2))
        accept_prob = jnp.minimum(1.0, jnp.exp(log_ratio))
        accept = jax.random.uniform(key_acc) < accept_prob
        new_x = jnp.where(accept, prop, x)
        return state.replace(x=new_x), {"accept_stat": accept_prob}


class TestGenericChainState:
    def test_free_variable_attribute_access(self):
        state = ChainState(x=jnp.arange(3.0), count=jnp.int32(2))
        assert state.pos is None
        np.testing.assert_array_equal(state.x, np.arange(3.0))
        assert int(state.count) == 2

    def test_replace_free_variable(self):
        state = ChainState(x=jnp.zeros(2))
        new = state.replace(x=jnp.ones(2))
        np.testing.assert_array_equal(new.x, np.ones(2))
        np.testing.assert_array_equal(state.x, np.zeros(2))

    def test_replace_unknown_name_raises(self):
        state = ChainState(x=jnp.zeros(2))
        with pytest.raises(ValueError, match="Unknown field"):
            state.replace(y=jnp.zeros(2))

    def test_missing_attribute_raises(self):
        state = ChainState(x=jnp.zeros(2))
        with pytest.raises(AttributeError):
            _ = state.y

    def test_invalid_variable_names_raise(self):
        with pytest.raises(ValueError, match="Invalid state variable"):
            ChainState(_hidden=jnp.zeros(2))
        with pytest.raises(ValueError, match="Invalid state variable"):
            ChainState(copy=jnp.zeros(2))

    def test_immutability_covers_free_variables(self):
        state = ChainState(x=jnp.zeros(2))
        with pytest.raises(ReadOnlyStateError):
            state.x = jnp.ones(2)

    def test_pytree_roundtrip_with_variables(self):
        state = ChainState(pos=jnp.ones(2), x=jnp.arange(4.0))
        leaves, treedef = jax.tree_util.tree_flatten(state)
        rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
        np.testing.assert_array_equal(rebuilt.x, np.arange(4.0))
        np.testing.assert_array_equal(rebuilt.pos, np.ones(2))

    def test_vmap_over_free_variables(self):
        per_chain = [
            ChainState(x=jnp.arange(6.0).reshape(3, 2)[i]) for i in range(3)
        ]
        states = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *per_chain,
        )
        doubled = jax.vmap(lambda s: s.replace(x=2 * s.x))(states)
        np.testing.assert_array_equal(
            doubled.x, 2 * np.arange(6.0).reshape(3, 2),
        )


class TestNonHMCSampling:
    def test_random_walk_through_generic_driver(self):
        transition = GaussianRandomWalkTransition(scale=1.1)
        sampler = MarkovChainMonteCarloMethod(
            jax.random.PRNGKey(42), {"rw": transition},
        )
        n_chain, n_iter = 4, 400
        init_states = [
            ChainState(x=jnp.full((2,), float(i))) for i in range(n_chain)
        ]
        final_states, traces, stats = sampler.sample_chains(
            0, n_iter, init_states,
            trace_funcs=[lambda state: {"x": state.x}],
            display_progress=False,
        )
        assert traces["x"].shape == (n_chain, n_iter, 2)
        assert stats["rw"]["accept_stat"].shape == (n_chain, n_iter)
        accept = stats["rw"]["accept_stat"]
        assert np.all(np.isfinite(accept))
        assert 0.05 < accept.mean() < 0.95
        # Chains actually move and final states carry the variable.
        assert not np.allclose(traces["x"][:, 0], traces["x"][:, -1])
        for i, state in enumerate(final_states):
            np.testing.assert_array_equal(
                state.x, traces["x"][i, -1],
            )
        # Sample mean/var roughly match the N(0,1) target.
        tail = traces["x"][:, n_iter // 2:].reshape(-1)
        assert abs(tail.mean()) < 0.4
        assert 0.5 < tail.var() < 2.0

    def test_mixed_hmc_variable_state(self):
        # pos/mom fast paths coexist with free variables in one pytree.
        state = ChainState(
            pos=jnp.zeros(3), mom=jnp.ones(3), temperature=jnp.float32(1.5),
        )
        new = state.replace(pos=jnp.ones(3), temperature=jnp.float32(2.0))
        np.testing.assert_array_equal(new.pos, np.ones(3))
        assert float(new.temperature) == 2.0
        assert float(state.temperature) == 1.5
