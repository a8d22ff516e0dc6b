"""Iterative-vs-recursive NUTS subtree build equivalence.

The trickiest re-design in the framework is the iterative checkpoint-buffer
subtree builder (mici_tpu/transitions.py::_build_subtree) replacing the
reference's recursion (mici/transitions.py:645-706).  Termination decisions,
momentum sums, edge states, tree weights and step counts are all
*deterministic* given the trajectory (only proposal selection consumes
randomness), so this test re-implements the reference recursion directly
(same merge structure, same whole-tree and extra overlapping-subtree
checks) and requires exact agreement on dozens of random cases crossing
depths, directions, termination criteria and extra-check settings.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mici_tpu import integrators, systems, transitions
from mici_tpu.states import ChainState

SEED = 424242
DIM = 3


def _setup(step_size):
    rng = np.random.default_rng(SEED)
    a = rng.standard_normal((DIM, DIM))
    cov = a @ a.T + DIM * np.eye(DIM)
    prec = jnp.asarray(np.linalg.inv(cov))

    def nld(q):
        return 0.5 * q @ (prec @ q)

    system = systems.EuclideanMetricSystem(nld)
    integrator = integrators.LeapfrogIntegrator(system, step_size)
    return system, integrator


class _RecursiveReference:
    """Direct implementation of the reference recursion semantics."""

    def __init__(self, system, integrator, criterion, do_extra,
                 max_delta_h=1000.0):
        self.system = system
        self.integrator = integrator
        self.criterion = criterion
        self.do_extra = do_extra
        self.max_delta_h = max_delta_h
        self.n_step = 0

    def _crit(self, s1, s2, sum_mom):
        # velocities = dh_dmom for the Euclidean system
        v1 = np.asarray(self.system.dh_dmom(s1))
        v2 = np.asarray(self.system.dh_dmom(s2))
        if self.criterion == "euclidean":
            diff = np.asarray(s2.pos) - np.asarray(s1.pos)
            return (v1 @ diff < 0) or (v2 @ diff < 0)
        return (v1 @ sum_mom < 0) or (v2 @ sum_mom < 0)

    def _termination(self, tree, neg_sub, pos_sub):
        # mici/transitions.py:561-590
        if self._crit(tree["neg"], tree["pos"], tree["sum_mom"]):
            return True
        if tree["depth"] > 1 and self.do_extra:
            return self._crit(
                neg_sub["neg"], pos_sub["neg"],
                neg_sub["sum_mom"] + np.asarray(pos_sub["neg"].mom),
            ) or self._crit(
                neg_sub["pos"], pos_sub["pos"],
                pos_sub["sum_mom"] + np.asarray(neg_sub["pos"].mom),
            )
        return False

    def build(self, depth, state, h_init):
        # mici/transitions.py:645-706 (proposal sampling omitted: it does
        # not affect the compared outputs)
        if depth == 0:
            new_state = self.integrator.step(state)
            assert int(new_state.error) == 0
            h = float(self.system.h(new_state))
            self.n_step += 1
            if h - h_init > self.max_delta_h:
                return True, None
            tree = {
                "neg": new_state, "pos": new_state,
                "sum_mom": np.asarray(new_state.mom).copy(),
                "log_weight": -h, "depth": 0,
            }
            return False, tree
        term, inner = self.build(depth - 1, state, h_init)
        if term:
            return True, None
        state2 = inner["pos"] if int(state.dir) == 1 else inner["neg"]
        state2 = state2.replace(dir=state.dir)
        term, outer = self.build(depth - 1, state2, h_init)
        if term:
            return True, None
        neg_sub = inner if int(state.dir) == 1 else outer
        pos_sub = outer if int(state.dir) == 1 else inner
        tree = {
            "neg": neg_sub["neg"], "pos": pos_sub["pos"],
            "sum_mom": neg_sub["sum_mom"] + pos_sub["sum_mom"],
            "log_weight": np.logaddexp(
                neg_sub["log_weight"], pos_sub["log_weight"]),
            "depth": inner["depth"] + 1,
        }
        return self._termination(tree, neg_sub, pos_sub), tree


@pytest.mark.parametrize("criterion", ["euclidean", "riemannian"])
@pytest.mark.parametrize("do_extra", [True, False])
@pytest.mark.parametrize("direction", [1, -1])
@pytest.mark.parametrize("depth", [0, 2, 4])
def test_subtree_build_matches_recursion(criterion, do_extra, direction,
                                         depth):
    # step size large enough that U-turns occur within depth <= 4 trees
    system, integrator = _setup(step_size=0.9)
    crit_fn = (transitions.euclidean_no_u_turn_criterion
               if criterion == "euclidean"
               else transitions.riemannian_no_u_turn_criterion)
    trans = transitions.MultinomialDynamicIntegrationTransition(
        system, integrator, max_tree_depth=6,
        termination_criterion=crit_fn,
        do_extra_subtree_checks=do_extra)

    rng = np.random.default_rng(SEED + depth)
    n_mismatch_checked = 0
    for case in range(4):
        pos = rng.standard_normal(DIM)
        mom = rng.standard_normal(DIM)
        state = system.prepare_state(
            ChainState(pos=pos, mom=mom, dir=direction))
        h_init = float(system.h(state))

        ref = _RecursiveReference(system, integrator, criterion, do_extra)
        ref_term, ref_tree = ref.build(depth, state, h_init)

        sub = trans._build_subtree(
            state, jnp.int32(depth), {"h_init": jnp.asarray(h_init)},
            jax.random.PRNGKey(case),
        )

        assert bool(sub["terminated"]) == ref_term, (
            f"termination mismatch case={case}")
        assert int(sub["n_step"]) == ref.n_step
        if not ref_term:
            np.testing.assert_allclose(
                np.asarray(sub["sum_mom"]), ref_tree["sum_mom"],
                atol=1e-10)
            np.testing.assert_allclose(
                float(sub["weight"]), ref_tree["log_weight"], atol=1e-10)
            # first/last leaves in build order; reference neg/pos edges in
            # time order
            first, last = sub["first_leaf"], sub["last_leaf"]
            neg = first if direction == 1 else last
            pos_edge = last if direction == 1 else first
            np.testing.assert_allclose(
                np.asarray(neg.pos), np.asarray(ref_tree["neg"].pos),
                atol=1e-12)
            np.testing.assert_allclose(
                np.asarray(pos_edge.pos), np.asarray(ref_tree["pos"].pos),
                atol=1e-12)
            np.testing.assert_allclose(
                np.asarray(neg.mom), np.asarray(ref_tree["neg"].mom),
                atol=1e-12)
            n_mismatch_checked += 1
        ref.n_step = 0


def test_subtree_termination_rate_sanity():
    """With a large step a depth-4 build should terminate at least once
    (guards against the checks never firing)."""
    system, integrator = _setup(step_size=1.4)
    trans = transitions.MultinomialDynamicIntegrationTransition(
        system, integrator, max_tree_depth=6)
    rng = np.random.default_rng(SEED)
    terminated = []
    for case in range(8):
        pos = rng.standard_normal(DIM)
        mom = rng.standard_normal(DIM)
        state = system.prepare_state(ChainState(pos=pos, mom=mom, dir=1))
        h_init = float(system.h(state))
        sub = trans._build_subtree(
            state, jnp.int32(4), {"h_init": jnp.asarray(h_init)},
            jax.random.PRNGKey(case),
        )
        terminated.append(bool(sub["terminated"]))
    assert any(terminated)


# ---------------------------------------------------------------------------
# Fused single-loop vs two-loop formulation: bit-identical transitions
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("transition_cls", [
    transitions.MultinomialDynamicIntegrationTransition,
    transitions.SliceDynamicIntegrationTransition,
])
@pytest.mark.parametrize("criterion", [
    transitions.riemannian_no_u_turn_criterion,
    transitions.euclidean_no_u_turn_criterion,
])
@pytest.mark.parametrize("do_extra", [True, False])
@pytest.mark.parametrize("step_size", [0.3, 1.1])
def test_fused_sample_identical_to_two_loop(
        transition_cls, criterion, do_extra, step_size):
    """The fused single-while-loop sample consumes PRNG streams in the
    same order as the two-loop doubling formulation, so both make the
    same discrete decisions (steps, depths, termination/error flags) and
    produce the same trajectories.  Continuous quantities are compared
    at ~10 ulp: XLA fuses the two program structures differently, so the
    identical arithmetic yields last-ulp differences.
    """
    system, integrator = _setup(step_size=step_size)
    trans = transition_cls(
        system, integrator, max_tree_depth=5,
        termination_criterion=criterion,
        do_extra_subtree_checks=do_extra,
    )
    rng = np.random.default_rng(SEED + 99)
    fused = jax.jit(trans._sample_fused)
    two_loop = jax.jit(trans._sample_two_loop)
    exact_keys = ("n_step", "tree_depth", "diverging",
                  "non_reversible_step", "convergence_error")
    for case in range(12):
        pos = rng.standard_normal(DIM)
        mom = rng.standard_normal(DIM)
        state = system.prepare_state(ChainState(pos=pos, mom=mom, dir=1))
        key = jax.random.PRNGKey(SEED + case)
        s_fused, stats_fused = fused(state, key)
        s_two, stats_two = two_loop(state, key)
        np.testing.assert_allclose(
            np.asarray(s_fused.pos), np.asarray(s_two.pos), rtol=1e-12)
        np.testing.assert_allclose(
            np.asarray(s_fused.mom), np.asarray(s_two.mom), rtol=1e-12,
            atol=1e-14)
        assert int(s_fused.dir) == int(s_two.dir)
        for key_name in exact_keys:
            np.testing.assert_array_equal(
                np.asarray(stats_fused[key_name]),
                np.asarray(stats_two[key_name]), err_msg=key_name)
        for key_name in stats_two:
            if key_name not in exact_keys:
                np.testing.assert_allclose(
                    np.asarray(stats_fused[key_name]),
                    np.asarray(stats_two[key_name]), rtol=1e-12,
                    err_msg=key_name)


# ---------------------------------------------------------------------------
# Depth-tail re-batching: bit-identical to plain vmapped execution
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("transition_cls", [
    transitions.MultinomialDynamicIntegrationTransition,
    transitions.SliceDynamicIntegrationTransition,
])
@pytest.mark.parametrize("rebatch_depth,rebatch_slots", [
    (2, 4),    # multi-round tail (slots < expected actives)
    (3, 64),   # single-round tail (slots > n_chain, clamped)
    (0, 8),    # everything in the tail phase
    (7, 4),    # bulk phase runs to completion; tail empty
])
def test_rebatch_sample_batch_identical_to_vmap(
        transition_cls, rebatch_depth, rebatch_slots):
    """Depth-tail re-batching (bulk phase to ``rebatch_depth``, then
    fixed-slot continuation rounds) applies exactly the per-chain fused
    loop body, so every trajectory, decision and statistic is
    bit-identical to plain ``vmap(sample)`` over the same keys."""
    system, integrator = _setup(step_size=0.4)
    kwargs = dict(max_tree_depth=7)
    plain = transition_cls(system, integrator, **kwargs)
    rebatch = transition_cls(
        system, integrator, rebatch_depth=rebatch_depth,
        rebatch_slots=rebatch_slots, **kwargs)
    rng = np.random.default_rng(SEED + 1)
    n_chain = 37
    pos = rng.standard_normal((n_chain, DIM))
    mom = rng.standard_normal((n_chain, DIM))
    states = jax.vmap(
        lambda p, m: system.prepare_state(ChainState(pos=p, mom=m, dir=1)),
    )(jnp.asarray(pos), jnp.asarray(mom))
    keys = jax.random.split(jax.random.PRNGKey(SEED), n_chain)
    s0, st0 = jax.jit(plain.sample_batch)(states, keys)
    s1, st1 = jax.jit(rebatch.sample_batch)(states, keys)
    for name in ("pos", "mom", "dir", "error"):
        np.testing.assert_array_equal(
            np.asarray(getattr(s0, name)), np.asarray(getattr(s1, name)),
            err_msg=name)
    for key_name in st0:
        np.testing.assert_array_equal(
            np.asarray(st0[key_name]), np.asarray(st1[key_name]),
            err_msg=key_name)
    # The case grid must actually exercise heterogeneous depths.
    assert len(np.unique(np.asarray(st0["tree_depth"]))) > 1


def test_rebatch_sample_batch_identical_with_step_size_override():
    """Per-chain step-size overrides (the adapter path) thread through
    the re-batching carry bit-identically."""
    system, integrator = _setup(step_size=0.4)
    plain = transitions.MultinomialDynamicIntegrationTransition(
        system, integrator, max_tree_depth=7)
    rebatch = transitions.MultinomialDynamicIntegrationTransition(
        system, integrator, max_tree_depth=7, rebatch_depth=2,
        rebatch_slots=8)
    rng = np.random.default_rng(SEED + 2)
    n_chain = 21
    pos = rng.standard_normal((n_chain, DIM))
    mom = rng.standard_normal((n_chain, DIM))
    states = jax.vmap(
        lambda p, m: system.prepare_state(ChainState(pos=p, mom=m, dir=1)),
    )(jnp.asarray(pos), jnp.asarray(mom))
    keys = jax.random.split(jax.random.PRNGKey(SEED + 3), n_chain)
    step_sizes = jnp.asarray(rng.uniform(0.2, 0.6, n_chain))
    s0, st0 = jax.jit(
        lambda s, k: plain.sample_batch(s, k, {"step_size": step_sizes}),
    )(states, keys)
    s1, st1 = jax.jit(
        lambda s, k: rebatch.sample_batch(s, k, {"step_size": step_sizes}),
    )(states, keys)
    np.testing.assert_array_equal(np.asarray(s0.pos), np.asarray(s1.pos))
    np.testing.assert_array_equal(np.asarray(s0.mom), np.asarray(s1.mom))
    exact_keys = ("n_step", "tree_depth", "diverging",
                  "non_reversible_step", "convergence_error", "step_size")
    for key_name in st0:
        if key_name in exact_keys:
            np.testing.assert_array_equal(
                np.asarray(st0[key_name]), np.asarray(st1[key_name]),
                err_msg=key_name)
        else:
            # The per-chain step-size substitution fuses differently in
            # the two program structures; accumulated continuous stats
            # (accept-prob sums) can differ in the last ulp.
            np.testing.assert_allclose(
                np.asarray(st0[key_name]), np.asarray(st1[key_name]),
                rtol=1e-12, err_msg=key_name)
    np.testing.assert_array_equal(
        np.asarray(st1["step_size"]), np.abs(np.asarray(step_sizes)))


def test_rebatch_requires_fused_loop_mode():
    system, integrator = _setup(step_size=0.4)
    with pytest.raises(ValueError, match="fused"):
        transitions.MultinomialDynamicIntegrationTransition(
            system, integrator, loop_mode="doubling", rebatch_depth=2)


def test_fused_sample_identical_to_two_loop_vmapped():
    """Identity also holds for a vmapped chain batch (select-based
    masking interacts with batching)."""
    system, integrator = _setup(step_size=0.5)
    trans = transitions.MultinomialDynamicIntegrationTransition(
        system, integrator, max_tree_depth=4)
    rng = np.random.default_rng(SEED + 7)
    n_chain = 16
    pos = rng.standard_normal((n_chain, DIM))
    mom = rng.standard_normal((n_chain, DIM))
    states = jax.vmap(
        lambda p, m: system.prepare_state(ChainState(pos=p, mom=m, dir=1)),
    )(jnp.asarray(pos), jnp.asarray(mom))
    keys = jax.random.split(jax.random.PRNGKey(SEED), n_chain)
    s_fused, stats_fused = jax.jit(jax.vmap(trans._sample_fused))(states, keys)
    s_two, stats_two = jax.jit(jax.vmap(trans._sample_two_loop))(
        states, keys)
    np.testing.assert_allclose(
        np.asarray(s_fused.pos), np.asarray(s_two.pos), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(s_fused.mom), np.asarray(s_two.mom), rtol=1e-12,
        atol=1e-14)
    for key_name in ("n_step", "tree_depth", "diverging"):
        np.testing.assert_array_equal(
            np.asarray(stats_fused[key_name]),
            np.asarray(stats_two[key_name]), err_msg=key_name)
    for key_name in ("accept_stat", "reject_prob"):
        np.testing.assert_allclose(
            np.asarray(stats_fused[key_name]),
            np.asarray(stats_two[key_name]), rtol=1e-12,
            err_msg=key_name)
