"""Tests for adapters.

Mirrors reference test strategy (mici tests/test_adapters.py): statistical
test that dual averaging realizes the target accept statistic, and Welford
estimates checked against np.var / np.cov oracles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mici_tpu import adapters, integrators, samplers, systems

SEED = 16081
DIM = 3


def _setup():
    def nld(q):
        return 0.5 * jnp.sum(q**2)

    system = systems.EuclideanMetricSystem(nld)
    integ = integrators.LeapfrogIntegrator(system)
    return system, integ


@pytest.mark.parametrize("target", [0.6, 0.8, 0.9])
def test_dual_averaging_realizes_target(target):
    """After adaptation the realized accept stat is close to target.

    Reference: mici tests/test_adapters.py:102-129 (500 adaptation steps,
    within 0.05 of target).
    """
    system, integ = _setup()
    sampler = samplers.StaticMetropolisHMC(system, integ, SEED, n_step=5)
    rng = np.random.default_rng(SEED)
    out = sampler.sample_chains(
        500, 0, [rng.standard_normal(DIM) for _ in range(2)],
        adapters=[adapters.DualAveragingStepSizeAdapter(target)],
        trace_warm_up=True, display_progress=False,
    )
    # average over the adaptive iterations, discarding the transient
    realized = float(np.nanmean(out.statistics["accept_stat"][:, 100:]))
    assert abs(realized - target) < 0.06


def test_welford_variance_oracle():
    """Online variance estimate matches np.var over update sequence.

    Reference: mici tests/test_adapters.py:190-297.
    """
    system, integ = _setup()
    from mici_tpu.states import ChainState
    from mici_tpu.transitions import (
        MultinomialDynamicIntegrationTransition,
    )

    trans = MultinomialDynamicIntegrationTransition(system, integ)
    adapter = adapters.OnlineVarianceMetricAdapter(reg_iter_offset=0)
    rng = np.random.default_rng(SEED)
    positions = rng.standard_normal((60, DIM))
    state = system.prepare_state(
        ChainState(pos=positions[0], mom=np.zeros(DIM), dir=1))
    a_state, params = adapter.initialize(state, trans)
    for pos in positions:
        a_state, params = adapter.update(
            a_state, state.replace(pos=jnp.asarray(pos)), {}, params)
    var_est = np.asarray(a_state["sum_diff_sq"]) / (len(positions) - 1)
    np.testing.assert_allclose(
        var_est, np.var(positions, axis=0, ddof=1), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(a_state["mean"]), positions.mean(0), rtol=1e-10)


def test_welford_covariance_oracle():
    system, integ = _setup()
    from mici_tpu.states import ChainState
    from mici_tpu.transitions import (
        MultinomialDynamicIntegrationTransition,
    )

    trans = MultinomialDynamicIntegrationTransition(system, integ)
    adapter = adapters.OnlineCovarianceMetricAdapter()
    rng = np.random.default_rng(SEED)
    positions = rng.standard_normal((60, DIM))
    state = system.prepare_state(
        ChainState(pos=positions[0], mom=np.zeros(DIM), dir=1))
    a_state, params = adapter.initialize(state, trans)
    for pos in positions:
        a_state, params = adapter.update(
            a_state, state.replace(pos=jnp.asarray(pos)), {}, params)
    cov_est = np.asarray(a_state["sum_diff_outer"]) / (len(positions) - 1)
    np.testing.assert_allclose(
        cov_est, np.cov(positions.T, ddof=1), rtol=1e-9, atol=1e-12)


def test_cross_chain_combination_matches_pooled():
    """Chan et al. combination over chains equals pooled statistics."""
    system, integ = _setup()
    adapter = adapters.OnlineVarianceMetricAdapter(reg_iter_offset=0)
    rng = np.random.default_rng(SEED)
    n_chain, n_iter = 4, 30
    positions = rng.standard_normal((n_chain, n_iter, DIM))
    batched = {
        "iter": jnp.full((n_chain,), n_iter, jnp.int32),
        "mean": jnp.asarray(positions.mean(axis=1)),
        "sum_diff_sq": jnp.asarray(
            ((positions - positions.mean(axis=1, keepdims=True)) ** 2
             ).sum(axis=1)),
    }
    n_total, var_sum = adapter._combine(batched)
    pooled = positions.reshape(-1, DIM)
    np.testing.assert_allclose(float(n_total), n_chain * n_iter)
    np.testing.assert_allclose(
        np.asarray(var_sum) / (n_chain * n_iter - 1),
        np.var(pooled, axis=0, ddof=1), rtol=1e-9)


def test_step_size_reducers():
    logs = jnp.log(jnp.asarray([0.1, 0.2, 0.4]))
    np.testing.assert_allclose(
        adapters.arithmetic_mean_log_step_size_reducer(logs),
        np.mean([0.1, 0.2, 0.4]), rtol=1e-10)
    np.testing.assert_allclose(
        adapters.geometric_mean_log_step_size_reducer(logs),
        np.exp(np.mean(np.log([0.1, 0.2, 0.4]))), rtol=1e-10)
    np.testing.assert_allclose(
        adapters.min_log_step_size_reducer(logs), 0.1, rtol=1e-10)


def test_init_step_size_search_jit_vmap():
    """Init search runs under jit+vmap with per-chain results."""
    system, integ = _setup()
    from mici_tpu.states import ChainState
    from mici_tpu.transitions import (
        MultinomialDynamicIntegrationTransition,
    )

    trans = MultinomialDynamicIntegrationTransition(system, integ)
    adapter = adapters.DualAveragingStepSizeAdapter()
    rng = np.random.default_rng(SEED)
    positions = jnp.asarray(rng.standard_normal((4, DIM)))
    momenta = jnp.asarray(rng.standard_normal((4, DIM)))

    @jax.jit
    def init(pos, mom):
        state = system.prepare_state(ChainState(pos=pos, mom=mom, dir=1))
        _, params = adapter.initialize(state, trans)
        return params["step_size"]

    steps = jax.vmap(init)(positions, momenta)
    assert np.all(np.isfinite(np.asarray(steps)))
    assert np.all(np.asarray(steps) > 0)


# ---------------------------------------------------------------------------
# TreeDepthCapAdapter (TPU-native lockstep depth-cap tuning)
# ---------------------------------------------------------------------------


def _depth_cap_fixture(max_tree_depth=8):
    rng = np.random.default_rng(42)
    a = rng.standard_normal((4, 4))
    cov = a @ a.T + 4 * np.eye(4)
    prec = jnp.asarray(np.linalg.inv(cov))

    def nld(q):
        return 0.5 * q @ (prec @ q)

    system = systems.EuclideanMetricSystem(nld)
    integ = integrators.LeapfrogIntegrator(system)
    sampler = samplers.DynamicMultinomialHMC(
        system, integ, 42, max_tree_depth=max_tree_depth)
    inits = [rng.standard_normal(4) for _ in range(8)]
    return sampler, inits


def test_tree_depth_cap_finalize_policy():
    adapter = adapters.TreeDepthCapAdapter(quantile=0.9)
    sampler, _ = _depth_cap_fixture(max_tree_depth=8)
    transition = sampler.transitions["integration_transition"]
    # Synthetic chain-stacked histograms: 95% of mass at depth <= 3.
    counts = np.zeros((2, 9), np.int32)
    counts[:, 2] = 40
    counts[:, 3] = 55
    counts[:, 7] = 5
    new_transition, _ = adapter.finalize(
        {"depth_counts": jnp.asarray(counts)}, None, transition, None)
    # q=0.9 quantile depth is 3 -> cap at 4 doublings
    assert new_transition.max_tree_depth == 4

    # Distribution pushing against the cap: without grow_back_max the cap
    # is kept; with it, it grows one notch.
    counts = np.zeros((2, 5), np.int32)
    counts[:, 4] = 100
    capped = new_transition
    kept, _ = adapter.finalize(
        {"depth_counts": jnp.asarray(counts)}, None, capped, None)
    assert kept.max_tree_depth == 4
    grower = adapters.TreeDepthCapAdapter(quantile=0.9, grow_back_max=8)
    grown, _ = grower.finalize(
        {"depth_counts": jnp.asarray(counts)}, None, capped, None)
    assert grown.max_tree_depth == 5


def test_tree_depth_cap_margin_does_not_oscillate():
    """margin is headroom, not censoring evidence: a quantile depth well
    below the cap must not trigger grow-back just because d_q + 1 + margin
    reaches the cap (regression: the cap would oscillate one notch every
    window, recompiling the stage program each time)."""
    adapter = adapters.TreeDepthCapAdapter(
        quantile=0.9, margin=2, grow_back_max=10)
    sampler, _ = _depth_cap_fixture(max_tree_depth=8)
    transition = sampler.transitions["integration_transition"]
    # Quantile depth 5 under cap 8: wanted = 5 + 1 + 2 = 8 but depths 6-8
    # are unpopulated, so the distribution is not censored -> keep cap 8.
    counts = np.zeros((2, 9), np.int32)
    counts[:, 4] = 50
    counts[:, 5] = 50
    kept, _ = adapter.finalize(
        {"depth_counts": jnp.asarray(counts)}, None, transition, None)
    assert kept.max_tree_depth == 8
    # Re-finalizing with the same distribution is a fixed point.
    kept2, _ = adapter.finalize(
        {"depth_counts": jnp.asarray(counts)}, None, kept, None)
    assert kept2.max_tree_depth == 8
    # Quantile mass just below the cap (natural U-turns at depth 7, no
    # tree recorded at the cap bucket): nothing was truncated, so the
    # cap must be kept — growing here would oscillate 8 <-> 9 every
    # window (regression #2).
    counts = np.zeros((2, 9), np.int32)
    counts[:, 7] = 100
    kept3, _ = adapter.finalize(
        {"depth_counts": jnp.asarray(counts)}, None, kept, None)
    assert kept3.max_tree_depth == 8
    # Genuine censoring — quantile mass in the cap bucket itself (the
    # possibly-truncated trees) — still grows one notch.
    counts = np.zeros((2, 9), np.int32)
    counts[:, 8] = 100
    grown, _ = adapter.finalize(
        {"depth_counts": jnp.asarray(counts)}, None, kept, None)
    assert grown.max_tree_depth == 9


def test_tree_depth_rebatch_mode_policy():
    """mode='rebatch' tunes the re-batching boundary instead of
    truncating: max_tree_depth is never changed, the boundary lands at
    the quantile depth + 1 + margin, and a boundary with no tail to
    split falls back to the plain path (rebatch_depth=None)."""
    adapter = adapters.TreeDepthCapAdapter(quantile=0.9, mode="rebatch")
    sampler, _ = _depth_cap_fixture(max_tree_depth=8)
    transition = sampler.transitions["integration_transition"]
    counts = np.zeros((2, 9), np.int32)
    counts[:, 2] = 40
    counts[:, 3] = 55
    counts[:, 7] = 5
    tuned, _ = adapter.finalize(
        {"depth_counts": jnp.asarray(counts)}, None, transition, None)
    assert tuned.max_tree_depth == 8
    assert tuned.rebatch_depth == 4
    # Same histogram again: fixed point, transition returned unchanged.
    tuned2, _ = adapter.finalize(
        {"depth_counts": jnp.asarray(counts)}, None, tuned, None)
    assert tuned2 is tuned
    # Whole distribution at the maximum depth: no tail to split.
    counts = np.zeros((2, 9), np.int32)
    counts[:, 8] = 100
    plain, _ = adapter.finalize(
        {"depth_counts": jnp.asarray(counts)}, None, tuned, None)
    assert plain.max_tree_depth == 8
    assert plain.rebatch_depth is None


def test_tree_depth_rebatch_mode_validation():
    with pytest.raises(ValueError, match="mode"):
        adapters.TreeDepthCapAdapter(mode="nope")
    with pytest.raises(ValueError, match="grow_back_max"):
        adapters.TreeDepthCapAdapter(mode="rebatch", grow_back_max=8)
    # Re-batching needs the fused leaf loop.
    sampler, _ = _depth_cap_fixture(max_tree_depth=4)
    transition = sampler.transitions["integration_transition"]
    doubling = transition.replace(loop_mode="doubling")
    adapter = adapters.TreeDepthCapAdapter(mode="rebatch")
    with pytest.raises(ValueError, match="fused"):
        adapter.initialize(None, doubling)


def test_tree_depth_rebatch_mode_end_to_end():
    """Warm-up with mode='rebatch' sets the re-batching boundary below
    the unchanged max_tree_depth and sampling stays healthy."""
    sampler, inits = _depth_cap_fixture(max_tree_depth=8)
    out = sampler.sample_chains(
        50, 50, inits,
        adapters=[adapters.DualAveragingStepSizeAdapter(),
                  adapters.TreeDepthCapAdapter(mode="rebatch")],
        display_progress=False)
    transition = sampler.transitions["integration_transition"]
    assert transition.max_tree_depth == 8
    # a 4-D Gaussian with a well-tuned step size U-turns well below 2^8
    # leapfrog steps, so the tuned boundary must be a real split point
    assert transition.rebatch_depth is not None
    assert transition.rebatch_depth < 8
    assert np.nanmean(out.statistics["accept_stat"]) > 0.5
    assert np.all(np.isfinite(out.traces["pos"]))


def test_default_adapters_include_rebatch_tuning_invisibly():
    """Dynamic NUTS samplers' *default* adapter list appends
    TreeDepthCapAdapter(mode='rebatch') (TPU-native, beyond the
    reference defaults) — and it must be statistically invisible:
    traces bit-identical to the explicit reference-default list."""
    sampler_default, inits = _depth_cap_fixture(max_tree_depth=8)
    out_default = sampler_default.sample_chains(
        30, 30, inits, display_progress=False)
    tr = sampler_default.transitions["integration_transition"]
    # tuning happened (boundary set below the untouched max depth)
    assert tr.max_tree_depth == 8
    assert tr.rebatch_depth is not None and tr.rebatch_depth < 8

    sampler_ref, inits2 = _depth_cap_fixture(max_tree_depth=8)
    out_ref = sampler_ref.sample_chains(
        30, 30, inits2, display_progress=False,
        adapters=[adapters.DualAveragingStepSizeAdapter()])
    np.testing.assert_array_equal(
        out_default.traces["pos"], out_ref.traces["pos"])
    np.testing.assert_array_equal(
        np.asarray(out_default.statistics["accept_stat"]),
        np.asarray(out_ref.statistics["accept_stat"]))

    # Static (non-dynamic) samplers keep the reference default list.
    system = systems.EuclideanMetricSystem(lambda q: 0.5 * jnp.sum(q**2))
    integ = integrators.LeapfrogIntegrator(system)
    static = samplers.StaticMetropolisHMC(system, integ, 0, n_step=4)
    out = static.sample_chains(
        5, 5, [np.zeros(3) + 0.1], display_progress=False)
    assert np.all(np.isfinite(out.traces["pos"]))


def test_tree_depth_cap_requires_dynamic_transition():
    system = systems.EuclideanMetricSystem(lambda q: 0.5 * jnp.sum(q**2))
    integ = integrators.LeapfrogIntegrator(system, 0.5)
    from mici_tpu.transitions import MetropolisStaticIntegrationTransition

    transition = MetropolisStaticIntegrationTransition(system, integ, 4)
    adapter = adapters.TreeDepthCapAdapter()
    with pytest.raises(ValueError, match="dynamic"):
        adapter.initialize(None, transition)


def test_tree_depth_cap_end_to_end():
    """Warm-up with the depth-cap adapter reduces the main-stage cap to
    the kernel's natural U-turn depth and sampling stays healthy."""
    sampler, inits = _depth_cap_fixture(max_tree_depth=8)
    out = sampler.sample_chains(
        50, 50, inits,
        adapters=[adapters.DualAveragingStepSizeAdapter(),
                  adapters.TreeDepthCapAdapter()],
        display_progress=False)
    transition = sampler.transitions["integration_transition"]
    # a 4-D Gaussian with a well-tuned step size needs nowhere near 2^8
    # leapfrog steps per trajectory
    assert transition.max_tree_depth < 8
    depths = out.statistics["tree_depth"]
    assert depths.max() <= transition.max_tree_depth
    assert np.nanmean(out.statistics["accept_stat"]) > 0.5
    assert np.all(np.isfinite(out.traces["pos"]))
