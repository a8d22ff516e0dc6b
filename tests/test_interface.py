"""End-to-end smoke tests for the functional interface.

Mirrors reference test strategy (mici tests/test_interface.py:51-123):
sample_hmc_chains / sample_constrained_hmc_chains over dims x chains with
short chains, checking output container shapes.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import mici_tpu
from mici_tpu import integrators, samplers, systems

SEED = 9572


@pytest.mark.parametrize("n_chain", [1, 2])
@pytest.mark.parametrize("dim", [1, 3])
def test_sample_hmc_chains(n_chain, dim):
    rng = np.random.default_rng(SEED)
    out = mici_tpu.sample_hmc_chains(
        5, 5, rng.standard_normal((n_chain, dim)),
        lambda q: 0.5 * jnp.sum(q**2),
        seed=SEED, display_progress=False,
        sampler_kwargs={"max_tree_depth": 4},
    )
    assert out.traces["pos"].shape == (n_chain, 5, dim)
    assert not np.any(np.isnan(out.traces["pos"]))
    assert len(out.final_states) == n_chain


@pytest.mark.parametrize("sampler_class", [
    samplers.StaticMetropolisHMC,
    samplers.RandomMetropolisHMC,
    samplers.DynamicSliceHMC,
])
def test_sample_hmc_chains_sampler_classes(sampler_class):
    rng = np.random.default_rng(SEED)
    kwargs = {}
    if sampler_class is samplers.StaticMetropolisHMC:
        kwargs = {"n_step": 4}
    elif sampler_class is samplers.RandomMetropolisHMC:
        kwargs = {"n_step_range": (2, 6)}
    out = mici_tpu.sample_hmc_chains(
        5, 5, rng.standard_normal((2, 2)),
        lambda q: 0.5 * jnp.sum(q**2),
        seed=SEED, sampler_class=sampler_class, sampler_kwargs=kwargs,
        display_progress=False,
    )
    assert out.traces["pos"].shape == (2, 5, 2)


def test_sample_hmc_chains_integrator_classes():
    rng = np.random.default_rng(SEED)
    out = mici_tpu.sample_hmc_chains(
        5, 5, rng.standard_normal((1, 2)),
        lambda q: 0.5 * jnp.sum(q**2),
        seed=SEED, integrator_class=integrators.BCSSTwoStageIntegrator,
        display_progress=False,
        sampler_kwargs={"max_tree_depth": 4},
    )
    assert out.traces["pos"].shape == (1, 5, 2)


def test_sample_constrained_hmc_chains():
    # sampling on the unit circle
    rng = np.random.default_rng(SEED)
    thetas = rng.uniform(0, 2 * np.pi, 2)
    init = np.stack([np.cos(thetas), np.sin(thetas)], axis=1)
    out = mici_tpu.sample_constrained_hmc_chains(
        5, 5, init,
        lambda q: 0.5 * jnp.sum(q**2),
        lambda q: jnp.array([jnp.sum(q**2) - 1.0]),
        seed=SEED, display_progress=False,
        sampler_kwargs={"max_tree_depth": 3},
        integrator_kwargs={"projection_solver_kwargs":
                           {"constraint_tol": 1e-10,
                            "position_tol": 1e-9}},
    )
    assert out.traces["pos"].shape == (2, 5, 2)
    # all samples on manifold
    radii = np.linalg.norm(out.traces["pos"], axis=-1)
    np.testing.assert_allclose(radii, 1.0, atol=1e-6)


def test_sample_constrained_hmc_chains_gaussian_system():
    rng = np.random.default_rng(SEED)
    thetas = rng.uniform(0, 2 * np.pi, 1)
    init = np.stack([np.cos(thetas), np.sin(thetas)], axis=1)
    out = mici_tpu.sample_constrained_hmc_chains(
        3, 4, init,
        lambda q: 0.5 * jnp.sum(q**2),
        lambda q: jnp.array([jnp.sum(q**2) - 1.0]),
        seed=SEED, dens_wrt_hausdorff=False,
        display_progress=False,
        sampler_kwargs={"max_tree_depth": 3},
    )
    assert out.traces["pos"].shape == (1, 4, 2)


def test_sample_constrained_hmc_chains_float32_default_tols():
    """f32 inputs must resolve dtype-aware solver/reversibility tolerances.

    Regression guard for the failure mode where f64-grade tolerances in
    float32 make every projection "fail", collapsing the chain: with the
    dtype-aware defaults the error fractions stay near zero and samples
    stay on the manifold at the f32 residual floor.
    """
    rng = np.random.default_rng(SEED + 9)
    thetas = rng.uniform(0, 2 * np.pi, 4)
    init = np.stack(
        [np.cos(thetas), np.sin(thetas)], axis=1).astype(np.float32)
    # 25 warm-up iterations: enough for dual averaging to settle (at ~5
    # the step is still too coarse and fails equally in f64)
    out = mici_tpu.sample_constrained_hmc_chains(
        25, 10, init,
        lambda q: 0.5 * jnp.sum(q**2),
        lambda q: jnp.array([jnp.sum(q**2) - 1.0]),
        seed=SEED, display_progress=False,
        sampler_kwargs={"max_tree_depth": 3},
    )
    pos = np.asarray(out.traces["pos"])
    assert pos.dtype == np.float32
    radii = np.linalg.norm(pos, axis=-1)
    np.testing.assert_allclose(radii, 1.0, atol=1e-4)
    # the failure mode being guarded is catastrophic (f64-grade tolerances
    # in f32 flag essentially every step and collapse the adapted step
    # size); fractions are noisy at 4 chains x 10 iterations, so bound
    # them loosely rather than at their typical ~0.05 values
    assert np.mean(out.statistics["convergence_error"]) < 0.5
    assert np.mean(out.statistics["non_reversible_step"]) < 0.5
    assert np.nanmean(out.statistics["accept_stat"]) > 0.5
