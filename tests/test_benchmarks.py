"""Smoke tests for the BASELINE benchmark configurations (tiny sizes)."""

import numpy as np
import pytest

from benchmarks import configs


@pytest.mark.parametrize("make,n_kwargs", [
    (configs.config_1_static_hmc, {"n_chain": 2, "dim": 10}),
    (configs.config_2_nuts_adaptive, {"n_chain": 2}),
    (configs.config_3_riemannian, {"n_chain": 2}),
    (configs.config_4_constrained_torus, {"n_chain": 2}),
    (configs.config_5_massively_parallel, {"n_chain": 8, "dim": 10}),
])
def test_config_runs(make, n_kwargs):
    sampler, init_states, kwargs = make(**n_kwargs)
    out = sampler.sample_chains(
        4, 6, init_states, display_progress=False, **kwargs,
    )
    traces = np.asarray(out.traces["pos"])
    assert traces.shape[:2] == (len(init_states), 6)
    assert np.all(np.isfinite(traces))


def test_torus_constraint_preserved():
    sampler, init_states, kwargs = configs.config_4_constrained_torus(
        n_chain=2)
    out = sampler.sample_chains(
        2, 8, init_states, display_progress=False, **kwargs,
    )
    pos = np.asarray(out.traces["pos"]).reshape(-1, 3)
    x, y, z = pos[:, 0], pos[:, 1], pos[:, 2]
    c = (np.sqrt(x**2 + y**2) - 1.0) ** 2 + z**2 - 0.25
    np.testing.assert_allclose(c, 0.0, atol=1e-5)


def test_headline_harness_smoke():
    """The shared config-3 headline harness (benchmarks/headline.py,
    consumed by bench.py and benchmarks/solver_ab.py) runs end-to-end
    and returns consistent metrics + traces."""
    from benchmarks.headline import run_headline_kernel

    metrics, traces = run_headline_kernel(
        n_chain=4, n_warm=2, n_main=4, chunk=2, max_tree_depth=2,
        extra_stats=("accept_stat", "convergence_error"),
    )
    assert traces.shape == (4, 4, 2)
    assert np.all(np.isfinite(traces))
    assert metrics["ess_total_mean_dim"] > 0
    assert metrics["stats"]["accept_stat"].shape == (4, 4)
    assert 0.0 <= float(np.mean(metrics["stats"]["accept_stat"])) <= 1.0
