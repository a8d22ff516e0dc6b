"""Tests for convergence diagnostics (ESS, split R-hat)."""

import numpy as np

from mici_tpu.diagnostics import (
    effective_sample_size,
    effective_sample_size_per_dim,
    split_rhat,
)


def _ar1(rho, shape, rng):
    x = np.zeros(shape)
    eps = rng.standard_normal(shape)
    x[:, 0] = eps[:, 0]
    for t in range(1, shape[1]):
        x[:, t] = rho * x[:, t - 1] + np.sqrt(1 - rho**2) * eps[:, t]
    return x


def test_ess_iid():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 4000))
    ess = effective_sample_size(x)
    assert 0.8 * 16000 < ess <= 16000 * 4


def test_ess_ar1():
    rng = np.random.default_rng(1)
    rho = 0.8
    x = _ar1(rho, (4, 4000), rng)
    ess = effective_sample_size(x)
    expected = 16000 * (1 - rho) / (1 + rho)
    assert 0.5 * expected < ess < 2.0 * expected


def test_ess_antithetic_supereff():
    """Negatively autocorrelated chains can have ESS above n."""
    rng = np.random.default_rng(2)
    x = _ar1(-0.5, (2, 2000), rng)
    assert effective_sample_size(x) > 4000


def test_ess_short_chain():
    assert effective_sample_size(np.zeros((2, 3))) == 6.0


def test_ess_per_dim():
    rng = np.random.default_rng(3)
    traces = rng.standard_normal((4, 500, 3))
    ess = effective_sample_size_per_dim(traces)
    assert ess.shape == (3,)
    assert np.all(ess > 500)


def test_split_rhat_converged():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((4, 2000))
    assert abs(split_rhat(x) - 1.0) < 0.02


def test_split_rhat_diverged_chains():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((4, 2000))
    x[0] += 5.0
    assert split_rhat(x) > 1.5


def test_split_rhat_within_chain_drift():
    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 2000)) + np.linspace(0, 5, 2000)
    assert split_rhat(x) > 1.2


def test_summary():
    from mici_tpu.diagnostics import format_summary, summary

    rng = np.random.default_rng(7)
    traces = {
        "pos": rng.standard_normal((4, 500, 3)),
        "hamiltonian": rng.standard_normal((4, 500)),
    }
    rows = summary(traces)
    assert set(rows) == {"pos[0]", "pos[1]", "pos[2]", "hamiltonian"}
    for stats in rows.values():
        assert abs(stats["mean"]) < 0.2
        assert abs(stats["sd"] - 1.0) < 0.1
        assert stats["ess"] > 500
        assert abs(stats["rhat"] - 1.0) < 0.05
    table = format_summary(rows)
    assert "pos[0]" in table and "rhat" in table
    # name filtering
    only = summary(traces, var_names=["hamiltonian"])
    assert set(only) == {"hamiltonian"}
