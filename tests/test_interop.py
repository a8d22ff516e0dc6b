"""Tests for external-library interop (gated on optional dependencies).

Mirrors reference test strategy (mici tests/test_interop.py): gate on
availability and otherwise verify clean failure modes.
"""

import numpy as np
import pytest

from mici_tpu import interop

try:
    import arviz  # noqa: F401

    ARVIZ_AVAILABLE = True
except ImportError:
    ARVIZ_AVAILABLE = False

try:
    import pymc  # noqa: F401

    PYMC_AVAILABLE = True
except ImportError:
    PYMC_AVAILABLE = False


@pytest.mark.skipif(not ARVIZ_AVAILABLE, reason="arviz not installed")
def test_convert_to_inference_data():
    traces = {
        "pos": np.zeros((2, 10, 3)),
        "hamiltonian": np.zeros((2, 10)),
    }
    stats = {"accept_stat": np.ones((2, 10)), "n_step": np.ones((2, 10))}
    idata = interop.convert_to_inference_data(traces, stats)
    assert "posterior" in idata.groups()
    assert idata.posterior["pos"].shape == (2, 10, 3)


@pytest.mark.skipif(ARVIZ_AVAILABLE, reason="arviz installed")
def test_convert_without_arviz_raises_import_error():
    with pytest.raises(ImportError, match="arviz"):
        interop.convert_to_inference_data({}, {})


@pytest.mark.skipif(PYMC_AVAILABLE, reason="pymc installed")
def test_pymc_bridge_without_pymc_raises_import_error():
    with pytest.raises(ImportError):
        interop.sample_pymc_model(None)


@pytest.mark.skipif(not PYMC_AVAILABLE, reason="pymc not installed")
def test_sample_pymc_model():
    import pymc as pm

    with pm.Model() as model:
        pm.Normal("x", 0.0, 1.0)
    out = interop.sample_pymc_model(
        model, draws=10, tune=10, chains=2, progressbar=False,
    )
    assert out.traces["pos"].shape[0] == 2


class _FakeBridgeStanModel:
    """Minimal bridgestan-like model: standard normal in 2D."""

    def param_unc_num(self):
        return 2

    def log_density_gradient(self, q):
        return -0.5 * float(q @ q), -np.asarray(q)


def test_sample_stan_model_with_bridgestan_interface():
    out = interop.sample_stan_model(
        _FakeBridgeStanModel(), num_samples=10, num_warmup=10,
        num_chains=2, seed=3, display_progress=False,
    )
    assert out.traces["pos"].shape == (2, 10, 2)
    assert np.all(np.isfinite(out.traces["pos"]))
