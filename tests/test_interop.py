"""Tests for external-library interop (gated on optional dependencies).

Mirrors reference test strategy (mici tests/test_interop.py): gate on
availability and otherwise verify clean failure modes.  The ArviZ version
gating and conversion preprocessing are additionally tested against fake
arviz modules, and the Stan bridge end-to-end against a fake
bridgestan-style model (the `pure_callback` machinery runs for real).
"""

import sys
import types

import jax
import jax.numpy as jnp
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


def _traces_and_stats():
    traces = {
        "pos": np.zeros((2, 10, 3)),
        "hamiltonian": np.zeros((2, 10)),
    }
    stats = {"accept_stat": np.ones((2, 10)), "n_step": np.ones((2, 10))}
    return traces, stats


@pytest.mark.skipif(not ARVIZ_AVAILABLE, reason="arviz not installed")
def test_convert_to_inference_data():
    traces, stats = _traces_and_stats()
    idata = interop.convert_to_inference_data(traces, stats)
    assert "posterior" in idata.groups()
    assert idata.posterior["pos"].shape == (2, 10, 3)


@pytest.mark.skipif(ARVIZ_AVAILABLE, reason="arviz installed")
def test_convert_without_arviz_raises_import_error():
    with pytest.raises(ImportError, match="arviz"):
        interop.convert_to_inference_data({}, {})
    with pytest.raises(ImportError, match="arviz"):
        interop.convert_to_data_tree({}, {})


class _FakeArviz(types.ModuleType):
    def __init__(self, version):
        super().__init__("arviz")
        self.__version__ = version
        self.calls = []

    def from_dict(self, *args, **kwargs):
        self.calls.append((args, kwargs))
        return ("fake-result", args, kwargs)


@pytest.fixture
def fake_arviz(monkeypatch):
    def install(version):
        mod = _FakeArviz(version)
        monkeypatch.setitem(sys.modules, "arviz", mod)
        return mod

    return install


def test_inference_data_rejected_on_arviz_v1(fake_arviz):
    """InferenceData was removed in ArviZ 1.0 (mici/interop.py:88-91)."""
    fake_arviz("1.2.0")
    traces, stats = _traces_and_stats()
    with pytest.raises(RuntimeError, match="DataTree"):
        interop.convert_to_inference_data(traces, stats)


def test_data_tree_rejected_on_old_arviz(fake_arviz):
    fake_arviz("0.17.0")
    traces, stats = _traces_and_stats()
    with pytest.raises(RuntimeError, match="ArviZ v1.0"):
        interop.convert_to_data_tree(traces, stats)


def test_data_tree_conversion_payload(fake_arviz):
    """DataTree conversion builds a real grouped payload with the ArviZ
    statistic-name schema (mici/interop.py:30-45, :99-143)."""
    mod = fake_arviz("1.0.0")
    traces, stats = _traces_and_stats()
    interop.convert_to_data_tree(traces, stats)
    ((args, _kwargs),) = [(c[0], c[1]) for c in mod.calls]
    payload = args[0]
    assert set(payload) == {"posterior", "sample_stats"}
    assert payload["posterior"]["pos"].shape == (2, 10, 3)
    sample_stats = payload["sample_stats"]
    # n_step -> n_steps, accept_stat -> acceptance_rate, energy lifted
    # from the hamiltonian trace
    assert "n_steps" in sample_stats and "n_step" not in sample_stats
    assert ("acceptance_rate" in sample_stats
            and "accept_stat" not in sample_stats)
    assert sample_stats["energy"].shape == (2, 10)


def test_inference_data_conversion_payload(fake_arviz):
    mod = fake_arviz("0.16.1")
    traces, stats = _traces_and_stats()
    interop.convert_to_inference_data(traces, stats)
    ((_args, kwargs),) = [(c[0], c[1]) for c in mod.calls]
    assert kwargs["posterior"]["pos"].shape == (2, 10, 3)
    assert "acceptance_rate" in kwargs["sample_stats"]


def test_preprocess_accepts_per_chain_lists():
    """Reference trace format (list of per-chain arrays) is stacked."""
    stacked = interop._stack_arrays(
        {"pos": [np.zeros((10, 3)), np.zeros((10, 3))]},
    )
    assert stacked["pos"].shape == (2, 10, 3)


def test_convert_to_arviz_dict_layout():
    """The dependency-free export produces the exact arviz.from_dict
    layout (reference schema mici/interop.py:54-96) without arviz."""
    traces, stats = _traces_and_stats()
    groups = interop.convert_to_arviz_dict(traces, stats)
    assert set(groups) == {"posterior", "sample_stats"}
    posterior, sample_stats = groups["posterior"], groups["sample_stats"]
    assert posterior["pos"].shape == (2, 10, 3)
    assert posterior["hamiltonian"].shape == (2, 10)
    assert isinstance(posterior["pos"], np.ndarray)
    assert "n_steps" in sample_stats and "n_step" not in sample_stats
    assert ("acceptance_rate" in sample_stats
            and "accept_stat" not in sample_stats)
    np.testing.assert_array_equal(
        sample_stats["energy"], traces["hamiltonian"],
    )
    # Inputs are not mutated.
    assert "n_step" in stats and "accept_stat" in stats


def test_convert_to_arviz_dict_key_options():
    traces, stats = _traces_and_stats()
    traces["log_dens"] = np.zeros((2, 10))
    groups = interop.convert_to_arviz_dict(
        traces, stats, energy_key=None, lp_key="log_dens",
    )
    assert "energy" not in groups["sample_stats"]
    np.testing.assert_array_equal(
        groups["sample_stats"]["lp"], traces["log_dens"],
    )


def test_convert_to_arviz_dict_per_chain_lists():
    """Reference-native per-chain list format converts identically."""
    traces = {"pos": [np.arange(6.0).reshape(3, 2),
                      np.arange(6.0).reshape(3, 2) + 1]}
    stats = {"accept_stat": [np.ones(3), np.ones(3)],
             "n_step": [np.full(3, 2), np.full(3, 2)]}
    groups = interop.convert_to_arviz_dict(traces, stats)
    assert groups["posterior"]["pos"].shape == (2, 3, 2)
    assert groups["sample_stats"]["n_steps"].shape == (2, 3)


def test_outputs_to_arviz_dict_end_to_end():
    """HMCSampleChainsOutputs.to_arviz_dict on a real sampler run."""
    import jax.numpy as jnp

    from mici_tpu import integrators, samplers, systems

    system = systems.EuclideanMetricSystem(lambda q: 0.5 * jnp.sum(q**2))
    integ = integrators.LeapfrogIntegrator(system, step_size=0.5)
    sampler = samplers.StaticMetropolisHMC(system, integ, 42, n_step=4)
    out = sampler.sample_chains(
        3, 5, [np.ones(2), -np.ones(2)], display_progress=False,
    )
    groups = out.to_arviz_dict()
    assert groups["posterior"]["pos"].shape == (2, 5, 2)
    assert groups["sample_stats"]["energy"].shape == (2, 5)
    assert groups["sample_stats"]["acceptance_rate"].shape == (2, 5)


@pytest.mark.skipif(PYMC_AVAILABLE, reason="pymc installed")
def test_pymc_bridge_without_pymc_raises_import_error():
    with pytest.raises(ImportError):
        interop.sample_pymc_model(draws=10)


def test_pymc_invalid_init_rejected(monkeypatch):
    """init validation happens for any model (mici/interop.py:303-308)."""
    fake_pm = types.ModuleType("pymc")
    fake_pm.modelcontext = lambda model: model
    monkeypatch.setitem(sys.modules, "pymc", fake_pm)
    with pytest.raises(ValueError, match="init must be"):
        interop.sample_pymc_model(draws=10, model=object(), init="bogus")


@pytest.mark.skipif(not PYMC_AVAILABLE, reason="pymc not installed")
def test_sample_pymc_model():
    import pymc as pm

    with pm.Model() as model:
        pm.Normal("x", 0.0, 1.0)
    out = interop.sample_pymc_model(
        draws=10, tune=10, chains=2, model=model, progressbar=False,
    )
    assert out["x"].shape[:2] == (2, 10)


class _FakeBridgeStanModel:
    """Minimal bridgestan-like model: standard normal in 2D with a
    constraining transform (exp) on the second parameter."""

    def param_unc_num(self):
        return 2

    def param_num(self):
        return 2

    def log_density_gradient(self, q):
        return -0.5 * float(q @ q), -np.asarray(q)

    def param_constrain(self, q):
        return np.array([q[0], np.exp(q[1])])


def test_sample_stan_model_with_bridgestan_interface():
    out = interop.sample_stan_model(
        _FakeBridgeStanModel(), num_samples=10, num_warmup=10,
        num_chains=2, seed=3, display_progress=False,
    )
    assert out["pos"].shape == (2, 10, 2)
    assert np.all(np.isfinite(out["pos"]))
    # constrained parameters traced via param_constrain
    assert out["params"].shape == (2, 10, 2)
    np.testing.assert_allclose(
        out["params"][..., 1], np.exp(out["pos"][..., 1]), rtol=1e-10,
    )
    # lp traced
    np.testing.assert_allclose(
        out["lp"], -0.5 * np.sum(out["pos"] ** 2, axis=-1), rtol=1e-10,
    )


def test_sample_stan_model_cmdstan_argument_surface():
    """The CmdStan adaptation arguments are honoured: dense metric +
    custom windowed schedule + save_warmup."""
    out = interop.sample_stan_model(
        _FakeBridgeStanModel(), num_samples=5, num_warmup=40,
        num_chains=2, seed=4, metric="dense_e", save_warmup=True,
        init_buffer=10, term_buffer=10, window=5, delta=0.9,
        display_progress=False,
    )
    # warm-up draws recorded too
    assert out["pos"].shape == (2, 45, 2)


def test_sample_stan_model_adapt_disengaged():
    out = interop.sample_stan_model(
        _FakeBridgeStanModel(), num_samples=5, num_warmup=5,
        num_chains=2, seed=5, adapt_engaged=False, stepsize=0.5,
        display_progress=False,
    )
    assert out["pos"].shape == (2, 5, 2)


def test_sample_stan_model_invalid_metric():
    with pytest.raises(ValueError, match="metric"):
        interop.sample_stan_model(
            _FakeBridgeStanModel(), metric="sparse_e",
        )


# ---------------------------------------------------------------------------
# External-API conformance contract (pinned fake surface)
# ---------------------------------------------------------------------------

# Recorded checksum of mici_tpu.interop.EXTERNAL_API_CONTRACT: any contract
# change must be a conscious edit updating this value (and docs/PARITY.md).
CONTRACT_CHECKSUM = (
    "2f8f253cf0189610fd64c53c03f338d201a49b7d61c5d6b1f3e8397776462795"
)


def test_external_api_contract_checksum_recorded():
    assert interop.external_api_contract_checksum() == CONTRACT_CHECKSUM


def test_fake_bridgestan_model_covers_contract():
    """The fake used for end-to-end Stan-bridge tests implements the full
    pinned bridgestan model surface, so passing against the fake means
    exercising every upstream call site."""
    model_api = interop.EXTERNAL_API_CONTRACT["bridgestan"]["model_api"]
    fake = _FakeBridgeStanModel()
    for method in model_api:
        assert callable(getattr(fake, method)), method


@pytest.mark.parametrize(
    "package", ["arviz", "pymc", "bridgestan", "torch"],
)
def test_contract_resolves_on_real_package(package):
    """When an optional package is installed, every dotted attribute path
    the bridges consume must resolve on it — the executable half of the
    pinned-contract guarantee (VERDICT round-2 item 5)."""
    mod = pytest.importorskip(package)
    if package == "pymc":
        # the jax translation layer is a submodule not imported by default
        pytest.importorskip("pymc.sampling.jax")
    for path in interop.EXTERNAL_API_CONTRACT[package]["api"]:
        obj = mod
        for part in path.split("."):
            obj = getattr(obj, part)


# ---------------------------------------------------------------------------
# Dependency-free bridge cores (round-5 thinning of the real-library
# adapters: these run with no external package installed)
# ---------------------------------------------------------------------------


def test_split_flat_vector_blocks():
    entries = [("a", (2, 2), 4), ("b", (), 1), ("c", (3,), 3)]
    pos = jnp.arange(8.0)
    parts = interop.split_flat_vector(pos, entries)
    np.testing.assert_array_equal(
        np.asarray(parts[0]), [[0.0, 1.0], [2.0, 3.0]],
    )
    assert np.asarray(parts[1]).shape == ()
    assert float(parts[1]) == 4.0
    np.testing.assert_array_equal(np.asarray(parts[2]), [5.0, 6.0, 7.0])


def test_make_callback_grad_neg_log_dens_roundtrip():
    """The shared pure_callback wrapper evaluates a host density inside
    jit / vmap / as a gradient source with correct values."""
    dim = 3
    scale = np.array([1.0, 2.0, 3.0])
    dtype = np.dtype(jnp.result_type(float))

    def host_val_and_grad(q):
        q = np.asarray(q, np.float64)
        val = 0.5 * np.sum((q / scale) ** 2)
        return np.asarray(val, dtype), np.asarray(q / scale**2, dtype)

    nld, grad_nld = interop.make_callback_grad_neg_log_dens(
        host_val_and_grad, dim,
    )
    q = jnp.asarray([1.0, 2.0, 3.0])
    expected_val = 0.5 * np.sum((np.asarray(q) / scale) ** 2)
    assert np.allclose(float(jax.jit(nld)(q)), expected_val)
    grad, val = jax.jit(grad_nld)(q)
    assert np.allclose(float(val), expected_val)
    np.testing.assert_allclose(
        np.asarray(grad), np.asarray(q) / scale**2, rtol=1e-6,
    )
    # vmapped chains serialize through the callback
    batch = jnp.stack([q, 2 * q])
    vals = jax.jit(jax.vmap(nld))(batch)
    assert vals.shape == (2,)
    assert np.allclose(float(vals[1]), 4 * expected_val)


def test_resolve_pymc_init_strategies():
    assert interop.resolve_pymc_init("auto") == (False, True)
    assert interop.resolve_pymc_init("adapt_diag") == (False, False)
    assert interop.resolve_pymc_init("jitter+adapt_full") == (True, True)
    assert interop.resolve_pymc_init("adapt_full") == (True, False)
    with pytest.raises(ValueError, match="init must be"):
        interop.resolve_pymc_init("advi")


def test_jittered_init_states_retries_until_finite():
    """Draws are retried per chain until the density is finite, consuming
    the generator draw by draw (reference: mici/interop.py:325-335)."""
    mean = np.zeros(2)
    calls = []

    def neg_log_dens(q):
        # Finite only when the first coordinate is positive.
        calls.append(np.array(q))
        return 0.0 if q[0] > 0 else np.inf

    rng = np.random.default_rng(3)
    states = interop.jittered_init_states(
        mean, 4, neg_log_dens, rng, jitter_max_retries=50,
    )
    assert len(states) == 4
    for pos in states:
        assert np.isfinite(neg_log_dens(pos))
        assert np.all(np.abs(pos - mean) <= 1.0)
    # Retries actually happened (some draws were rejected).
    assert len(calls) > 4


def test_jittered_init_states_keeps_last_draw_on_exhaustion():
    mean = np.zeros(1)

    def never_finite(q):
        return np.inf

    rng = np.random.default_rng(0)
    states = interop.jittered_init_states(
        mean, 2, never_finite, rng, jitter_max_retries=3,
    )
    assert len(states) == 2  # fallback: last draw kept, no raise


def test_resolve_stan_adaptation_mapping():
    from mici_tpu import adapters as _adapters
    from mici_tpu import stagers as _stagers

    adapters_list, stager = interop.resolve_stan_adaptation(
        "dense_e", True, delta=0.9, gamma=0.02, kappa=0.7, t0=5,
        init_buffer=10, term_buffer=20, window=8,
    )
    assert isinstance(
        adapters_list[0], _adapters.DualAveragingStepSizeAdapter,
    )
    assert adapters_list[0].adapt_stat_target == 0.9
    assert isinstance(
        adapters_list[1], _adapters.OnlineCovarianceMetricAdapter,
    )
    assert isinstance(stager, _stagers.WindowedWarmUpStager)
    assert stager.n_init_fast_stage_iter == 10
    assert stager.n_final_fast_stage_iter == 20
    assert stager.n_init_slow_window_iter == 8

    adapters_list, stager = interop.resolve_stan_adaptation("diag_e", True)
    assert isinstance(
        adapters_list[1], _adapters.OnlineVarianceMetricAdapter,
    )
    adapters_list, stager = interop.resolve_stan_adaptation("unit_e", True)
    assert len(adapters_list) == 1
    assert isinstance(stager, _stagers.WarmUpStager)

    assert interop.resolve_stan_adaptation("diag_e", False) == (None, None)
    with pytest.raises(ValueError, match="metric"):
        interop.resolve_stan_adaptation("sparse_e", True)
