"""Tests for log-space utilities and stagers.

Mirrors reference tests/test_utils.py and tests/test_stagers.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mici_tpu import stagers, utils


def test_log1p_exp():
    for v in [-30.0, -1.0, 0.0, 1.0, 30.0]:
        np.testing.assert_allclose(
            utils.log1p_exp(v), np.log1p(np.exp(np.float64(v))),
            rtol=1e-10)


def test_log1m_exp():
    for v in [-30.0, -2.0, -0.5, -1e-3]:
        np.testing.assert_allclose(
            utils.log1m_exp(v), np.log(-np.expm1(np.float64(v))),
            rtol=1e-6, atol=1e-15)


def test_log_sum_exp():
    np.testing.assert_allclose(
        utils.log_sum_exp(1.0, 2.0), np.logaddexp(1.0, 2.0), rtol=1e-10)


def test_log_diff_exp():
    np.testing.assert_allclose(
        utils.log_diff_exp(2.0, 1.0),
        np.log(np.exp(2.0) - np.exp(1.0)), rtol=1e-10)


def test_log_rep_float():
    a = utils.LogRepFloat(2.0)
    b = utils.LogRepFloat(3.0)
    np.testing.assert_allclose((a + b).val, 5.0, rtol=1e-10)
    np.testing.assert_allclose((b - a).val, 1.0, rtol=1e-10)
    np.testing.assert_allclose((a * b).val, 6.0, rtol=1e-10)
    np.testing.assert_allclose((b / a).val, 1.5, rtol=1e-10)
    assert a < b
    assert b > a
    assert utils.LogRepFloat(0.0).val == 0.0
    with pytest.raises(ValueError):
        utils.LogRepFloat(-1.0)
    with pytest.raises(ValueError):
        utils.LogRepFloat(1.0, log_val=0.0)


def test_hash_array():
    a = np.arange(10.0)
    assert utils.hash_array(a) == utils.hash_array(a.copy())
    assert utils.hash_array(a) != utils.hash_array(a + 1)


class _Fast:
    is_fast = True


class _Slow:
    is_fast = False


def test_warm_up_stager():
    stages = stagers.WarmUpStager().stages(
        100, 200, {"t": [_Fast()]}, (lambda s: {},))
    assert list(stages) == ["Adaptive warm up", "Main non-adaptive"]
    assert stages["Adaptive warm up"].n_iter == 100
    assert stages["Main non-adaptive"].n_iter == 200
    assert stages["Adaptive warm up"].trace_funcs is None
    assert stages["Main non-adaptive"].record_stats


def test_warm_up_stager_trace_warm_up():
    tf = (lambda s: {},)
    stages = stagers.WarmUpStager().stages(
        50, 60, {"t": [_Fast()]}, tf, trace_warm_up=True)
    assert stages["Adaptive warm up"].trace_funcs == tf
    assert stages["Adaptive warm up"].record_stats


def test_windowed_stager_totals():
    adapters = {"t": [_Fast(), _Slow()]}
    for n_warm_up in [30, 120, 500, 1000]:
        stages = stagers.WindowedWarmUpStager().stages(
            n_warm_up, 100, adapters, None)
        warm_iters = sum(
            s.n_iter for label, s in stages.items()
            if label != "Main non-adaptive")
        assert warm_iters == n_warm_up
        # fast-only stages exclude slow adapters
        assert all(
            a.is_fast
            for a in stages["Initial fast adaptive"].adapters["t"])
        slow_stage = next(
            s for label, s in stages.items() if "Slow" in label)
        assert len(slow_stage.adapters["t"]) == 2


def test_windowed_stager_window_doubling():
    stages = stagers.WindowedWarmUpStager().stages(
        1000, 0, {"t": [_Slow()]}, None)
    slow_iters = [
        s.n_iter for label, s in stages.items() if "Slow" in label]
    # windows should grow (geometrically until the tail)
    assert all(b >= a for a, b in zip(slow_iters[:-2], slow_iters[1:-1]))
