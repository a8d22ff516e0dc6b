"""P² streaming quantile sketch tests (mici_tpu/sketches.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mici_tpu import sketches

QUANTILES = (0.05, 0.5, 0.95)


def _run_stream(data, quantiles=QUANTILES):
    state = sketches.p2_init(data.shape[1:], quantiles, data.dtype)
    upd = jax.jit(lambda s, x: sketches.p2_update(s, x, quantiles))
    for row in data:
        state = upd(state, jnp.asarray(row))
    return sketches.p2_estimate(jax.device_get(state), quantiles)


def test_p2_tracks_normal_quantiles_batched():
    rng = np.random.default_rng(0)
    scales = np.array([1.0, 5.0, 0.1])
    shifts = np.array([0.0, 2.0, -1.0])
    data = rng.standard_normal((4000, 3)) * scales + shifts
    est = _run_stream(data)
    true = np.quantile(data, QUANTILES, axis=0).T
    err = np.abs(est - true) / scales[:, None]
    assert np.all(err < 0.06), err


def test_p2_heavy_tailed_median():
    rng = np.random.default_rng(1)
    data = rng.standard_cauchy((6000, 1))
    est = _run_stream(data, (0.5,))
    true = np.quantile(data[:, 0], 0.5)
    assert abs(est[0, 0] - true) < 0.1


def test_p2_warm_phase_exact():
    data = np.array([[3.0], [1.0], [2.0]])
    est = _run_stream(data)
    np.testing.assert_allclose(
        est[0], np.quantile([1.0, 2.0, 3.0], QUANTILES),
    )


def test_p2_empty_is_nan():
    state = sketches.p2_init((2,), QUANTILES, np.float64)
    est = sketches.p2_estimate(state, QUANTILES)
    assert np.all(np.isnan(est))


def test_p2_exact_at_five_observations():
    data = np.arange(5.0)[:, None]
    est = _run_stream(data, (0.5,))
    # five sorted markers: the middle marker is the exact median
    assert est[0, 0] == 2.0


@pytest.mark.parametrize("n", [1, 4, 5, 6, 50])
def test_p2_count_tracks_stream_length(n):
    rng = np.random.default_rng(2)
    data = rng.standard_normal((n, 2))
    quantiles = (0.5,)
    state = sketches.p2_init((2,), quantiles, np.float64)
    upd = jax.jit(lambda s, x: sketches.p2_update(s, x, quantiles))
    for row in data:
        state = upd(state, jnp.asarray(row))
    np.testing.assert_array_equal(np.asarray(state["count"]), n)
