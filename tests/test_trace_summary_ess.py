"""Tests for the streaming on-device batch-means ESS estimator.

TPU-native addition (no reference counterpart — the reference computes
ESS from stored traces via arviz): `sample_chains(trace_summary_ess=M)`
threads batch-means accumulators through the compiled stage programs so
effective sample size is measured with zero trace storage or
device->host trace streaming (motivated by the round-4 finding that the
dev tunnel's trace streaming dominates end-to-end walls).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mici_tpu import integrators, samplers, systems
from mici_tpu.samplers import (
    _finalize_trace_summary,
    _init_trace_summary,
    _update_trace_summary,
)


def _stream(xs, ess_batch):
    """Run a (n_chain, n_iter, ...) array through the streaming update."""
    n_chain = xs.shape[0]
    example = {"x": np.zeros(xs.shape[2:], np.float64)}
    state = _init_trace_summary(example, n_chain, (), ess_batch)
    state = jax.tree_util.tree_map(jnp.asarray, state)

    def body(s, x):
        return jax.vmap(
            lambda sc, xc: _update_trace_summary(sc, {"x": xc}, (),
                                                 ess_batch),
        )(s, x), None

    state, _ = jax.lax.scan(body, state, jnp.moveaxis(
        jnp.asarray(xs), 1, 0))
    return _finalize_trace_summary(state, (), ess_batch)["x"]


def _batch_means_ess_numpy(xs, m):
    """Oracle: the same estimator computed directly from the full trace."""
    n_chain, n = xs.shape[:2]
    n_b = n // m
    used = xs[:, :n_b * m]
    bm = used.reshape(n_chain, n_b, m, *xs.shape[2:]).mean(axis=2)
    var_x = xs.var(axis=1, ddof=1)
    var_bm = bm.var(axis=1, ddof=1)
    tau = m * var_bm / var_x
    return (n_b * m) / tau


def test_streaming_matches_direct_batch_means():
    """The streaming accumulator reproduces the direct batch-means
    computation from the full trace (same estimator, no approximation
    beyond float associativity)."""
    rng = np.random.default_rng(11)
    xs = rng.standard_normal((3, 200, 2))
    out = _stream(xs, ess_batch=10)
    np.testing.assert_allclose(
        out["ess"], _batch_means_ess_numpy(xs, 10), rtol=1e-8,
    )
    assert out["ess_batch_len"] == 10
    # moments unchanged by the ESS extension
    np.testing.assert_allclose(out["mean"], xs.mean(axis=1), rtol=1e-10)
    np.testing.assert_allclose(
        out["var"], xs.var(axis=1, ddof=1), rtol=1e-8)


def test_iid_and_ar1_calibration():
    """ESS ~= n for iid draws; ESS ~= n (1-rho)/(1+rho) for AR(1)."""
    rng = np.random.default_rng(12)
    n = 20_000
    iid = rng.standard_normal((2, n))
    ess_iid = _stream(iid[..., None], ess_batch=100)["ess"][..., 0]
    np.testing.assert_allclose(ess_iid, n, rtol=0.35)

    rho = 0.8
    eps = rng.standard_normal((2, n))
    ar = np.empty_like(eps)
    ar[:, 0] = eps[:, 0]
    for t in range(1, n):
        ar[:, t] = rho * ar[:, t - 1] + np.sqrt(1 - rho**2) * eps[:, t]
    # tau = (1+rho)/(1-rho) = 9
    ess_ar = _stream(ar[..., None], ess_batch=500)["ess"][..., 0]
    np.testing.assert_allclose(ess_ar, n / 9, rtol=0.5)
    assert np.all(ess_ar < 0.4 * n)


def test_too_few_batches_is_nan():
    rng = np.random.default_rng(13)
    xs = rng.standard_normal((2, 15, 1))
    out = _stream(xs, ess_batch=10)  # only one completed batch
    assert np.all(np.isnan(out["ess"]))


def test_sample_chains_end_to_end_summary_only():
    """trace_summary_ess through the driver with zero trace storage:
    the streaming ESS equals the direct batch-means estimate computed
    from an identical run's full traces."""
    system = systems.EuclideanMetricSystem(
        lambda q: 0.5 * jnp.sum(q**2))
    integ = integrators.LeapfrogIntegrator(system, step_size=0.6)
    m = 8

    def run(**kw):
        sampler = samplers.StaticMetropolisHMC(
            system, integ, 99, n_step=3)
        return sampler.sample_chains(
            5, 64, [np.ones(2), -np.ones(2), np.zeros(2) + 0.5],
            display_progress=False, **kw,
        )

    with_traces = run(trace_summary_ess=m)
    summary_only = run(trace_summary="only", trace_summary_ess=m)

    pos = np.asarray(with_traces.traces["pos"])
    direct = _batch_means_ess_numpy(pos, m)
    for out in (with_traces, summary_only):
        ess = out.trace_summaries["pos"]["ess"]
        np.testing.assert_allclose(ess, direct, rtol=1e-5)
    assert summary_only.traces is None


def test_invalid_batch_length_rejected():
    system = systems.EuclideanMetricSystem(
        lambda q: 0.5 * jnp.sum(q**2))
    integ = integrators.LeapfrogIntegrator(system, step_size=0.5)
    sampler = samplers.StaticMetropolisHMC(system, integ, 1, n_step=2)
    with pytest.raises(ValueError, match="batch length"):
        sampler.sample_chains(
            1, 2, [np.zeros(2)], trace_summary_ess=1,
            display_progress=False,
        )