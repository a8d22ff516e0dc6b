"""Tests for the batched Pallas linear-algebra kernels.

Run in Pallas interpreter mode on the CPU test backend; the compiled-path
performance comparison versus XLA runs on real TPU via
``scratch``-level benchmarks.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mici_tpu.ops import batched_cholesky, batched_tril_solve

SEED = 90210


@pytest.mark.parametrize("b,n", [(8, 4), (40, 8), (130, 16)])
def test_batched_cholesky(b, n):
    rng = np.random.default_rng(SEED)
    a = rng.standard_normal((b, n, n))
    mats = np.einsum("bij,bkj->bik", a, a) + n * np.eye(n)
    out = np.asarray(batched_cholesky(jnp.asarray(mats), block=128))
    ref = np.linalg.cholesky(mats)
    np.testing.assert_allclose(out, ref, atol=1e-9)
    # strictly lower triangular output
    for i in range(b):
        np.testing.assert_allclose(out[i], np.tril(out[i]))


@pytest.mark.parametrize("b,n", [(8, 4), (40, 8), (130, 16)])
def test_batched_tril_solve(b, n):
    rng = np.random.default_rng(SEED + 1)
    a = rng.standard_normal((b, n, n))
    mats = np.einsum("bij,bkj->bik", a, a) + n * np.eye(n)
    tril = np.linalg.cholesky(mats)
    rhs = rng.standard_normal((b, n))
    out = np.asarray(
        batched_tril_solve(jnp.asarray(tril), jnp.asarray(rhs), block=128))
    ref = np.stack([
        np.linalg.solve(tril[i], rhs[i]) for i in range(b)
    ])
    np.testing.assert_allclose(out, ref, atol=1e-9)


def test_cholesky_solve_roundtrip():
    rng = np.random.default_rng(SEED + 2)
    b, n = 16, 8
    a = rng.standard_normal((b, n, n))
    mats = np.einsum("bij,bkj->bik", a, a) + n * np.eye(n)
    rhs = rng.standard_normal((b, n))
    tril = batched_cholesky(jnp.asarray(mats), block=128)
    y = batched_tril_solve(tril, jnp.asarray(rhs), block=128)
    # second (transposed) solve via numpy oracle completes M^-1 rhs
    x = np.stack([
        np.linalg.solve(np.asarray(tril)[i].T, np.asarray(y)[i])
        for i in range(b)
    ])
    ref = np.stack([np.linalg.solve(mats[i], rhs[i]) for i in range(b)])
    np.testing.assert_allclose(x, ref, atol=1e-8)
