"""Tests for the batched Pallas linear-algebra kernels.

Run in Pallas interpreter mode on the CPU test backend; the compiled-path
performance comparison versus XLA runs on real TPU via
``scratch``-level benchmarks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mici_tpu.ops import (
    batched_cholesky,
    batched_cholesky_solve,
    batched_tril_solve,
    batched_tril_transpose_solve,
)

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


@pytest.mark.parametrize("b,n", [(8, 4), (40, 8)])
def test_batched_cholesky_grad(b, n):
    """Custom VJP matches autodiff through an explicit lower-read oracle.

    The oracle symmetrizes from the lower triangle before calling
    ``jnp.linalg.cholesky``, making the composite's gradient unique and
    convention-free; the input carries an asymmetric perturbation so the
    lower-triangle-support convention is actually exercised.
    """
    rng = np.random.default_rng(SEED + 3)
    a = rng.standard_normal((b, n, n))
    mats = np.einsum("bij,bkj->bik", a, a) + n * np.eye(n)
    mats = mats + 0.1 * rng.standard_normal((b, n, n))  # asymmetric
    weights = jnp.asarray(rng.standard_normal((b, n, n)))

    def loss_kernel(m):
        return jnp.sum(weights * jnp.sin(batched_cholesky(m, block=128)))

    def loss_oracle(m):
        sym = jnp.tril(m) + jnp.swapaxes(jnp.tril(m, -1), -2, -1)
        return jnp.sum(weights * jnp.sin(jnp.linalg.cholesky(sym)))

    m = jnp.asarray(mats)
    np.testing.assert_allclose(loss_kernel(m), loss_oracle(m), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_kernel)(m)),
        np.asarray(jax.grad(loss_oracle)(m)),
        atol=1e-9,
    )


@pytest.mark.parametrize("b,n", [(8, 4), (40, 8)])
def test_batched_tril_solve_grad(b, n):
    rng = np.random.default_rng(SEED + 4)
    a = rng.standard_normal((b, n, n))
    mats = np.einsum("bij,bkj->bik", a, a) + n * np.eye(n)
    tril = jnp.asarray(
        np.linalg.cholesky(mats) + 0.1 * rng.standard_normal((b, n, n)))
    rhs = jnp.asarray(rng.standard_normal((b, n)))
    weights = jnp.asarray(rng.standard_normal((b, n)))

    def loss_kernel(l, r):
        return jnp.sum(weights * jnp.tanh(batched_tril_solve(
            l, r, block=128)))

    def loss_oracle(l, r):
        sol = jax.lax.linalg.triangular_solve(
            jnp.tril(l), r[..., None], left_side=True, lower=True,
        )[..., 0]
        return jnp.sum(weights * jnp.tanh(sol))

    np.testing.assert_allclose(
        loss_kernel(tril, rhs), loss_oracle(tril, rhs), rtol=1e-10)
    for argnum in (0, 1):
        np.testing.assert_allclose(
            np.asarray(jax.grad(loss_kernel, argnum)(tril, rhs)),
            np.asarray(jax.grad(loss_oracle, argnum)(tril, rhs)),
            atol=1e-9,
            err_msg=f"argnum={argnum}",
        )


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


@pytest.mark.parametrize("b,n", [(8, 4), (40, 8), (130, 16)])
def test_batched_tril_transpose_solve(b, n):
    rng = np.random.default_rng(SEED + 5)
    a = rng.standard_normal((b, n, n))
    mats = np.einsum("bij,bkj->bik", a, a) + n * np.eye(n)
    tril = np.linalg.cholesky(mats)
    rhs = rng.standard_normal((b, n))
    out = np.asarray(batched_tril_transpose_solve(
        jnp.asarray(tril), jnp.asarray(rhs), block=128))
    ref = np.stack([
        np.linalg.solve(tril[i].T, rhs[i]) for i in range(b)
    ])
    np.testing.assert_allclose(out, ref, atol=1e-9)


def test_batched_cholesky_solve():
    rng = np.random.default_rng(SEED + 6)
    b, n = 40, 8
    a = rng.standard_normal((b, n, n))
    mats = np.einsum("bij,bkj->bik", a, a) + n * np.eye(n)
    rhs = rng.standard_normal((b, n))
    tril = batched_cholesky(jnp.asarray(mats), block=128)
    out = np.asarray(batched_cholesky_solve(
        tril, jnp.asarray(rhs), block=128))
    ref = np.stack([np.linalg.solve(mats[i], rhs[i]) for i in range(b)])
    np.testing.assert_allclose(out, ref, atol=1e-8)


def test_batched_cholesky_solve_grad():
    """Gradient of a quadratic form through the full PD solve.

    Oracle: 0.5 b^T M^{-1} b via jnp Cholesky + triangular solves, with
    gradients taken through both the factor and the right-hand side.
    """
    rng = np.random.default_rng(SEED + 7)
    b, n = 8, 4
    a = rng.standard_normal((b, n, n))
    mats = np.einsum("bij,bkj->bik", a, a) + n * np.eye(n)
    tril = jnp.asarray(
        np.linalg.cholesky(mats) + 0.1 * rng.standard_normal((b, n, n)))
    rhs = jnp.asarray(rng.standard_normal((b, n)))

    def loss_kernel(l, r):
        return 0.5 * jnp.sum(r * batched_cholesky_solve(l, r, block=128))

    def loss_oracle(l, r):
        lt = jnp.tril(l)
        half = jax.lax.linalg.triangular_solve(
            lt, r[..., None], left_side=True, lower=True)[..., 0]
        sol = jax.lax.linalg.triangular_solve(
            lt, half[..., None], left_side=True, lower=True,
            transpose_a=True)[..., 0]
        return 0.5 * jnp.sum(r * sol)

    np.testing.assert_allclose(
        loss_kernel(tril, rhs), loss_oracle(tril, rhs), rtol=1e-10)
    for argnum in (0, 1):
        np.testing.assert_allclose(
            np.asarray(jax.grad(loss_kernel, argnum)(tril, rhs)),
            np.asarray(jax.grad(loss_oracle, argnum)(tril, rhs)),
            atol=1e-9,
            err_msg=f"argnum={argnum}",
        )


# ---------------------------------------------------------------------------
# Blocked large-N compositions (lane-kernel panels + MXU matmuls)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("b,n", [(4, 64), (4, 96), (3, 130)])
def test_blocked_cholesky(b, n):
    """Blocked right-looking factorization matches numpy at panel
    multiples and non-multiples (identity-padded tail)."""
    from mici_tpu.ops import blocked_cholesky

    rng = np.random.default_rng(SEED + 11)
    a = rng.standard_normal((b, n, n))
    mats = np.einsum("bij,bkj->bik", a, a) + n * np.eye(n)
    out = np.asarray(blocked_cholesky(jnp.asarray(mats), panel=32))
    ref = np.linalg.cholesky(mats)
    np.testing.assert_allclose(out, ref, atol=1e-8)
    for i in range(b):
        np.testing.assert_allclose(out[i], np.tril(out[i]))


@pytest.mark.parametrize("n", [64, 96, 130])
@pytest.mark.parametrize("transpose", [False, True])
def test_blocked_tril_solves(n, transpose):
    from mici_tpu.ops import (
        blocked_tril_solve,
        blocked_tril_transpose_solve,
    )

    rng = np.random.default_rng(SEED + 12)
    b = 4
    a = rng.standard_normal((b, n, n))
    mats = np.einsum("bij,bkj->bik", a, a) + n * np.eye(n)
    tril = np.linalg.cholesky(mats)
    rhs = rng.standard_normal((b, n))
    fn = blocked_tril_transpose_solve if transpose else blocked_tril_solve
    out = np.asarray(fn(jnp.asarray(tril), jnp.asarray(rhs), panel=32))
    op = (np.swapaxes(tril, -2, -1) if transpose else tril)
    ref = np.stack([np.linalg.solve(op[i], rhs[i]) for i in range(b)])
    np.testing.assert_allclose(out, ref, atol=1e-8)


def test_blocked_cholesky_reverse_grad():
    """Reverse-mode through the blocked composition (lane-kernel adjoint
    + AD-native matmuls/solves) matches a lower-read oracle."""
    from mici_tpu.ops import blocked_cholesky

    rng = np.random.default_rng(SEED + 13)
    b, n = 2, 48
    a = rng.standard_normal((b, n, n))
    mats = jnp.asarray(
        np.einsum("bij,bkj->bik", a, a) + n * np.eye(n)
        + 0.05 * rng.standard_normal((b, n, n)))

    def loss_blocked(m):
        return jnp.sum(jnp.log(jnp.diagonal(
            blocked_cholesky(m, panel=16), axis1=-2, axis2=-1)))

    def loss_oracle(m):
        low = jnp.tril(m)
        sym = low + jnp.swapaxes(low, -2, -1) - jnp.eye(n) * jnp.diagonal(
            m, axis1=-2, axis2=-1)[..., None]
        return jnp.sum(jnp.log(jnp.diagonal(
            jnp.linalg.cholesky(sym), axis1=-2, axis2=-1)))

    np.testing.assert_allclose(
        float(loss_blocked(mats)), float(loss_oracle(mats)), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_blocked)(mats)),
        np.asarray(jax.grad(loss_oracle)(mats)), atol=1e-8)


@pytest.mark.parametrize("b,n", [(4, 64), (3, 96), (3, 80), (2, 200)])
def test_blocked_eigh(b, n):
    """Blocked parallel block-Jacobi eigendecomposition matches numpy at
    pair multiples and non-multiples (Gershgorin-separated padding)."""
    from mici_tpu.ops import blocked_eigh

    rng = np.random.default_rng(SEED + 14)
    a = rng.standard_normal((b, n, n))
    mats = (a + np.swapaxes(a, -2, -1)) / 2
    w, v = blocked_eigh(jnp.asarray(mats))
    w, v = np.asarray(w), np.asarray(v)
    w_ref = np.linalg.eigvalsh(mats)
    scale = np.abs(w_ref).max()
    np.testing.assert_allclose(w, w_ref, atol=1e-6 * scale)
    np.testing.assert_allclose(
        np.einsum("bij,bik->bjk", v, v), np.broadcast_to(np.eye(n), v.shape),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.einsum("bij,bj,bkj->bik", v, w, v), mats, atol=1e-5 * scale,
    )


def test_blocked_eigh_degenerate_and_diagonal():
    """Already-diagonal input and (block-)degenerate spectra stay exact:
    near-identity pivots must not cycle (the sorted-pair schedule)."""
    from mici_tpu.ops import blocked_eigh

    n = 64
    d = np.arange(1.0, n + 1)[::-1].copy()  # descending: forces sorting
    mats = np.stack([np.diag(d), np.eye(n) * 3.0])
    w, v = blocked_eigh(jnp.asarray(mats))
    np.testing.assert_allclose(np.asarray(w)[0], np.sort(d), atol=1e-12)
    np.testing.assert_allclose(np.asarray(w)[1], np.full(n, 3.0),
                               atol=1e-12)
    recon = np.einsum(
        "bij,bj,bkj->bik", np.asarray(v), np.asarray(w), np.asarray(v))
    np.testing.assert_allclose(recon, mats, atol=1e-10)


def test_blocked_eigh_f32_large():
    """f32 accuracy at the dense-SoftAbs target size (N = 128)."""
    from mici_tpu.ops import blocked_eigh

    rng = np.random.default_rng(SEED + 15)
    n = 128
    a = rng.standard_normal((2, n, n)).astype(np.float32)
    mats = (a + np.swapaxes(a, -2, -1)) / 2
    w, v = blocked_eigh(jnp.asarray(mats))
    w_ref = np.linalg.eigvalsh(mats.astype(np.float64))
    scale = np.abs(w_ref).max()
    np.testing.assert_allclose(np.asarray(w), w_ref, atol=3e-5 * scale)
    recon = np.einsum(
        "bij,bj,bkj->bik", np.asarray(v), np.asarray(w), np.asarray(v))
    np.testing.assert_allclose(recon, mats, atol=3e-5 * scale)


@pytest.mark.parametrize("b,n", [(16, 2), (8, 5), (8, 16), (4, 32), (3, 33)])
def test_parallel_jacobi_eigh(b, n):
    """Parallel-order scalar-Jacobi eigh (pure XLA ops) matches numpy at
    even and odd sizes (padded)."""
    from mici_tpu.ops import parallel_jacobi_eigh

    rng = np.random.default_rng(SEED + 24)
    a = rng.standard_normal((b, n, n))
    mats = (a + np.swapaxes(a, -2, -1)) / 2
    w, v = jax.jit(parallel_jacobi_eigh)(jnp.asarray(mats))
    w, v = np.asarray(w), np.asarray(v)
    w_ref = np.linalg.eigvalsh(mats)
    scale = np.abs(w_ref).max()
    np.testing.assert_allclose(w, w_ref, atol=1e-8 * scale)
    np.testing.assert_allclose(
        np.einsum("bij,bik->bjk", v, v), np.broadcast_to(np.eye(n), v.shape),
        atol=1e-8,
    )
    np.testing.assert_allclose(
        np.einsum("bij,bj,bkj->bik", v, w, v), mats, atol=1e-7 * scale,
    )


def test_parallel_jacobi_eigh_f32_and_degenerate():
    """f32 accuracy at the dispatch ceiling size plus exactness on
    already-diagonal and fully degenerate spectra."""
    from mici_tpu.ops import parallel_jacobi_eigh

    rng = np.random.default_rng(SEED + 25)
    n = 32
    a = rng.standard_normal((8, n, n)).astype(np.float32)
    mats = (a + np.swapaxes(a, -2, -1)) / 2
    w, v = parallel_jacobi_eigh(jnp.asarray(mats))
    w_ref = np.linalg.eigvalsh(mats.astype(np.float64))
    scale = np.abs(w_ref).max()
    np.testing.assert_allclose(np.asarray(w), w_ref, atol=3e-5 * scale)
    recon = np.einsum(
        "bij,bj,bkj->bik", np.asarray(v), np.asarray(w), np.asarray(v))
    np.testing.assert_allclose(recon, mats, atol=3e-5 * scale)

    d = np.arange(1.0, n + 1)[::-1].copy()
    special = np.stack([np.diag(d), np.eye(n) * 3.0])
    w, v = parallel_jacobi_eigh(jnp.asarray(special))
    np.testing.assert_allclose(np.asarray(w)[0], np.sort(d), atol=1e-12)
    np.testing.assert_allclose(np.asarray(w)[1], np.full(n, 3.0), atol=1e-12)


@pytest.mark.parametrize("b,n", [(8, 4), (40, 8), (130, 16)])
def test_batched_tril_inverse(b, n):
    from mici_tpu.ops import batched_tril_inverse

    rng = np.random.default_rng(SEED + 16)
    a = rng.standard_normal((b, n, n))
    mats = np.einsum("bij,bkj->bik", a, a) + n * np.eye(n)
    tril = np.linalg.cholesky(mats)
    out = np.asarray(batched_tril_inverse(jnp.asarray(tril), block=128))
    ref = np.stack([np.linalg.inv(tril[i]) for i in range(b)])
    np.testing.assert_allclose(out, ref, atol=1e-9)
    # exactly lower triangular, and the strict upper triangle of the
    # input is ignored
    for i in range(b):
        np.testing.assert_allclose(out[i], np.tril(out[i]))
    junk = tril + np.triu(np.ones((n, n)), k=1) * 7.0
    out_junk = np.asarray(
        batched_tril_inverse(jnp.asarray(junk), block=128))
    np.testing.assert_allclose(out_junk, out)


def test_batched_tril_inverse_grad():
    """Custom VJP matches autodiff through a lower-read solve oracle."""
    from mici_tpu.ops import batched_tril_inverse

    b, n = 6, 5
    rng = np.random.default_rng(SEED + 17)
    a = rng.standard_normal((b, n, n))
    mats = np.einsum("bij,bkj->bik", a, a) + n * np.eye(n)
    tril = jnp.asarray(np.linalg.cholesky(mats))
    w = jnp.arange(1.0, n * n + 1).reshape(n, n)

    def loss_kernel(l):
        return jnp.sum(batched_tril_inverse(l) ** 2 * w)

    def loss_oracle(l):
        eye = jnp.broadcast_to(jnp.eye(n, dtype=l.dtype), l.shape)
        x = jax.scipy.linalg.solve_triangular(jnp.tril(l), eye, lower=True)
        return jnp.sum(x**2 * w)

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_kernel)(tril)),
        np.asarray(jax.grad(loss_oracle)(tril)), atol=1e-8)


@pytest.mark.parametrize("b,n", [(3, 64), (3, 80), (2, 200)])
def test_blocked_tril_inverse(b, n):
    """Blocked inversion matches numpy at panel multiples and
    non-multiples (identity-padded tail)."""
    from mici_tpu.ops import blocked_tril_inverse

    rng = np.random.default_rng(SEED + 18)
    a = rng.standard_normal((b, n, n))
    mats = np.einsum("bij,bkj->bik", a, a) + n * np.eye(n)
    tril = np.linalg.cholesky(mats)
    out = np.asarray(blocked_tril_inverse(jnp.asarray(tril)))
    ref = np.stack([np.linalg.inv(tril[i]) for i in range(b)])
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out, ref, atol=1e-9 * max(scale, 1.0))
    for i in range(b):
        np.testing.assert_allclose(out[i], np.tril(out[i]))
