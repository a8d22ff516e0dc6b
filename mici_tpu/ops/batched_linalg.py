"""Batch-in-lanes Pallas kernels: batched Cholesky and triangular solve.

The per-chain metric matrices in this framework are small (tens of rows)
but numerous (1024+ chains).  General-purpose factorization kernels
parallelize *within* one matrix — useless at n = 32.  These kernels instead
map the **batch** dimension onto the TPU lane axis: every step of the
Cholesky-Crout / forward-substitution recurrence is an elementwise VPU op
over a 128-lane-aligned block of chains, giving ~full vector utilization
for thousands of tiny factorizations.

Layout: inputs (B, N, N) are transposed to (N, N, B) so the batch is the
minor (lane) axis; the grid tiles the batch.  The recurrences unroll over
the static matrix size N.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BATCH_BLOCK = 256
# Pallas double-buffers both input and output blocks, so ~4x the block
# size must fit in the ~16 MB VMEM; keep a single block under 3 MB.
_VMEM_BUDGET_BYTES = 3 * 1024 * 1024


def _auto_block(n, itemsize, requested):
    """Lane-axis block sized so ~2 matrix blocks fit the VMEM budget."""
    per_lane = n * n * itemsize
    block = max(128, min(requested, _VMEM_BUDGET_BYTES // max(per_lane, 1)))
    return (block // 128) * 128 or 128


def _on_tpu():
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:  # pragma: no cover - no devices
        return False


def _cholesky_kernel(n, a_ref, l_ref):
    # Cholesky-Crout with the batch in the lane axis; refs are (N, N, Bc).
    for j in range(n):
        if j == 0:
            d = a_ref[0, 0, :]
        else:
            lrow = l_ref[j, 0:j, :]
            d = a_ref[j, j, :] - jnp.sum(lrow * lrow, axis=0)
        ljj = jnp.sqrt(d)
        l_ref[j, j, :] = ljj
        if j + 1 < n:
            if j == 0:
                s = a_ref[1:, 0, :]
            else:
                s = a_ref[j + 1:, j, :] - jnp.sum(
                    l_ref[j + 1:, 0:j, :] * l_ref[j, 0:j, :][None, :, :],
                    axis=1,
                )
            l_ref[j + 1:, j, :] = s / ljj[None, :]
            l_ref[j, j + 1:, :] = jnp.zeros_like(l_ref[j, j + 1:, :])


def _tril_solve_kernel(n, l_ref, b_ref, x_ref):
    # Forward substitution solving L x = b; refs (N, N, Bc) / (N, Bc).
    for i in range(n):
        if i == 0:
            s = b_ref[0, :]
        else:
            s = b_ref[i, :] - jnp.sum(
                l_ref[i, 0:i, :] * x_ref[0:i, :], axis=0,
            )
        x_ref[i, :] = s / l_ref[i, i, :]


def _trilt_solve_kernel(n, l_ref, b_ref, x_ref):
    # Back substitution solving L^T x = b; row i of L^T is column i of L
    # below the diagonal, so the recurrence reads l_ref[i+1:, i, :].
    for i in reversed(range(n)):
        if i == n - 1:
            s = b_ref[n - 1, :]
        else:
            s = b_ref[i, :] - jnp.sum(
                l_ref[i + 1:, i, :] * x_ref[i + 1:, :], axis=0,
            )
        x_ref[i, :] = s / l_ref[i, i, :]


def _pad_batch(x, block):
    b = x.shape[-1]
    pad = (-b) % block
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    return x, b


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def _batched_cholesky_lanes(mats_lanes, block=_BATCH_BLOCK,
                            interpret=False):
    """Cholesky of (N, N, B) batch-minor matrices."""
    n = mats_lanes.shape[0]
    block = _auto_block(n, mats_lanes.dtype.itemsize, block)
    padded, b = _pad_batch(mats_lanes, block)
    grid = (padded.shape[-1] // block,)
    out = pl.pallas_call(
        functools.partial(_cholesky_kernel, n),
        out_shape=jax.ShapeDtypeStruct(padded.shape, padded.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((n, n, block), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n, n, block), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(padded)
    return out[..., :b]


@functools.partial(
    jax.jit, static_argnames=("block", "interpret", "transpose"))
def _batched_tril_solve_lanes(tril_lanes, rhs_lanes, block=_BATCH_BLOCK,
                              interpret=False, transpose=False):
    n = tril_lanes.shape[0]
    block = _auto_block(n, tril_lanes.dtype.itemsize, block)
    tril_padded, b = _pad_batch(tril_lanes, block)
    rhs_padded, _ = _pad_batch(rhs_lanes, block)
    # avoid 0/0 in padded lanes
    eye = jnp.eye(n, dtype=tril_padded.dtype)[..., None]
    pad_width = tril_padded.shape[-1] - b
    if pad_width:
        mask = jnp.concatenate([
            jnp.zeros((1, 1, b), tril_padded.dtype),
            jnp.ones((1, 1, pad_width), tril_padded.dtype),
        ], axis=-1)
        tril_padded = tril_padded + eye * mask
    grid = (tril_padded.shape[-1] // block,)
    kernel = _trilt_solve_kernel if transpose else _tril_solve_kernel
    out = pl.pallas_call(
        functools.partial(kernel, n),
        out_shape=jax.ShapeDtypeStruct(rhs_padded.shape, rhs_padded.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, n, block), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(tril_padded, rhs_padded)
    return out[..., :b]


def _transpose(m):
    return jnp.swapaxes(m, -2, -1)


def _phi(m):
    """Lower triangle of ``m`` with the diagonal halved (batched)."""
    n = m.shape[-1]
    diag = jnp.diagonal(m, axis1=-2, axis2=-1)
    return jnp.tril(m) - 0.5 * jnp.eye(n, dtype=m.dtype) * diag[..., None]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _cholesky_diff(mats, block, interpret):
    lanes = jnp.moveaxis(mats, 0, -1)  # (N, N, B)
    out = _batched_cholesky_lanes(lanes, block=block, interpret=interpret)
    return jnp.moveaxis(out, -1, 0)


def _cholesky_fwd(mats, block, interpret):
    factor = _cholesky_diff(mats, block, interpret)
    return factor, factor


def _cholesky_bwd(block, interpret, factor, factor_bar):
    # Reverse-mode Cholesky differential: with sigma_bar =
    # L^{-T} phi(L^T L_bar) L^{-1}, the adjoint with respect to a matrix
    # whose *lower triangle only* is read (the kernel's semantics) is
    # tril(sigma_bar + sigma_bar^T) with the diagonal counted once.
    p = _phi(jnp.matmul(_transpose(factor), factor_bar))
    w = jax.lax.linalg.triangular_solve(
        factor, p, left_side=True, lower=True, transpose_a=True,
    )
    sigma_bar = jax.lax.linalg.triangular_solve(
        factor, w, left_side=False, lower=True,
    )
    n = factor.shape[-1]
    diag = jnp.diagonal(sigma_bar, axis1=-2, axis2=-1)
    a_bar = (
        jnp.tril(sigma_bar + _transpose(sigma_bar))
        - jnp.eye(n, dtype=factor.dtype) * diag[..., None]
    )
    return (a_bar,)


_cholesky_diff.defvjp(_cholesky_fwd, _cholesky_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _tril_solve_diff(tril, rhs, block, interpret):
    tril_lanes = jnp.moveaxis(tril, 0, -1)
    rhs_lanes = jnp.moveaxis(rhs, 0, -1)
    out = _batched_tril_solve_lanes(
        tril_lanes, rhs_lanes, block=block, interpret=interpret,
    )
    return jnp.moveaxis(out, -1, 0)


def _tril_solve_fwd(tril, rhs, block, interpret):
    sol = _tril_solve_diff(tril, rhs, block, interpret)
    return sol, (tril, sol)


def _tril_solve_bwd(block, interpret, res, sol_bar):
    # x = L^{-1} b: rhs_bar = L^{-T} x_bar, L_bar = -tril(rhs_bar x^T)
    # (upper entries of L are never read by the kernel, so their adjoint
    # is zero).
    tril, sol = res
    rhs_bar = jax.lax.linalg.triangular_solve(
        tril, sol_bar[..., None], left_side=True, lower=True,
        transpose_a=True,
    )[..., 0]
    tril_bar = -jnp.tril(rhs_bar[..., :, None] * sol[..., None, :])
    return tril_bar, rhs_bar


_tril_solve_diff.defvjp(_tril_solve_fwd, _tril_solve_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _trilt_solve_diff(tril, rhs, block, interpret):
    tril_lanes = jnp.moveaxis(tril, 0, -1)
    rhs_lanes = jnp.moveaxis(rhs, 0, -1)
    out = _batched_tril_solve_lanes(
        tril_lanes, rhs_lanes, block=block, interpret=interpret,
        transpose=True,
    )
    return jnp.moveaxis(out, -1, 0)


def _trilt_solve_fwd(tril, rhs, block, interpret):
    sol = _trilt_solve_diff(tril, rhs, block, interpret)
    return sol, (tril, sol)


def _trilt_solve_bwd(block, interpret, res, sol_bar):
    # x = L^{-T} b: rhs_bar = L^{-1} x_bar, L_bar = -tril(x rhs_bar^T).
    tril, sol = res
    rhs_bar = jax.lax.linalg.triangular_solve(
        tril, sol_bar[..., None], left_side=True, lower=True,
    )[..., 0]
    tril_bar = -jnp.tril(sol[..., :, None] * rhs_bar[..., None, :])
    return tril_bar, rhs_bar


_trilt_solve_diff.defvjp(_trilt_solve_fwd, _trilt_solve_bwd)


def batched_cholesky(mats, *, block=_BATCH_BLOCK, interpret=None):
    """Cholesky factors of a batch of SPD matrices, batch-in-lanes kernel.

    Reverse-mode differentiable via a closed-form adjoint (batched MXU
    matmuls + XLA triangular solves); forward-mode (jvp) is not defined.
    Only the lower triangle of each input matrix is read, matching
    ``jnp.linalg.cholesky`` semantics — the gradient is supported on the
    lower triangle accordingly.

    Args:
        mats: Array of shape (B, N, N) of symmetric positive definite
            matrices.
        block: Batch block per grid step (lane-axis tile).
        interpret: Force Pallas interpreter mode (defaults to automatic:
            compiled on TPU, interpreted elsewhere).

    Returns:
        Lower-triangular factors, shape (B, N, N).
    """
    if interpret is None:
        interpret = not _on_tpu()
    return _cholesky_diff(mats, block, interpret)


def batched_tril_solve(tril, rhs, *, block=_BATCH_BLOCK, interpret=None):
    """Solve ``L x = b`` for a batch of lower-triangular systems.

    Reverse-mode differentiable (closed-form adjoint); forward-mode (jvp)
    is not defined.  Only the lower triangle of ``tril`` is read.

    Args:
        tril: Array (B, N, N) of lower-triangular matrices.
        rhs: Array (B, N) of right-hand sides.
        block: Batch block per grid step.
        interpret: Force Pallas interpreter mode.

    Returns:
        Solutions, shape (B, N).
    """
    if interpret is None:
        interpret = not _on_tpu()
    return _tril_solve_diff(tril, rhs, block, interpret)


def batched_tril_transpose_solve(tril, rhs, *, block=_BATCH_BLOCK,
                                 interpret=None):
    """Solve ``L^T x = b`` (back substitution) for a batch of systems.

    Reverse-mode differentiable (closed-form adjoint); forward-mode (jvp)
    is not defined.  Only the lower triangle of ``tril`` is read.

    Args:
        tril: Array (B, N, N) of lower-triangular matrices.
        rhs: Array (B, N) of right-hand sides.
        block: Batch block per grid step.
        interpret: Force Pallas interpreter mode.

    Returns:
        Solutions, shape (B, N).
    """
    if interpret is None:
        interpret = not _on_tpu()
    return _trilt_solve_diff(tril, rhs, block, interpret)


def batched_cholesky_solve(tril, rhs, *, block=_BATCH_BLOCK,
                           interpret=None):
    """Solve ``(L L^T) x = b`` given Cholesky factors, batch-in-lanes.

    Composition of the forward and transposed triangular-solve kernels;
    reverse-mode differentiable through both.

    Args:
        tril: Array (B, N, N) of lower-triangular Cholesky factors.
        rhs: Array (B, N) of right-hand sides.
        block: Batch block per grid step.
        interpret: Force Pallas interpreter mode.

    Returns:
        Solutions ``(L L^T)^{-1} b``, shape (B, N).
    """
    half = batched_tril_solve(tril, rhs, block=block, interpret=interpret)
    return batched_tril_transpose_solve(
        tril, half, block=block, interpret=interpret,
    )


# Measured on TPU v5 lite (f32, mean over 50 calls, 2026-08-16):
#   batched_cholesky vs jnp.linalg.cholesky:
#     B=1024 N=16: 1.19 ms vs 2.56 ms   (2.2x)
#     B=1024 N=32: 1.67 ms vs 4.73 ms   (2.8x)
#     B=1024 N=64: 1.31 ms vs 7.97 ms   (6.1x)
#     B=4096 N=32: 1.07 ms vs 14.95 ms  (14.0x)
#   batched_tril_solve is within ~30% of XLA's solve_triangular either way.
#   batched_cholesky_solve vs jax.scipy.linalg.cho_solve (two launches vs
#   XLA's fused pair, so it only wins once the batch amortizes them):
#     B=1024 N=16: 1.70 ms vs 1.10 ms  (0.6x)
#     B=1024 N=32: 1.27 ms vs 1.21 ms  (1.0x)
#     B=4096 N=32: 0.80 ms vs 1.22 ms  (1.5x)


# ---------------------------------------------------------------------------
# Batched symmetric eigendecomposition (cyclic Jacobi, batch in lanes)
# ---------------------------------------------------------------------------

#: Fixed sweep counts: cyclic Jacobi converges quadratically, reaching f32
#: machine precision in ~log2(n)+3 sweeps for well-scaled inputs.
def _jacobi_sweeps(n):
    return 6 if n <= 8 else (8 if n <= 16 else 10)


def _jacobi_eigh_kernel(n, n_sweeps, a_ref, w_ref, v_ref):
    # Cyclic Jacobi with the batch in the lane axis; refs (N, N, Bc) /
    # (N, Bc) / (N, N, Bc).  Rotation pairs unroll (static p, q); sweeps
    # run in a fori_loop so the kernel body stays one-sweep-sized.
    a0 = a_ref[...]
    bc = a0.shape[-1]
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    ).astype(a0.dtype)
    v0 = jnp.broadcast_to(eye[:, :, None], (n, n, bc))

    def sweep(_, carry):
        a, v = carry
        for p in range(n - 1):
            for q in range(p + 1, n):
                apq = a[p, q, :]
                theta = 0.5 * jnp.arctan2(
                    2.0 * apq, a[p, p, :] - a[q, q, :],
                )
                c, s = jnp.cos(theta), jnp.sin(theta)
                row_p = c * a[p, :, :] + s * a[q, :, :]
                row_q = -s * a[p, :, :] + c * a[q, :, :]
                a = a.at[p, :, :].set(row_p).at[q, :, :].set(row_q)
                col_p = c * a[:, p, :] + s * a[:, q, :]
                col_q = -s * a[:, p, :] + c * a[:, q, :]
                a = a.at[:, p, :].set(col_p).at[:, q, :].set(col_q)
                vcol_p = c * v[:, p, :] + s * v[:, q, :]
                vcol_q = -s * v[:, p, :] + c * v[:, q, :]
                v = v.at[:, p, :].set(vcol_p).at[:, q, :].set(vcol_q)
        return a, v

    a, v = jax.lax.fori_loop(0, n_sweeps, sweep, (a0, v0))
    w_ref[...] = jnp.stack([a[i, i, :] for i in range(n)])
    v_ref[...] = v


@functools.partial(
    jax.jit, static_argnames=("n_sweeps", "block", "interpret"))
def _batched_jacobi_eigh_lanes(mats_lanes, n_sweeps, block=_BATCH_BLOCK,
                               interpret=False):
    """Jacobi eigendecomposition of (N, N, B) batch-minor matrices."""
    n = mats_lanes.shape[0]
    # two (N, N, block) buffers + one (N, block) live per grid step
    block = _auto_block(n, 2 * mats_lanes.dtype.itemsize, block)
    padded, b = _pad_batch(mats_lanes, block)
    grid = (padded.shape[-1] // block,)
    w, v = pl.pallas_call(
        functools.partial(_jacobi_eigh_kernel, n, n_sweeps),
        out_shape=(
            jax.ShapeDtypeStruct((n, padded.shape[-1]), padded.dtype),
            jax.ShapeDtypeStruct(padded.shape, padded.dtype),
        ),
        grid=grid,
        in_specs=[pl.BlockSpec((n, n, block), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((n, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n, block), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(padded)
    return w[..., :b], v[..., :b]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _eigh_diff(mats, n_sweeps, block, interpret):
    lanes = jnp.moveaxis(mats, 0, -1)  # (N, N, B)
    w, v = _batched_jacobi_eigh_lanes(
        lanes, n_sweeps, block=block, interpret=interpret,
    )
    w = jnp.moveaxis(w, -1, 0)   # (B, N)
    v = jnp.moveaxis(v, -1, 0)   # (B, N, N)
    order = jnp.argsort(w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    v = jnp.take_along_axis(v, order[:, None, :], axis=-1)
    return w, v


def _eigh_fwd(mats, n_sweeps, block, interpret):
    w, v = _eigh_diff(mats, n_sweeps, block, interpret)
    return (w, v), (w, v)


def _eigh_bwd(n_sweeps, block, interpret, res, bars):
    # Standard symmetric-eigendecomposition adjoint:
    #   A_bar = V (diag(w_bar) + F o (V^T V_bar)) V^T,  F_ij = 1/(w_j-w_i)
    # symmetrized (the kernel reads a symmetric input).  Degenerate pairs
    # get F=0 (their rotation direction is arbitrary; same guard as the
    # SoftAbs J-matrix in matrices.py).
    w, v = res
    w_bar, v_bar = bars
    diff = w[..., None, :] - w[..., :, None]
    eps = jnp.finfo(w.dtype).eps * jnp.maximum(
        1.0, jnp.max(jnp.abs(w), axis=-1))[..., None, None]
    f = jnp.where(jnp.abs(diff) > eps, 1.0 / jnp.where(diff == 0, 1, diff),
                  0.0)
    vt_vbar = jnp.matmul(jnp.swapaxes(v, -2, -1), v_bar)
    inner = f * vt_vbar
    n = w.shape[-1]
    inner = inner + jnp.eye(n, dtype=w.dtype) * w_bar[..., None, :]
    a_bar = jnp.matmul(v, jnp.matmul(inner, jnp.swapaxes(v, -2, -1)))
    return ((a_bar + jnp.swapaxes(a_bar, -2, -1)) / 2,)


_eigh_diff.defvjp(_eigh_fwd, _eigh_bwd)


def batched_eigh(mats, *, n_sweeps=None, block=_BATCH_BLOCK,
                 interpret=None):
    """Eigendecomposition of a batch of small symmetric matrices.

    Fixed-sweep cyclic Jacobi with the batch in the TPU lane axis — the
    same layout as :func:`batched_cholesky` — replacing XLA's iterative
    QDWH ``eigh`` whose control-flow graphs blow up compile time inside
    nested ``while_loop``s (the SoftAbs metric rebuild in implicit
    integrators; see docs/BENCHMARKS.md "Compile-time engineering").
    Extends the unrolled single-matrix Jacobi in
    ``matrices.symmetric_eigendecomposition`` (n <= 8) to moderate sizes.

    Reverse-mode differentiable with the standard symmetric-eigh adjoint
    (degenerate eigenvalue pairs contribute zero rotation gradient);
    forward-mode is not defined.

    Args:
        mats: Array (B, N, N) of symmetric matrices (lower+upper read).
        n_sweeps: Jacobi sweep count (default: size-based schedule
            reaching f32 machine precision).
        block: Batch block per grid step.
        interpret: Force Pallas interpreter mode.

    Returns:
        Tuple ``(eigenvalues, eigenvectors)`` of shapes (B, N) ascending
        and (B, N, N) with eigenvectors as columns.
    """
    if interpret is None:
        interpret = not _on_tpu()
    n = mats.shape[-1]
    if n_sweeps is None:
        n_sweeps = _jacobi_sweeps(n)
    return _eigh_diff(mats, int(n_sweeps), block, interpret)


# ---------------------------------------------------------------------------
# Blocked large-N batched Cholesky / triangular solves
# ---------------------------------------------------------------------------

#: Panel width for the blocked algorithms.  The lane kernels need
#: ~4 x 128 lanes x panel^2 x 4 B of VMEM (double-buffered in + out), so
#: 64 is the largest power-of-two panel that fits the 16 MB budget.
_BLOCK_PANEL = 64


def _pad_spd(mats, pad):
    """Extend a (B, N, N) SPD batch to N+pad with an identity block."""
    if not pad:
        return mats
    mats = jnp.pad(mats, ((0, 0), (0, pad), (0, pad)))
    n = mats.shape[-1]
    eye_tail = jnp.zeros((n,), mats.dtype).at[n - pad:].set(1.0)
    return mats + jnp.eye(n, dtype=mats.dtype) * eye_tail


def blocked_cholesky(mats, *, panel=_BLOCK_PANEL, interpret=None):
    """Blocked right-looking batched Cholesky for moderate-to-large N.

    The lane kernels (:func:`batched_cholesky`) map the *batch* onto the
    TPU lane axis and are VMEM-bound above N = 64; XLA's native batched
    Cholesky parallelizes within one matrix and only becomes efficient
    at N >= ~1024.  In between — exactly the dense-metric Riemannian
    regime (SURVEY §2.2 "TPU mapping") — this blocked composition wins:
    the O(N^3) panel solves and trailing (Schur-complement) updates run
    as plain batched MXU matmuls, and only the O(N * panel^2) diagonal
    blocks use the lane recurrence kernel.  Measured on-chip: 3.3x XLA's
    batched Cholesky at (B=256, N=256), 1.5x at (B=64, N=512); XLA wins
    again by N=1024 at small batch (docs/BENCHMARKS.md round-4), hence
    the dispatch cutoffs in :mod:`mici_tpu.ops.dispatch`.

    Reverse-mode differentiable (the lane kernel's closed-form adjoint
    composes with AD-native matmuls/solves); forward-mode is not defined
    here — the dispatch-level :func:`mici_tpu.ops.dispatch.cholesky`
    wraps every path in a closed-form ``custom_jvp``, which is how the
    sampler differentiates through it.

    Args:
        mats: Array (B, N, N) of SPD matrices (lower triangle read).
        panel: Panel width (multiple-of-8 sublane tile; default 64).
        interpret: Force Pallas interpreter mode for the diagonal-block
            kernel (defaults to automatic).

    Returns:
        Lower-triangular factors, shape (B, N, N).
    """
    b, n, _ = mats.shape
    pad = (-n) % panel
    a = _pad_spd(mats, pad)
    n_pad = n + pad
    k_panels = n_pad // panel
    factor = jnp.zeros_like(a)
    for k in range(k_panels):
        s = k * panel
        e = s + panel
        diag_block = batched_cholesky(
            a[:, s:e, s:e], interpret=interpret,
        )
        factor = factor.at[:, s:e, s:e].set(diag_block)
        if e < n_pad:
            # Panel solve: L[e:, s:e] = A[e:, s:e] (L_kk^T)^-1 — a
            # batched triangular solve with panel-many right-hand sides,
            # lowered onto the MXU.
            panel_block = jax.lax.linalg.triangular_solve(
                diag_block, a[:, e:, s:e],
                left_side=False, lower=True, transpose_a=True,
            )
            factor = factor.at[:, e:, s:e].set(panel_block)
            # Trailing Schur update: one batched matmul per panel.
            a = a.at[:, e:, e:].add(
                -jnp.matmul(panel_block, _transpose(panel_block)),
            )
    return factor[:, :n, :n]


def _pad_tril(tril, rhs, pad):
    if not pad:
        return tril, rhs
    tril = jnp.pad(tril, ((0, 0), (0, pad), (0, pad)))
    n = tril.shape[-1]
    eye_tail = jnp.zeros((n,), tril.dtype).at[n - pad:].set(1.0)
    tril = tril + jnp.eye(n, dtype=tril.dtype) * eye_tail
    rhs = jnp.pad(rhs, ((0, 0), (0, pad)))
    return tril, rhs


def blocked_tril_solve(tril, rhs, *, panel=_BLOCK_PANEL, interpret=None):
    """Blocked forward substitution ``L x = b`` for moderate-to-large N.

    Panel corrections are batched matvecs (MXU); only the panel-diagonal
    substitutions use the lane kernel.  Same regime and differentiation
    notes as :func:`blocked_cholesky`.

    Args:
        tril: Array (B, N, N) of lower-triangular matrices.
        rhs: Array (B, N) of right-hand sides.
        panel: Panel width.
        interpret: Force Pallas interpreter mode.

    Returns:
        Solutions, shape (B, N).
    """
    b, n = rhs.shape
    pad = (-n) % panel
    tril_p, rhs_p = _pad_tril(tril, rhs, pad)
    k_panels = (n + pad) // panel
    sol = jnp.zeros_like(rhs_p)
    for k in range(k_panels):
        s = k * panel
        e = s + panel
        bk = rhs_p[:, s:e]
        if k:
            bk = bk - jnp.einsum(
                "bij,bj->bi", tril_p[:, s:e, :s], sol[:, :s],
            )
        xk = batched_tril_solve(
            tril_p[:, s:e, s:e], bk, interpret=interpret,
        )
        sol = sol.at[:, s:e].set(xk)
    return sol[:, :n]


def blocked_tril_transpose_solve(tril, rhs, *, panel=_BLOCK_PANEL,
                                 interpret=None):
    """Blocked back substitution ``L^T x = b`` for moderate-to-large N.

    Args:
        tril: Array (B, N, N) of lower-triangular matrices.
        rhs: Array (B, N) of right-hand sides.
        panel: Panel width.
        interpret: Force Pallas interpreter mode.

    Returns:
        Solutions, shape (B, N).
    """
    b, n = rhs.shape
    pad = (-n) % panel
    tril_p, rhs_p = _pad_tril(tril, rhs, pad)
    n_pad = n + pad
    k_panels = n_pad // panel
    sol = jnp.zeros_like(rhs_p)
    for k in reversed(range(k_panels)):
        s = k * panel
        e = s + panel
        bk = rhs_p[:, s:e]
        if e < n_pad:
            # Row block i of L^T is the transposed column block of L
            # below the diagonal: correction = L[e:, s:e]^T x[e:].
            bk = bk - jnp.einsum(
                "bji,bj->bi", tril_p[:, e:, s:e], sol[:, e:],
            )
        xk = batched_tril_transpose_solve(
            tril_p[:, s:e, s:e], bk, interpret=interpret,
        )
        sol = sol.at[:, s:e].set(xk)
    return sol[:, :n]
