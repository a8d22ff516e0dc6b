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


def _jacobi_eigh_kernel(n, n_sweeps, a_ref, w_ref, v_ref, a_s):
    # Cyclic Jacobi with the batch in the lane axis; refs (N, N, Bc) /
    # (N, Bc) / (N, N, Bc) + an (N, N, Bc) VMEM scratch holding the
    # working matrix.  Rotation pairs unroll (static p, q); sweeps run
    # in a fori_loop so the kernel body stays one-sweep-sized.  All
    # row/column updates are static-index *ref* stores — value-level
    # ``.at[].set`` lowers to scatter, which Mosaic TC kernels do not
    # support (the Cholesky kernels above use the same store style).
    bc = a_ref.shape[-1]
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    ).astype(a_ref.dtype)
    a_s[...] = a_ref[...]
    v_ref[...] = jnp.broadcast_to(eye[:, :, None], (n, n, bc))

    def sweep(_, carry):
        for p in range(n - 1):
            for q in range(p + 1, n):
                apq = a_s[p, q, :]
                # Rotation angle theta = atan2(2 a_pq, a_pp - a_qq) / 2,
                # computed without atan2/cos/sin (unsupported in Mosaic
                # lowering): with y = 2 a_pq, x = a_pp - a_qq and
                # r = hypot(x, y), the well-conditioned half-angle
                # tangent is t = y / (r + x) for x >= 0 and
                # t = (r - x) / y otherwise; then c = 1 / sqrt(1 + t^2),
                # s = t c.  y == 0 means nothing to annihilate: identity.
                y = 2.0 * apq
                x = a_s[p, p, :] - a_s[q, q, :]
                r = jnp.sqrt(x * x + y * y)
                nonzero = y != 0.0
                safe_y = jnp.where(nonzero, y, 1.0)
                t = jnp.where(
                    x >= 0.0,
                    safe_y / jnp.where(r + x > 0.0, r + x, 1.0),
                    (r - x) / safe_y,
                )
                t = jnp.where(nonzero, t, 0.0)
                c = 1.0 / jnp.sqrt(1.0 + t * t)
                s = t * c
                row_p = c * a_s[p, :, :] + s * a_s[q, :, :]
                row_q = -s * a_s[p, :, :] + c * a_s[q, :, :]
                a_s[p, :, :] = row_p
                a_s[q, :, :] = row_q
                col_p = c * a_s[:, p, :] + s * a_s[:, q, :]
                col_q = -s * a_s[:, p, :] + c * a_s[:, q, :]
                a_s[:, p, :] = col_p
                a_s[:, q, :] = col_q
                vcol_p = c * v_ref[:, p, :] + s * v_ref[:, q, :]
                vcol_q = -s * v_ref[:, p, :] + c * v_ref[:, q, :]
                v_ref[:, p, :] = vcol_p
                v_ref[:, q, :] = vcol_q
        return carry

    jax.lax.fori_loop(0, n_sweeps, sweep, 0)
    w_ref[...] = jnp.stack([a_s[i, i, :] for i in range(n)])


@functools.partial(
    jax.jit, static_argnames=("n_sweeps", "block", "interpret"))
def _batched_jacobi_eigh_lanes(mats_lanes, n_sweeps, block=_BATCH_BLOCK,
                               interpret=False):
    """Jacobi eigendecomposition of (N, N, B) batch-minor matrices."""
    n = mats_lanes.shape[0]
    # three (N, N, block) buffers (in + vectors out + scratch) plus one
    # (N, block) live per grid step
    block = _auto_block(n, 3 * mats_lanes.dtype.itemsize, block)
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
        scratch_shapes=[pltpu.VMEM((n, n, block), padded.dtype)],
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

# ---------------------------------------------------------------------------
# Small-N batched symmetric eigendecomposition in plain XLA ops
# (parallel-order scalar Jacobi)
# ---------------------------------------------------------------------------

#: Sweep ceiling for the parallel-order scalar Jacobi (converges
#: quadratically; the off-diagonal criterion exits earlier in practice).
_PARALLEL_EIGH_MAX_SWEEPS = 14


def parallel_jacobi_eigh(mats, *, max_sweeps=_PARALLEL_EIGH_MAX_SWEEPS):
    """Batched symmetric eigendecomposition for small N in pure XLA ops.

    Parallel-order (round-robin) **scalar** Jacobi: each of the ``n - 1``
    rounds of a sweep pairs all ``n`` indices into ``n / 2`` disjoint
    (p, q) pivots, annihilates every ``a_pq`` simultaneously with 2x2
    rotations, and applies them as one block-diagonal rotation matrix
    ``R`` per round — ``A <- R^T A R`` and ``V <- V R`` are plain batched
    (N, N) matmuls.  Sweeps repeat under a ``while_loop`` with the same
    scale-free off-diagonal stopping rule as :func:`blocked_eigh`.

    This exists because both alternatives have pathological *compile*
    cost on TPU at these shapes: XLA's QDWH ``eigh`` blows up compile
    time inside nested ``while_loop``s (docs/BENCHMARKS.md round-1
    "Compile-time engineering"), and the Pallas lane-kernel
    :func:`batched_eigh` statically unrolls n(n-1)/2 rotation pairs in
    its sweep body — measured **>9.5 minutes of Mosaic backend compile
    at n = 32** on the current toolchain (round-4's unattributed 197.5 s
    compile was this kernel at a smaller n).  The round body here traces
    ~20 elementwise ops + 3 matmuls once, so the whole program compiles
    in seconds; runtime stays MXU-friendly (three N^3 matmuls per
    round).

    Args:
        mats: Array (B, N, N) of symmetric matrices, N >= 2 (both
            triangles read; symmetrized internally per sweep).
        max_sweeps: Sweep ceiling for the convergence loop.

    Returns:
        Tuple ``(eigenvalues, eigenvectors)`` of shapes (B, N) ascending
        and (B, N, N) with eigenvectors as columns.  Not differentiable
        itself; :func:`mici_tpu.ops.dispatch.eigh` wraps every path in
        the closed-form symmetric-eigh ``custom_jvp``.
    """
    import numpy as np

    b_sz, n_in, _ = mats.shape
    dtype = mats.dtype
    pad = n_in % 2
    a0 = _pad_symmetric_separated(mats, pad)
    n = n_in + pad
    k = n // 2
    # Element-level round-robin pairing = the block schedule at half=1.
    perms_np, invs_np = _block_jacobi_schedule(n, 1)
    perms, invs = jnp.asarray(perms_np), jnp.asarray(invs_np)
    eps = jnp.finfo(dtype).eps
    norm0 = jnp.maximum(
        jnp.sqrt(jnp.sum(jnp.square(a0), axis=(-2, -1))), eps)
    eye = jnp.eye(n, dtype=dtype)
    # Static masks placing the per-pair sines at (2i, 2i+1) / (2i+1, 2i).
    rows = np.arange(n)
    up_mask = jnp.asarray(
        (rows[:, None] + 1 == rows[None, :]) & (rows[:, None] % 2 == 0),
        dtype,
    )
    dn_mask = jnp.swapaxes(up_mask, -2, -1)

    def _off_frac(a):
        off = a * (1.0 - eye)
        return jnp.max(
            jnp.sqrt(jnp.sum(jnp.square(off), axis=(-2, -1))) / norm0)

    def _round(r, carry):
        a, v = carry
        perm = perms[r]
        inv = invs[r]
        ap = jnp.take(jnp.take(a, perm, axis=1), perm, axis=2)
        diag = jnp.diagonal(ap, axis1=-2, axis2=-1)          # (B, n)
        app, aqq = diag[:, 0::2], diag[:, 1::2]              # (B, k)
        apq = jnp.diagonal(ap[:, 0::2, 1::2], axis1=-2, axis2=-1)
        # Half-angle-tangent rotation (same well-conditioned form as the
        # lane kernel): t = y/(r+x) for x >= 0 else (r-x)/y, with
        # y = 2 a_pq, x = a_pp - a_qq; y == 0 -> identity rotation.
        y = 2.0 * apq
        x = app - aqq
        r_hyp = jnp.sqrt(x * x + y * y)
        nonzero = y != 0.0
        safe_y = jnp.where(nonzero, y, 1.0)
        t = jnp.where(
            x >= 0.0,
            safe_y / jnp.where(r_hyp + x > 0.0, r_hyp + x, 1.0),
            (r_hyp - x) / safe_y,
        )
        t = jnp.where(nonzero, t, 0.0)
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        s = t * c
        c_full = jnp.repeat(c, 2, axis=-1)                   # (B, n)
        s_full = jnp.repeat(s, 2, axis=-1)
        # R = blockdiag([[c, -s], [s, c]]) in the permuted layout: the
        # 2x2 *eigenvector* matrix of each pivot (columns), so the
        # two-sided update below is A <- R^T A R (annihilating a_pq)
        # and eigenvectors accumulate as V <- V R.
        rot = (eye * c_full[:, None, :]
               - up_mask * s_full[:, None, :]
               + dn_mask * s_full[:, None, :])
        ap = jnp.einsum("bji,bjk,bkl->bil", rot, ap, rot)
        a = jnp.take(jnp.take(ap, inv, axis=1), inv, axis=2)
        vp = jnp.take(v, perm, axis=2)
        v = jnp.take(jnp.matmul(vp, rot), inv, axis=2)
        return a, v

    def _sweep(carry):
        a, v, sweep = carry
        a, v = jax.lax.fori_loop(0, n - 1, _round, (a, v))
        a = (a + jnp.swapaxes(a, -2, -1)) / 2
        return a, v, sweep + 1

    def _continue(carry):
        a, _, sweep = carry
        return jnp.logical_and(sweep < max_sweeps, _off_frac(a) > 30 * eps)

    v0 = jnp.broadcast_to(eye, a0.shape)
    # Rotation applications must accumulate in full f32: at the TPU
    # default (bf16 MXU passes) the accumulated rotation error destroys
    # the decomposition (measured ~1e0 eigenvalue error at N=256 vs
    # ~2e-4 at full precision), independent of the engine-wide policy.
    with jax.default_matmul_precision("highest"):
        a, v, _ = jax.lax.while_loop(
            _continue, _sweep, (a0, v0, jnp.asarray(0, jnp.int32)))

    w = jnp.diagonal(a, axis1=-2, axis2=-1)
    order = jnp.argsort(w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    v = jnp.take_along_axis(v, order[:, None, :], axis=-1)
    if pad:
        w = w[:, :n_in]
        v = v[:, :n_in, :n_in]
    return w, v


# ---------------------------------------------------------------------------
# Blocked large-N batched symmetric eigendecomposition (parallel block
# Jacobi)
# ---------------------------------------------------------------------------

#: Half-pair width for the blocked Jacobi: pivot subproblems are
#: ``2 * _EIGH_PAIR_HALF`` = 32-wide, exactly the lane-kernel eigh ceiling
#: (:data:`mici_tpu.ops.dispatch._MAX_EIGH_KERNEL_N`).
_EIGH_PAIR_HALF = 16

#: Fixed ceiling on block-Jacobi sweeps; the loop exits early on an
#: off-diagonal-norm criterion (block Jacobi converges quadratically once
#: the off-diagonal mass is small, like the scalar method).
_BLOCKED_EIGH_MAX_SWEEPS = 14


@functools.cache
def _block_jacobi_schedule(n, half):
    """Element-permutation tables for one round-robin block-Jacobi sweep.

    Partition ``n`` (a multiple of ``2 * half``) into ``m = n // half``
    blocks and pair them with the standard circle (round-robin
    tournament) method: ``m - 1`` rounds, each pairing all ``m`` blocks
    into ``m / 2`` disjoint pivot pairs, so one sweep visits every
    off-diagonal block pair exactly once.  Returns ``(perm, inv)`` int32
    arrays of shape ``(m - 1, n)``: ``perm[r]`` reorders elements so the
    round-``r`` pivot subproblems are the consecutive ``2 * half``-wide
    diagonal blocks of ``A[perm][:, perm]``; ``inv[r]`` undoes it.

    Returns **host numpy** arrays on purpose: the result is memoized
    across calls, and caching ``jnp`` arrays here would capture
    trace-local constants from the first jit trace and leak them into
    later traces (``UnexpectedTracerError``).  Callers convert with
    ``jnp.asarray`` inside their own trace.
    """
    import numpy as np

    m = n // half
    others = list(range(1, m))
    perms = np.empty((m - 1, n), dtype=np.int32)
    for r in range(m - 1):
        ring = [0, *others]
        order = []
        for i in range(m // 2):
            p, q = ring[i], ring[m - 1 - i]
            # Each pair MUST be ordered by original block index: the
            # pivot eigh sorts eigenvalues ascending within the pair, so
            # pair order defines where they land.  Consistent (min, max)
            # ordering makes every round sort toward one global order
            # and the method converges like cyclic sorted Jacobi;
            # inconsistent ordering makes near-diagonal pivots return
            # pure permutation rotations that shuffle off-diagonal mass
            # forever (measured: off-norm stalls after sweep 1).
            order.extend((p, q) if p < q else (q, p))
        base = np.asarray(order, dtype=np.int32) * half
        perms[r] = (base[:, None] + np.arange(half, dtype=np.int32)).ravel()
        others = others[1:] + others[:1]
    invs = np.argsort(perms, axis=1).astype(np.int32)
    return perms, invs


def _pad_symmetric_separated(mats, pad):
    """Extend (B, N, N) symmetric batch with a decoupled diagonal tail
    whose entries sit strictly above every input eigenvalue (per-matrix
    Gershgorin bound), so the padding's eigenpairs are exactly the top
    ``pad`` after ascending sort and never mix with genuine ones."""
    if not pad:
        return mats
    bound = jnp.max(jnp.sum(jnp.abs(mats), axis=-1), axis=-1)  # (B,)
    n = mats.shape[-1] + pad
    tail_vals = 2.0 * jnp.maximum(bound, 1.0)[:, None] * (
        1.0 + jnp.arange(1, pad + 1, dtype=mats.dtype)
    )  # (B, pad), distinct and > spectral radius
    mats = jnp.pad(mats, ((0, 0), (0, pad), (0, pad)))
    tail = jnp.zeros((mats.shape[0], n), mats.dtype)
    tail = tail.at[:, n - pad:].set(tail_vals)
    return mats + jnp.eye(n, dtype=mats.dtype) * tail[:, None, :]


def blocked_eigh(mats, *, max_sweeps=_BLOCKED_EIGH_MAX_SWEEPS,
                 pivot=None, interpret=None):
    """Blocked batched symmetric eigendecomposition for moderate-to-large N.

    Parallel (round-robin) two-sided **block Jacobi**: each round gathers
    the batch's ``m / 2`` disjoint 32x32 pivot subproblems — solved
    exactly with the lane-kernel :func:`batched_eigh` at batch
    ``B * m / 2`` — and applies all the resulting rotations at once as
    block-structured batched matmuls on the MXU (the same composition
    idea as :func:`blocked_cholesky`: lane kernels for the O(N * b^2)
    pivot work, matmuls for the O(N^2 * b) updates).  Sweeps repeat under
    a ``while_loop`` until the worst off-diagonal Frobenius fraction in
    the batch falls below ~30 f32 ulps (block Jacobi inherits scalar
    Jacobi's quadratic convergence), up to ``max_sweeps``.

    This is the large-N continuation of the SoftAbs-metric eigh story
    (reference kernel: mici/matrices.py:1631-1685).  **Round-5 status:
    force-only, not auto-dispatched** — measured head-to-head at
    (B=64, N=256) on the current toolchain, XLA's native eigh runs
    0.151 s steady vs 1.72 s for this composition, so
    :func:`mici_tpu.ops.dispatch.eigh` routes large N to XLA and keeps
    this path behind ``force_dispatch("blocked")`` for A/B benchmarking
    (round-4's 469 ms XLA reading at B=256, N=256 did not reproduce).
    Not differentiable itself; :func:`mici_tpu.ops.dispatch.eigh` wraps
    every path in the closed-form symmetric-eigh ``custom_jvp``.

    Args:
        mats: Array (B, N, N) of symmetric matrices, N > 32 (both
            triangles read; symmetrized internally per sweep).
        max_sweeps: Sweep ceiling for the convergence loop.
        pivot: Pivot-subproblem solver — ``"parallel"``
            (:func:`parallel_jacobi_eigh`), ``"kernel"`` (lane-kernel
            :func:`batched_eigh`), ``"xla"`` (``jnp.linalg.eigh``) or
            ``None`` (parallel on TPU, XLA elsewhere).
        interpret: Force Pallas interpreter mode for the pivot kernel.

    Returns:
        Tuple ``(eigenvalues, eigenvectors)`` of shapes (B, N) ascending
        and (B, N, N) with eigenvectors as columns.
    """
    b_sz, n_in, _ = mats.shape
    dtype = mats.dtype
    if pivot is None:
        # "parallel" (pure-XLA scalar Jacobi) on TPU: the lane-kernel
        # pivot has a >9.5-minute Mosaic backend compile at n=32
        # (measured round 5), and XLA's QDWH blows up compile inside
        # nested while_loops.  CPU keeps XLA (LAPACK) pivots.
        pivot = "parallel" if _on_tpu() else "xla"
    if pivot not in ("kernel", "xla", "parallel"):
        raise ValueError(f"invalid pivot solver: {pivot!r}")
    pair = 2 * _EIGH_PAIR_HALF
    pad = (-n_in) % pair
    a0 = _pad_symmetric_separated(mats, pad)
    n = n_in + pad
    m = n // _EIGH_PAIR_HALF
    k = m // 2  # pivot pairs per round
    perms_np, invs_np = _block_jacobi_schedule(n, _EIGH_PAIR_HALF)
    perms, invs = jnp.asarray(perms_np), jnp.asarray(invs_np)
    eps = jnp.finfo(dtype).eps
    # Scale-free stopping rule on the whole batch.
    norm0 = jnp.maximum(
        jnp.sqrt(jnp.sum(jnp.square(a0), axis=(-2, -1))), eps)
    eye = jnp.eye(n, dtype=dtype)

    def _off_frac(a):
        off = a * (1.0 - eye)
        return jnp.max(
            jnp.sqrt(jnp.sum(jnp.square(off), axis=(-2, -1))) / norm0)

    def _round(r, carry):
        a, v = carry
        perm = perms[r]
        inv = invs[r]
        ap = jnp.take(jnp.take(a, perm, axis=1), perm, axis=2)
        # Pivot subproblems: consecutive 32x32 diagonal blocks.
        blocks = ap.reshape(b_sz, k, pair, k, pair)
        idx = jnp.arange(k)
        subs = blocks[:, idx, :, idx, :]          # (k, B, 32, 32)
        subs = jnp.moveaxis(subs, 0, 1).reshape(b_sz * k, pair, pair)
        subs = (subs + jnp.swapaxes(subs, -2, -1)) / 2
        if pivot == "kernel":
            _, rot = batched_eigh(subs, interpret=interpret)
        elif pivot == "parallel":
            _, rot = parallel_jacobi_eigh(subs)
        else:
            _, rot = jnp.linalg.eigh(subs)
        rot = rot.reshape(b_sz, k, pair, pair)
        # Two-sided update A <- R^T A R with R = blockdiag(rot) in the
        # permuted layout: row stripes then column stripes, each one
        # batched (32 x 32) @ (32 x N) MXU matmul per pivot pair.
        rows = ap.reshape(b_sz, k, pair, n)
        rows = jnp.einsum("bkij,bkin->bkjn", rot, rows)
        cols = rows.reshape(b_sz, n, k, pair)
        cols = jnp.einsum("bnki,bkij->bnkj", cols, rot)
        ap = cols.reshape(b_sz, n, n)
        a = jnp.take(jnp.take(ap, inv, axis=1), inv, axis=2)
        # Accumulate eigenvectors: V <- V R (columns only).
        vp = jnp.take(v, perm, axis=2).reshape(b_sz, n, k, pair)
        vp = jnp.einsum("bnki,bkij->bnkj", vp, rot)
        v = jnp.take(vp.reshape(b_sz, n, n), inv, axis=2)
        return a, v

    def _sweep(carry):
        a, v, sweep = carry
        a, v = jax.lax.fori_loop(0, m - 1, _round, (a, v))
        a = (a + jnp.swapaxes(a, -2, -1)) / 2
        return a, v, sweep + 1

    def _continue(carry):
        a, _, sweep = carry
        return jnp.logical_and(sweep < max_sweeps, _off_frac(a) > 30 * eps)

    v0 = jnp.broadcast_to(eye, a0.shape)
    # Full-precision rotation accumulation (same reasoning as
    # parallel_jacobi_eigh: bf16 MXU passes destroy the decomposition).
    with jax.default_matmul_precision("highest"):
        a, v, _ = jax.lax.while_loop(
            _continue, _sweep, (a0, v0, jnp.asarray(0, jnp.int32)))

    w = jnp.diagonal(a, axis1=-2, axis2=-1)
    order = jnp.argsort(w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    v = jnp.take_along_axis(v, order[:, None, :], axis=-1)
    if pad:
        # Padding eigenpairs are the strictly-largest `pad` by
        # construction; genuine eigenvectors have (numerically) zero
        # padding components, so slicing preserves orthonormality.
        w = w[:, :n_in]
        v = v[:, :n_in, :n_in]
    return w, v


# ---------------------------------------------------------------------------
# Batched / blocked triangular inversion
# ---------------------------------------------------------------------------


def _tril_inverse_kernel(n, l_ref, x_ref):
    # Forward substitution against the identity, batch in lanes; refs
    # (N, N, Bc) -> (N, N, Bc).  Row i of X = L^-1 satisfies
    # L[i, i] X[i, :] = e_i - L[i, :i] @ X[:i, :] — the same recurrence
    # as _tril_solve_kernel with an N-wide RHS plane per step.  Zeros
    # above the diagonal propagate exactly (products of exact zeros).
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    for i in range(n):
        e_row = (rows == i).astype(x_ref.dtype)
        if i == 0:
            s = e_row + jnp.zeros_like(x_ref[0, :, :])
        else:
            s = e_row - jnp.sum(
                l_ref[i, 0:i, :][:, None, :] * x_ref[0:i, :, :], axis=0,
            )
        x_ref[i, :, :] = s / l_ref[i, i, :][None, :]


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def _batched_tril_inverse_lanes(tril_lanes, block=_BATCH_BLOCK,
                                interpret=False):
    """Inverses of (N, N, B) batch-minor lower-triangular matrices."""
    n = tril_lanes.shape[0]
    block = _auto_block(n, tril_lanes.dtype.itemsize, block)
    padded, b = _pad_batch(tril_lanes, block)
    # avoid 0/0 in padded lanes
    pad_width = padded.shape[-1] - b
    if pad_width:
        eye = jnp.eye(n, dtype=padded.dtype)[..., None]
        mask = jnp.concatenate([
            jnp.zeros((1, 1, b), padded.dtype),
            jnp.ones((1, 1, pad_width), padded.dtype),
        ], axis=-1)
        padded = padded + eye * mask
    grid = (padded.shape[-1] // block,)
    out = pl.pallas_call(
        functools.partial(_tril_inverse_kernel, n),
        out_shape=jax.ShapeDtypeStruct(padded.shape, padded.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((n, n, block), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n, n, block), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(padded)
    return out[..., :b]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _tril_inverse_diff(tril, block, interpret):
    lanes = jnp.moveaxis(tril, 0, -1)
    out = _batched_tril_inverse_lanes(lanes, block=block,
                                      interpret=interpret)
    return jnp.moveaxis(out, -1, 0)


def _tril_inverse_fwd(tril, block, interpret):
    x = _tril_inverse_diff(tril, block, interpret)
    return x, x


def _tril_inverse_bwd(block, interpret, x, x_bar):
    # X = L^-1, dX = -X dL X  =>  L_bar = -X^T X_bar X^T, masked to the
    # lower triangle (the only entries the kernel reads).
    xt = _transpose(x)
    l_bar = -jnp.matmul(xt, jnp.matmul(x_bar, xt))
    return (jnp.tril(l_bar),)


_tril_inverse_diff.defvjp(_tril_inverse_fwd, _tril_inverse_bwd)


def batched_tril_inverse(tril, *, block=_BATCH_BLOCK, interpret=None):
    """Inverses of a batch of lower-triangular matrices, batch-in-lanes.

    Materializing ``L^-1`` turns *matrix*-right-hand-side triangular
    solves — the Cholesky differential ``L^-1 dA L^-T``
    (:func:`mici_tpu.ops.dispatch.cholesky`'s tangent rule, hit by every
    dense-metric gradient) and the definite-matrix inverse behind
    ``grad_log_abs_det`` (reference: mici/matrices.py:1176-1181) — into
    batched MXU matmuls, while the O(N^3 / 3) substitution itself runs
    one elementwise lane-axis recurrence over the whole batch.

    Reverse-mode differentiable (``L_bar = -tril(X^T X_bar X^T)``);
    forward-mode is not defined here — the dispatch-level
    :func:`mici_tpu.ops.dispatch.tri_inverse` wraps every path in a
    closed-form ``custom_jvp``.

    Args:
        tril: Array (B, N, N) of lower-triangular matrices (lower
            triangle read; the strict upper triangle is ignored).
        block: Batch block per grid step.
        interpret: Force Pallas interpreter mode.

    Returns:
        Inverses, shape (B, N, N), exactly lower-triangular.
    """
    if interpret is None:
        interpret = not _on_tpu()
    return _tril_inverse_diff(tril, block, interpret)


def blocked_tril_inverse(tril, *, panel=_BLOCK_PANEL, interpret=None):
    """Blocked batched lower-triangular inversion for moderate-to-large N.

    All K diagonal panels invert in one lane-kernel call at batch
    ``B * K`` (:func:`batched_tril_inverse`); the strictly-lower panel
    rows follow from the row recurrence
    ``X[i, :i] = -L_ii^-1 (L[i, :i] @ X[:i, :i])`` — one pair of batched
    MXU matmuls per panel row.  Same regime and differentiation notes as
    :func:`blocked_cholesky`.

    Args:
        tril: Array (B, N, N) of lower-triangular matrices.
        panel: Panel width (multiple-of-8 sublane tile; default 64).
        interpret: Force Pallas interpreter mode for the diagonal-panel
            kernel.

    Returns:
        Inverses, shape (B, N, N), lower-triangular.
    """
    b, n, _ = tril.shape
    pad = (-n) % panel
    tril_p, _ = _pad_tril(tril, jnp.zeros((b, n), tril.dtype), pad)
    n_pad = n + pad
    k_panels = n_pad // panel
    if k_panels == 1:
        return batched_tril_inverse(tril_p, interpret=interpret)[:, :n, :n]
    idx = jnp.arange(k_panels)
    diag_blocks = tril_p.reshape(
        b, k_panels, panel, k_panels, panel)[:, idx, :, idx, :]
    diag_blocks = jnp.moveaxis(diag_blocks, 0, 1).reshape(
        b * k_panels, panel, panel)
    diag_inv = batched_tril_inverse(
        diag_blocks, interpret=interpret,
    ).reshape(b, k_panels, panel, panel)
    x = jnp.zeros_like(tril_p)
    for k in range(k_panels):
        s = k * panel
        x = x.at[:, s:s + panel, s:s + panel].set(diag_inv[:, k])
    for i in range(1, k_panels):
        s = i * panel
        e = s + panel
        acc = jnp.matmul(tril_p[:, s:e, :s], x[:, :s, :s])
        x = x.at[:, s:e, :s].set(-jnp.matmul(diag_inv[:, i], acc))
    return x[:, :n, :n]
