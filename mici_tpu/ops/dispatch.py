"""Batch-aware dispatch of small-matrix linalg onto the Pallas kernels.

The structured-matrix layer (``mici_tpu.matrices``) is written per chain —
a metric is one ``(n, n)`` array — and the samplers batch chains with
``vmap``.  XLA's batched ``cholesky``/``triangular_solve`` parallelize
*within* one matrix, which is useless at n = O(32); the batch-in-lanes
Pallas kernels in :mod:`mici_tpu.ops.batched_linalg` are up to 14x faster
at 1024+ chains (measured table at the bottom of that module).

This module provides drop-in replacements for ``jnp.linalg.cholesky`` and
vector-RHS ``solve_triangular`` that route to the Pallas kernels when the
(vmapped or explicit) batch is large enough and the platform is TPU, and
to stock XLA otherwise.  Mechanism:

- ``jax.custom_batching.custom_vmap`` exposes the chain-batch dimension
  that ``vmap`` normally hides from library code, so the per-chain call
  sites in ``matrices.py`` (reference hot path:
  mici/matrices.py:1163-1173) dispatch on the *batched* shape;
- ``custom_vmap`` does not support AD, so each dispatched op is wrapped
  in an outer ``jax.custom_jvp`` whose tangent rule is the closed-form
  differential computed with plain (transposable) XLA ops.  Forward mode
  is therefore supported directly (the Newton fixed-point solver
  ``jacfwd``-s through the SoftAbs metric, hitting the eigh here), and
  reverse mode is derived by JAX from the linear tangent rule via
  transposition — producing the standard adjoints (verified against the
  native XLA gradients).  Only the primal dispatches to the kernels; the
  differential ops are XLA either way, matching the previous hand-written
  adjoints.

Dispatch conditions (auto mode): TPU platform, float32, batch >=
``_MIN_KERNEL_BATCH``, matrix size <= ``_MAX_KERNEL_N``.  Tests force the
kernel path on CPU (Pallas interpreter) via :func:`force_dispatch`.
"""

from __future__ import annotations

import contextlib
import functools
import math

import jax
import jax.numpy as jnp
from jax.custom_batching import custom_vmap

from mici_tpu.ops import batched_linalg as _bl

# Below ~256 chains the kernel's launch + layout transposes are not
# amortized over XLA's batched kernels; above 64 rows a 128-lane block
# of matrices no longer fits the double-buffered 16 MB VMEM budget
# (4 x 128 x N^2 x 4 B — N=128 demands 32 MB and faults at compile).
_MIN_KERNEL_BATCH = 256
_MAX_KERNEL_N = 64

# Between the lane-kernel ceiling and N ~ 512, the blocked composition
# (lane-kernel diagonal panels + MXU panel solves / Schur updates,
# batched_linalg.blocked_*) beats XLA's batched factorizations: measured
# 3.3x at (B=256, N=256) and 1.5x at (B=64, N=512); XLA's within-matrix
# parallelism wins again by N=1024 at the small batches that fit memory
# there (docs/BENCHMARKS.md round-4).
_MIN_BLOCKED_BATCH = 64
_MAX_BLOCKED_N = 512

#: None (auto) | "kernel" | "blocked" | "parallel" | "xla"
_FORCE_MODE = None


@contextlib.contextmanager
def force_dispatch(mode):
    """Force the dispatch decision: ``"kernel"``, ``"blocked"``,
    ``"parallel"``, ``"xla"`` or ``None`` (auto).

    Trace-time only — takes effect for code traced inside the context.
    Used by tests to exercise the kernel path on CPU (Pallas interpreter
    mode) and by benchmarks for A/B comparisons.
    """
    global _FORCE_MODE
    if mode not in (None, "kernel", "blocked", "parallel", "xla"):
        raise ValueError(f"invalid dispatch mode: {mode!r}")
    previous = _FORCE_MODE
    _FORCE_MODE = mode
    try:
        yield
    finally:
        _FORCE_MODE = previous


def _use_kernel(batch, n, dtype):
    if _FORCE_MODE == "kernel":
        return True
    if _FORCE_MODE in ("xla", "blocked"):
        return False
    return (
        _bl._on_tpu()
        and dtype == jnp.float32
        and batch >= _MIN_KERNEL_BATCH
        and n <= _MAX_KERNEL_N
    )


def _use_blocked(batch, n, dtype):
    if _FORCE_MODE == "blocked":
        return True
    if _FORCE_MODE in ("xla", "kernel"):
        return False
    return (
        _bl._on_tpu()
        and dtype == jnp.float32
        and batch >= _MIN_BLOCKED_BATCH
        and _MAX_KERNEL_N < n <= _MAX_BLOCKED_N
    )


# ---------------------------------------------------------------------------
# Cholesky
# ---------------------------------------------------------------------------


def _interpret_flag():
    # Compiled on TPU; interpreter elsewhere (tests forcing the kernel
    # path on CPU).
    return None if _bl._on_tpu() else True


def _chol_impl(a):
    if a.ndim > 2:
        batch = math.prod(a.shape[:-2])
        n = a.shape[-1]
        if _use_kernel(batch, n, a.dtype):
            flat = a.reshape((-1,) + a.shape[-2:])
            out = _bl.batched_cholesky(flat, interpret=_interpret_flag())
            return out.reshape(a.shape)
        if _use_blocked(batch, n, a.dtype):
            flat = a.reshape((-1,) + a.shape[-2:])
            out = _bl.blocked_cholesky(flat, interpret=_interpret_flag())
            return out.reshape(a.shape)
    return jnp.linalg.cholesky(a)


@custom_vmap
def _chol_cv(a):
    return _chol_impl(a)


@_chol_cv.def_vmap
def _chol_vmap_rule(axis_size, in_batched, a):
    (a_batched,) = in_batched
    return _chol_impl(a), a_batched


@jax.custom_jvp
def cholesky(a):
    """Drop-in ``jnp.linalg.cholesky`` with batch dispatch to Pallas.

    Reads the lower triangle only.  Differentiable in both modes: the
    tangent rule is ``dL = L phi(L^-1 sym(dA) L^-T)`` (with ``phi`` =
    lower triangle, halved diagonal) computed with XLA ops; reverse mode
    transposes it, yielding the same symmetrized adjoint convention as
    XLA's native Cholesky (the two paths produce identical gradients).
    """
    return _chol_cv(a)


def _chol_phi(m):
    diag = jnp.diagonal(m, axis1=-2, axis2=-1)
    eye = jnp.eye(m.shape[-1], dtype=m.dtype)
    return jnp.tril(m) - 0.5 * eye * diag[..., None]


@cholesky.defjvp
def _chol_jvp(primals, tangents):
    (a,) = primals
    (da,) = tangents
    factor = _chol_cv(a)
    da_sym = (da + jnp.swapaxes(da, -2, -1)) / 2
    # dL = L phi(L^-1 dA L^-T); linear + transposable in da, so JAX
    # derives the reverse-mode adjoint (identical to XLA's) from it.
    # The matrix-RHS solves run as matmuls against the explicit inverse
    # factor: linv depends only on primals (so it dispatches to the
    # batched inversion kernels via tri_inverse without breaking
    # transposability), the N x N-tangent sandwich rides the MXU, and
    # XLA CSE shares linv with any co-occurring gradient path.
    linv = _tri_inv_cv(factor)
    x = jnp.matmul(linv, jnp.matmul(da_sym, jnp.swapaxes(linv, -2, -1)))
    return factor, jnp.matmul(factor, _chol_phi(x))


# ---------------------------------------------------------------------------
# Vector-RHS triangular solve
# ---------------------------------------------------------------------------


def _xla_tri_solve_vec(a, b, lower, trans):
    # a (..., N, N) or (N, N) broadcast against b (..., N);
    # lax.linalg.triangular_solve requires equal batch ranks.
    if a.ndim - 1 != b.ndim:
        a = jnp.broadcast_to(a, b.shape[:-1] + a.shape[-2:])
    out = jax.lax.linalg.triangular_solve(
        a, b[..., None], left_side=True, lower=lower, transpose_a=trans,
    )
    return out[..., 0]


def _tri_solve_impl(a, b, lower, trans):
    if a.ndim > 2 and a.shape[:-2] == b.shape[:-1]:
        batch = math.prod(a.shape[:-2])
        n = a.shape[-1]
        use_kernel = _use_kernel(batch, n, a.dtype)
        use_blocked = not use_kernel and _use_blocked(batch, n, a.dtype)
        if use_kernel or use_blocked:
            af = a.reshape((-1,) + a.shape[-2:])
            bf = b.reshape((-1, b.shape[-1]))
            interpret = _interpret_flag()
            if not lower:
                # An upper-triangular system is the transposed-solve of
                # its transpose: U x = b  <=>  (U^T)^T x = b.
                af = jnp.swapaxes(af, -2, -1)
                trans = not trans
            fwd = (_bl.batched_tril_solve if use_kernel
                   else _bl.blocked_tril_solve)
            bwd = (_bl.batched_tril_transpose_solve if use_kernel
                   else _bl.blocked_tril_transpose_solve)
            out = (bwd if trans else fwd)(af, bf, interpret=interpret)
            return out.reshape(b.shape)
    return _xla_tri_solve_vec(a, b, lower, trans)


@functools.cache
def _tri_solve_vec(lower: bool, trans: bool):
    """custom_jvp(custom_vmap(...)) vector triangular solve for one
    static (lower, trans) combination."""

    def impl(a, b):
        return _tri_solve_impl(a, b, lower, trans)

    cv = custom_vmap(impl)

    @cv.def_vmap
    def _rule(axis_size, in_batched, a, b):  # noqa: ANN001
        a_batched, b_batched = in_batched
        if not (a_batched or b_batched):
            return impl(a, b), False
        if not a_batched:
            # Constant matrix across the batch: XLA broadcasts the solve
            # without materializing per-chain copies.
            return _xla_tri_solve_vec(a, b, lower, trans), True
        if not b_batched:
            b = jnp.broadcast_to(b, a.shape[:-2] + b.shape)
        return impl(a, b), True

    @jax.custom_jvp
    def solve(a, b):
        return cv(a, b)

    @solve.defjvp
    def _jvp(primals, tangents):
        a, b = primals
        da, db = tangents
        x = cv(a, b)
        # x = op(a)^-1 b  =>  dx = op(a)^-1 (db - op(da) x), with the
        # unread triangle of da masked out (the primal never touches it,
        # so its cotangent under transposition is exactly zero — cf. the
        # masked-triangle gradient test).  Linear + transposable in
        # (da, db): reverse mode transposes to
        #   b_bar = op(a)^-T x_bar,  op(a)_bar = -outer(b_bar, x)
        # (with b_bar summed over any broadcast batch dims), the standard
        # adjoint the previous hand-written VJP implemented.
        da_tri = jnp.tril(da) if lower else jnp.triu(da)
        if trans:
            da_tri = jnp.swapaxes(da_tri, -2, -1)
        mv = jnp.matmul(da_tri, x[..., None])[..., 0]
        dx = _xla_tri_solve_vec(a, db - mv, lower, trans)
        return x, dx

    return solve


def solve_triangular_vec(a, b, *, lower=True, trans=False):
    """Solve a (batch of) triangular system(s) with vector right-hand
    sides, dispatching large f32 TPU batches to the Pallas lane kernels.

    Drop-in for ``jax.scipy.linalg.solve_triangular`` restricted to
    1-D right-hand sides per system: under ``vmap`` over chains the call
    sees the whole chain batch (via ``custom_vmap``) and routes it to
    :func:`mici_tpu.ops.batched_tril_solve` /
    :func:`~mici_tpu.ops.batched_tril_transpose_solve`.

    Args:
        a: Triangular matrix, shape (..., N, N).
        b: Right-hand side vector(s), shape (..., N).
        lower: Whether ``a`` is lower (True) or upper (False) triangular.
        trans: Solve ``a.T x = b`` instead of ``a x = b``.

    Returns:
        Solutions, shape (..., N).
    """
    return _tri_solve_vec(bool(lower), bool(trans))(a, b)


# ---------------------------------------------------------------------------
# Triangular inversion and matrix-RHS triangular solve
# ---------------------------------------------------------------------------


def _tri_inverse_impl(l):
    if l.ndim > 2:
        batch = math.prod(l.shape[:-2])
        n = l.shape[-1]
        if _use_kernel(batch, n, l.dtype):
            flat = l.reshape((-1,) + l.shape[-2:])
            out = _bl.batched_tril_inverse(flat, interpret=_interpret_flag())
            return out.reshape(l.shape)
        if _use_blocked(batch, n, l.dtype):
            flat = l.reshape((-1,) + l.shape[-2:])
            out = _bl.blocked_tril_inverse(flat, interpret=_interpret_flag())
            return out.reshape(l.shape)
    eye = jnp.broadcast_to(
        jnp.eye(l.shape[-1], dtype=l.dtype), l.shape,
    )
    return jax.lax.linalg.triangular_solve(
        l, eye, left_side=True, lower=True,
    )


@custom_vmap
def _tri_inv_cv(l):
    return _tri_inverse_impl(l)


@_tri_inv_cv.def_vmap
def _tri_inv_vmap_rule(axis_size, in_batched, l):
    (l_batched,) = in_batched
    return _tri_inverse_impl(l), l_batched


@jax.custom_jvp
def tri_inverse(l):
    """Inverse of a (batch of) *lower*-triangular matrix(es), dispatching
    large f32 TPU batches to the Pallas inversion kernels.

    Reads the lower triangle only; returns an exactly lower-triangular
    inverse.  The explicit inverse converts matrix-right-hand-side
    triangular solves — the Cholesky tangent sandwich ``L^-1 dA L^-T``
    and the dense definite inverse behind ``grad_log_abs_det``
    (reference: mici/matrices.py:1176-1181) — into batched MXU matmuls.
    Differentiable in both modes: ``dX = -X tril(dL) X`` is linear and
    transposable, so reverse mode is derived by transposition.
    """
    return _tri_inv_cv(l)


@tri_inverse.defjvp
def _tri_inverse_jvp(primals, tangents):
    (l,) = primals
    (dl,) = tangents
    x = _tri_inv_cv(l)
    dx = -jnp.matmul(x, jnp.matmul(jnp.tril(dl), x))
    return x, dx


def _xla_tri_solve_mat(a, b, lower, trans):
    if a.ndim != b.ndim:
        a = jnp.broadcast_to(a, b.shape[:-2] + a.shape[-2:])
    return jax.lax.linalg.triangular_solve(
        a, b, left_side=True, lower=lower, transpose_a=trans,
    )


def _tri_solve_mat_impl(a, b, lower, trans):
    if a.ndim > 2 and a.shape[:-2] == b.shape[:-2]:
        batch = math.prod(a.shape[:-2])
        n = a.shape[-1]
        if (_use_kernel(batch, n, a.dtype)
                or _use_blocked(batch, n, a.dtype)):
            lo = a if lower else jnp.swapaxes(a, -2, -1)
            linv = _tri_inverse_impl(lo)
            # Solving op(a) x = b with op(a) lower-triangular L iff
            # (lower, not trans) or (upper, trans); otherwise op = L^T.
            if trans == lower:
                linv = jnp.swapaxes(linv, -2, -1)
            return jnp.matmul(linv, b)
    return _xla_tri_solve_mat(a, b, lower, trans)


@functools.cache
def _tri_solve_mat(lower: bool, trans: bool):
    """custom_jvp(custom_vmap(...)) matrix-RHS triangular solve for one
    static (lower, trans) combination."""

    def impl(a, b):
        return _tri_solve_mat_impl(a, b, lower, trans)

    cv = custom_vmap(impl)

    @cv.def_vmap
    def _rule(axis_size, in_batched, a, b):  # noqa: ANN001
        a_batched, b_batched = in_batched
        if not (a_batched or b_batched):
            return impl(a, b), False
        if not a_batched:
            return _xla_tri_solve_mat(a, b, lower, trans), True
        if not b_batched:
            b = jnp.broadcast_to(b, a.shape[:-2] + b.shape)
        return impl(a, b), True

    @jax.custom_jvp
    def solve(a, b):
        return cv(a, b)

    @solve.defjvp
    def _jvp(primals, tangents):
        a, b = primals
        da, db = tangents
        x = cv(a, b)
        # Same rule as the vector solve: dx = op(a)^-1 (db - op(da) x)
        # with the unread triangle of da masked; linear + transposable,
        # with the tangent solve in plain XLA ops.
        da_tri = jnp.tril(da) if lower else jnp.triu(da)
        if trans:
            da_tri = jnp.swapaxes(da_tri, -2, -1)
        dx = _xla_tri_solve_mat(a, db - jnp.matmul(da_tri, x), lower, trans)
        return x, dx

    return solve


def solve_triangular_mat(a, b, *, lower=True, trans=False):
    """Solve a (batch of) triangular system(s) with *matrix* right-hand
    sides, dispatching large f32 TPU batches through the batched
    triangular-inversion kernels (solution = ``L^-1 @ b`` on the MXU).

    Matrix-RHS companion of :func:`solve_triangular_vec`; same dispatch
    conditions, falling back to XLA's ``triangular_solve`` otherwise.

    Args:
        a: Triangular matrix, shape (..., N, N).
        b: Right-hand sides, shape (..., N, M).
        lower: Whether ``a`` is lower (True) or upper (False) triangular.
        trans: Solve ``a.T x = b`` instead of ``a x = b``.

    Returns:
        Solutions, shape (..., N, M).
    """
    return _tri_solve_mat(bool(lower), bool(trans))(a, b)


# ---------------------------------------------------------------------------
# Symmetric eigendecomposition
# ---------------------------------------------------------------------------

#: Ceiling for the Pallas fixed-sweep Jacobi lane kernel when *forced*
#: (``force_dispatch("kernel")``).  The kernel is no longer auto-routed:
#: its sweep body statically unrolls n(n-1)/2 rotation pairs and the
#: Mosaic backend compile blows up superlinearly — measured **>9.5
#: minutes at n = 32** on the current toolchain (round-4's unattributed
#: 197.5 s compile).  The auto small-N path is the pure-XLA
#: :func:`mici_tpu.ops.batched_linalg.parallel_jacobi_eigh` instead.
_MAX_EIGH_KERNEL_N = 32

#: Auto window for the parallel-order scalar-Jacobi eigh, held strictly
#: to measured wins: standalone on chip (round 5) it beats XLA's eigh
#: at (B=512, N=32) 0.073 s vs 0.093 s and (B=1024, N=16) 0.052 s vs
#: 0.057 s steady-state, and compiles in ~3 s.  The first round-5
#: window extrapolated that to 8 < N <= 64 at batch >= 64 — and the
#: ``softabs_eigh_dim64`` artifact row's end-to-end A/B caught the
#: extrapolation being wrong by 4x: at (B=64, N=64) through the
#: implicit-RMHMC driver, forced-XLA ran 47.6 chain-it/s vs the
#: parallel path's 11.3 (the 63 sequential rotation rounds scale with N
#: while the B=64 per-round matmuls underfill the chip; XLA's
#: within-matrix parallelism wins).  So the auto window is exactly the
#: measured-win region — large lane-filling batches of small matrices —
#: and XLA is the default everywhere else (also measured at
#: (B=64, N=256): XLA 0.151 s vs blocked-Jacobi 1.72 s).
_MAX_EIGH_PARALLEL_N = 32
_MIN_EIGH_PARALLEL_BATCH = 512


def _use_parallel_eigh(batch, n, dtype):
    if _FORCE_MODE == "parallel":
        return True
    if _FORCE_MODE in ("xla", "kernel", "blocked"):
        return False
    return (
        _bl._on_tpu()
        and dtype == jnp.float32
        and batch >= _MIN_EIGH_PARALLEL_BATCH
        and 8 < n <= _MAX_EIGH_PARALLEL_N
    )


def _use_blocked_eigh(batch, n, dtype):
    # Never auto-routed (round 5): at its target regime (B=64, N=256)
    # the blocked block-Jacobi runs 11x slower than XLA's native eigh on
    # the current toolchain (1.72 s vs 0.151 s steady), and its TPU
    # pivot solver (the Pallas lane kernel at n=32) has a >9.5-minute
    # backend compile.  Kept as a forced mode for A/B benchmarking.
    return _FORCE_MODE == "blocked"


def _eigh_impl(a):
    if a.ndim > 2:
        batch = math.prod(a.shape[:-2])
        n = a.shape[-1]
        if (_FORCE_MODE == "kernel" and n <= _MAX_EIGH_KERNEL_N):
            flat = a.reshape((-1,) + a.shape[-2:])
            w, v = _bl.batched_eigh(flat, interpret=_interpret_flag())
            return (w.reshape(a.shape[:-2] + w.shape[-1:]),
                    v.reshape(a.shape))
        if _use_parallel_eigh(batch, n, a.dtype):
            flat = a.reshape((-1,) + a.shape[-2:])
            w, v = _bl.parallel_jacobi_eigh(flat)
            return (w.reshape(a.shape[:-2] + w.shape[-1:]),
                    v.reshape(a.shape))
        if _use_blocked_eigh(batch, n, a.dtype):
            flat = a.reshape((-1,) + a.shape[-2:])
            w, v = _bl.blocked_eigh(flat, interpret=_interpret_flag())
            return (w.reshape(a.shape[:-2] + w.shape[-1:]),
                    v.reshape(a.shape))
    # plain tuple (not EighResult) so both paths return one pytree
    # structure, as custom_vmap requires
    res = jnp.linalg.eigh(a)
    return (res[0], res[1])


_eigh_cv = custom_vmap(lambda a: _eigh_impl(a))


@_eigh_cv.def_vmap
def _eigh_vmap_rule(axis_size, in_batched, a):
    (a_batched,) = in_batched
    w, v = _eigh_impl(a)
    return (w, v), (a_batched, a_batched)


@jax.custom_jvp
def eigh(a):
    """Drop-in symmetric ``jnp.linalg.eigh`` with batch dispatch to the
    Pallas fixed-sweep Jacobi kernel (n <= 32, large f32 TPU batches).

    Returns ``(eigenvalues, eigenvectors)`` ascending.  Differentiable in
    both modes (the Newton fixed-point solver ``jacfwd``-s through the
    SoftAbs metric eigendecomposition): the tangent rule is the standard
    symmetric-eigh differential

        dW = diag(V^T sym(dA) V),    dV = V (F o V^T sym(dA) V)

    with ``F_ij = 1 / (w_j - w_i)`` off the diagonal and 0 on it; reverse
    mode is its transpose (the standard symmetrized eigh adjoint, matching
    the previous hand-written VJP).  Degenerate eigenvalue pairs produce
    the same non-finite derivatives as XLA's native rule.
    """
    return _eigh_cv(a)


@eigh.defjvp
def _eigh_dispatch_jvp(primals, tangents):
    (a,) = primals
    (da,) = tangents
    w, v = _eigh_cv(a)
    da_sym = (da + jnp.swapaxes(da, -2, -1)) / 2
    vt_da_v = jnp.matmul(
        jnp.swapaxes(v, -2, -1), jnp.matmul(da_sym, v),
    )
    dw = jnp.diagonal(vt_da_v, axis1=-2, axis2=-1)
    diff = w[..., None, :] - w[..., :, None]
    eye = jnp.eye(w.shape[-1], dtype=bool)
    f = jnp.where(eye, 0.0, 1.0 / jnp.where(eye, 1.0, diff))
    dv = jnp.matmul(v, f * vt_da_v)
    return (w, v), (dw, dv)
