"""Structured matrix (linear operator) pytrees.

Reference: mici/matrices.py (2475 LoC of NumPy/SciPy classes with lazy,
Python-level cached factorizations).  This re-design is TPU-native:

* Every matrix class is an immutable **pytree** — matrices flow through
  ``jit`` / ``vmap`` / ``scan`` / ``shard_map`` like arrays, so a batch of
  1024 per-chain metrics is just a vmapped constructor call.
* The reference's *lazy factorization* (``matrices.py:1163-1173``: Cholesky
  computed on first ``.inv`` access, then memoized on the object) is replaced
  by **stateless on-demand properties**: inside a single ``jit`` trace XLA
  common-subexpression-eliminates repeated factorizations and dead-code
  eliminates unused ones, which recovers exactly the lazy/memoized cost
  profile without any mutable state.
* Structure-aware matmuls keep the right-to-left matvec association of the
  reference (e.g. ``mici/systems.py:868-872``) so no O(n^3) products appear
  on solve paths.

The class lattice, constructor signatures and operator semantics mirror
mici/matrices.py:44-2475 so reference users can port code directly.
"""

from __future__ import annotations

import abc
import numbers

import jax.numpy as jnp
import jax.scipy.linalg as jsla
import numpy as np

from mici_tpu.ops import dispatch as _dispatch
from mici_tpu.utils import hash_array


def _eigh_2x2(matrix):
    """Closed-form eigendecomposition of a symmetric 2x2 matrix.

    XLA's general ``eigh`` lowers to an iterative QDWH algorithm whose
    control-flow graph is large and slow to compile when inlined at many
    call sites inside nested ``while_loop``s (e.g. the SoftAbs metric
    rebuilt in every fixed-point iteration of an implicit integrator).  For
    2x2 matrices the decomposition is a handful of VPU-friendly elementwise
    ops: a Givens rotation with angle ``theta = atan2(2b, a - c) / 2``.
    """
    a = matrix[0, 0]
    b = 0.5 * (matrix[0, 1] + matrix[1, 0])
    c = matrix[1, 1]
    t = 0.5 * (a + c)
    d = 0.5 * (a - c)
    r = jnp.sqrt(d * d + b * b)
    theta = 0.5 * jnp.arctan2(2.0 * b, a - c)
    cs, sn = jnp.cos(theta), jnp.sin(theta)
    eigval = jnp.stack([t - r, t + r])
    eigvec = jnp.array([[-sn, cs], [cs, sn]])
    return eigval, eigvec


#: Largest matrix size decomposed with the fixed-sweep Jacobi kernel.
_JACOBI_MAX_SIZE = 8
_JACOBI_SWEEPS = 12


def _eigh_jacobi(matrix, n_sweeps=_JACOBI_SWEEPS):
    """Cyclic Jacobi eigendecomposition with a fixed sweep count.

    For small symmetric matrices the classical Jacobi rotation sweep
    converges quadratically; a fixed (static) number of sweeps reaches
    machine precision for n <= 8 while producing a small straight-line
    graph instead of XLA's iterative QDWH ``eigh`` — important when the
    decomposition sits inside nested ``while_loop``s (Riemannian metric
    rebuilds in implicit integrators).
    """
    n = matrix.shape[0]
    a = matrix
    v = jnp.eye(n, dtype=matrix.dtype)
    for _ in range(n_sweeps):
        for p in range(n - 1):
            for q in range(p + 1, n):
                apq = a[p, q]
                theta = 0.5 * jnp.arctan2(
                    2.0 * apq, a[p, p] - a[q, q],
                )
                c, s = jnp.cos(theta), jnp.sin(theta)
                # A <- J^T A J with Givens J acting on the (p, q) plane.
                row_p = c * a[p, :] + s * a[q, :]
                row_q = -s * a[p, :] + c * a[q, :]
                a = a.at[p, :].set(row_p).at[q, :].set(row_q)
                col_p = c * a[:, p] + s * a[:, q]
                col_q = -s * a[:, p] + c * a[:, q]
                a = a.at[:, p].set(col_p).at[:, q].set(col_q)
                vcol_p = c * v[:, p] + s * v[:, q]
                vcol_q = -s * v[:, p] + c * v[:, q]
                v = v.at[:, p].set(vcol_p).at[:, q].set(vcol_q)
    eigval = jnp.diagonal(a)
    order = jnp.argsort(eigval)
    return eigval[order], v[:, order]


def symmetric_eigendecomposition(matrix):
    """Eigendecomposition of a symmetric matrix, specialized for tiny sizes.

    Dispatches (statically, on shape) to the closed-form 2x2 kernel, the
    fixed-sweep Jacobi kernel (n <= 8, under tracing only — in eager mode
    the op-by-op dispatch of the unrolled sweeps would cost more than the
    LAPACK/QDWH call it replaces), or ``jnp.linalg.eigh``.  Returns
    ``(eigval, eigvec)`` with ascending eigenvalues and eigenvectors as
    columns.
    """
    import jax

    if matrix.ndim == 2 and matrix.shape == (2, 2):
        return _eigh_2x2(matrix)
    if (matrix.ndim == 2 and matrix.shape[0] == matrix.shape[1]
            and matrix.shape[0] <= _JACOBI_MAX_SIZE
            and isinstance(matrix, jax.core.Tracer)
            and jax.default_backend() == "tpu"):
        # The Jacobi kernel exists to dodge the TPU QDWH compile blowup;
        # CPU/GPU eigh compiles fine and is used as is.
        return _eigh_jacobi(matrix)
    # Moderate sizes (9 <= n <= 32): batch-aware dispatch — vmapped chain
    # batches on TPU hit the Pallas fixed-sweep Jacobi lane kernel
    # (ops/batched_linalg.batched_eigh), everything else falls back to
    # XLA's eigh.
    return _dispatch.eigh(matrix)


def _is_scalar(value) -> bool:
    return isinstance(value, numbers.Number) or (
        hasattr(value, "ndim") and value.ndim == 0
    )


def _as_array(other):
    return other.array if isinstance(other, Matrix) else jnp.asarray(other)


class Matrix(abc.ABC):
    """Base class for matrices. Reference: mici/matrices.py:44-202."""

    __array_priority__ = 1  # ensure ndarray @ Matrix dispatches to us

    @property
    @abc.abstractmethod
    def shape(self) -> tuple[int, int]:
        """Shape of matrix as (n_row, n_col) tuple."""

    @property
    @abc.abstractmethod
    def array(self):
        """Dense 2D array representation of matrix."""

    @property
    @abc.abstractmethod
    def T(self) -> "Matrix":  # noqa: N802
        """Transpose of matrix."""

    @property
    def diagonal(self):
        """Diagonal of matrix as a 1D array."""
        return jnp.diagonal(self.array)

    @abc.abstractmethod
    def _scalar_multiply(self, scalar) -> "Matrix":
        pass

    @abc.abstractmethod
    def _left_matrix_multiply(self, other):
        """Compute ``self @ other`` for an array ``other``."""

    @abc.abstractmethod
    def _right_matrix_multiply(self, other):
        """Compute ``other @ self`` for an array ``other``."""

    def __mul__(self, other):
        if _is_scalar(other):
            return self._scalar_multiply(other)
        return NotImplemented

    __rmul__ = __mul__

    def __truediv__(self, other):
        if _is_scalar(other):
            return self._scalar_multiply(1.0 / other)
        return NotImplemented

    def __neg__(self):
        return self._scalar_multiply(-1.0)

    def __matmul__(self, other):
        if isinstance(other, Matrix):
            if self.shape[1] not in (None, other.shape[0]):
                msg = f"Inconsistent shapes {self.shape} @ {other.shape}."
                raise ValueError(msg)
            return _matrix_product(self, other)
        other = jnp.asarray(other)
        return self._left_matrix_multiply(other)

    def __rmatmul__(self, other):
        if isinstance(other, Matrix):
            return _matrix_product(other, self)
        other = jnp.asarray(other)
        return self._right_matrix_multiply(other)

    def __hash__(self):
        children, aux = self.tree_flatten()
        return hash(
            (type(self).__name__, aux)
            + tuple(
                hash(c) if isinstance(c, Matrix)
                else hash_array(np.asarray(c))
                for c in children if c is not None
            ),
        )

    def __eq__(self, other):
        if type(other) is not type(self):
            return False
        s_children, s_aux = self.tree_flatten()
        o_children, o_aux = other.tree_flatten()
        if s_aux != o_aux:
            return False

        def _child_eq(a, b):
            if a is None or b is None:
                return a is None and b is None
            if isinstance(a, Matrix) or isinstance(b, Matrix):
                return a == b
            return np.array_equal(np.asarray(a), np.asarray(b))

        return all(_child_eq(a, b) for a, b in zip(s_children, o_children))

    def __repr__(self):
        return f"{type(self).__name__}(shape={self.shape})"


class ExplicitArrayMatrix(Matrix):
    """Matrix with an explicit 2D array representation.

    Reference: mici/matrices.py:204-236.
    """

    @property
    def array(self):
        return self._array

    @property
    def shape(self):
        return tuple(self._array.shape)

    def _left_matrix_multiply(self, other):
        return self._array @ other

    def _right_matrix_multiply(self, other):
        return other @ self._array


class ImplicitArrayMatrix(Matrix):
    """Matrix without an explicit 2D array representation.

    Reference: mici/matrices.py:238-266.  ``array`` is materialized on demand
    (XLA DCEs it when unused).
    """


class SquareMatrix(Matrix):
    """Matrix with equal numbers of rows and columns.

    Reference: mici/matrices.py:327-352.
    """

    @property
    @abc.abstractmethod
    def log_abs_det(self):
        """Logarithm of absolute value of determinant of matrix."""


class InvertibleMatrix(SquareMatrix):
    """Square matrix which is invertible. Reference: mici/matrices.py:354-378."""

    @property
    @abc.abstractmethod
    def inv(self) -> "Matrix":
        """Inverse of matrix as a Matrix object (lazily evaluated ops)."""


class SymmetricMatrix(SquareMatrix):
    """Symmetric square matrix. Reference: mici/matrices.py:430-467."""

    @property
    def _eigh(self):
        return symmetric_eigendecomposition(self.array)

    @property
    def eigval(self):
        """Eigenvalues of matrix as a 1D array."""
        return self._eigh[0]

    @property
    def eigvec(self) -> "OrthogonalMatrix":
        """Eigenvectors of matrix as columns of an OrthogonalMatrix."""
        return OrthogonalMatrix(self._eigh[1])

    @property
    def T(self):  # noqa: N802
        return self

    @property
    def log_abs_det(self):
        return jnp.sum(jnp.log(jnp.abs(self.eigval)))


class PositiveDefiniteMatrix(InvertibleMatrix, SymmetricMatrix):
    """Positive definite matrix. Reference: mici/matrices.py:469-489."""

    @property
    @abc.abstractmethod
    def sqrt(self) -> "Matrix":
        """Square-root of matrix satisfying ``sqrt @ sqrt.T == self``."""


class DifferentiableMatrix(InvertibleMatrix):
    """Parameterized matrix with differentiable log-det and inverse quadratic.

    Reference: mici/matrices.py:557-592.  ``grad_log_abs_det`` is the gradient
    of ``log_abs_det`` with respect to the matrix parameter and
    ``grad_quadratic_form_inv(v)`` the gradient of ``v.T @ inv @ v``.
    """

    @property
    @abc.abstractmethod
    def grad_log_abs_det(self):
        pass

    @abc.abstractmethod
    def grad_quadratic_form_inv(self, vector):
        pass


# ---------------------------------------------------------------------------
# Matrix products
# ---------------------------------------------------------------------------


def _matrix_product(matrix_l, matrix_r):
    """Combine two matrices into a lazy product, choosing the richest type.

    Reference: mici/matrices.py:27-35 (_choose_matrix_product_class).
    """
    matrices = []
    for m in (matrix_l, matrix_r):
        matrices.extend(m.matrices if isinstance(m, MatrixProduct) else [m])
    matrices = tuple(matrices)
    if matrices[0].shape[0] == matrices[-1].shape[1] and all(
        isinstance(m, InvertibleMatrix) for m in matrices
    ):
        return InvertibleMatrixProduct(matrices)
    if matrices[0].shape[0] == matrices[-1].shape[1]:
        return SquareMatrixProduct(matrices)
    return MatrixProduct(matrices)


class MatrixProduct(ImplicitArrayMatrix):
    """Lazy product of a sequence of matrices.

    Reference: mici/matrices.py:268-326.  Matvecs associate right-to-left.
    """

    def __init__(self, matrices):
        self.matrices = tuple(matrices)

    def tree_flatten(self):
        return tuple(self.matrices), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.matrices = tuple(children)
        return obj

    @property
    def shape(self):
        return (self.matrices[0].shape[0], self.matrices[-1].shape[1])

    @property
    def array(self):
        result = self.matrices[-1].array
        for m in reversed(self.matrices[:-1]):
            result = m @ result
        return result

    @property
    def T(self):  # noqa: N802
        return type(self)(tuple(m.T for m in reversed(self.matrices)))

    def _scalar_multiply(self, scalar):
        return type(self)(
            (self.matrices[0]._scalar_multiply(scalar), *self.matrices[1:]),
        )

    def _left_matrix_multiply(self, other):
        for m in reversed(self.matrices):
            other = m @ other
        return other

    def _right_matrix_multiply(self, other):
        for m in self.matrices:
            other = other @ m
        return other


class SquareMatrixProduct(MatrixProduct, SquareMatrix):
    """Product of matrices with square overall shape.

    Reference: mici/matrices.py:382-404.
    """

    @property
    def log_abs_det(self):
        return sum(m.log_abs_det for m in self.matrices)


class InvertibleMatrixProduct(SquareMatrixProduct, InvertibleMatrix):
    """Product of invertible matrices. Reference: mici/matrices.py:406-428."""

    @property
    def inv(self):
        return InvertibleMatrixProduct(
            tuple(m.inv for m in reversed(self.matrices)),
        )


# ---------------------------------------------------------------------------
# Identity / scaled identity / diagonal
# ---------------------------------------------------------------------------


class IdentityMatrix(DifferentiableMatrix, PositiveDefiniteMatrix,
                     ImplicitArrayMatrix):
    """Identity matrix, optionally with implicit size.

    Reference: mici/matrices.py:491-554.
    """

    def __init__(self, size: int | None = None):
        self._size = size

    def tree_flatten(self):
        return (), (self._size,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0])

    @property
    def shape(self):
        return (self._size, self._size)

    @property
    def array(self):
        if self._size is None:
            msg = "Cannot materialize implicitly sized identity matrix."
            raise RuntimeError(msg)
        return jnp.identity(self._size)

    @property
    def diagonal(self):
        return jnp.ones(self._size)

    @property
    def T(self):  # noqa: N802
        return self

    @property
    def eigval(self):
        return self.diagonal

    @property
    def eigvec(self):
        return self

    @property
    def inv(self):
        return self

    @property
    def sqrt(self):
        return self

    @property
    def log_abs_det(self):
        return jnp.zeros(())

    @property
    def grad_log_abs_det(self):
        return jnp.zeros(())

    def grad_quadratic_form_inv(self, vector):
        return jnp.zeros(())

    def _scalar_multiply(self, scalar):
        return ScaledIdentityMatrix(scalar, self._size)

    def _left_matrix_multiply(self, other):
        return other

    def _right_matrix_multiply(self, other):
        return other


class ScaledIdentityMatrix(DifferentiableMatrix, SymmetricMatrix,
                           ImplicitArrayMatrix):
    """Matrix of form ``scalar * identity``, optionally implicitly sized.

    Reference: mici/matrices.py:595-674.
    """

    def __init__(self, scalar, size: int | None = None):
        self._scalar = jnp.asarray(scalar)
        self._size = size

    def tree_flatten(self):
        return (self._scalar,), (self._size,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj._scalar = children[0]
        obj._size = aux[0]
        return obj

    @property
    def scalar(self):
        return self._scalar

    @property
    def shape(self):
        return (self._size, self._size)

    @property
    def array(self):
        if self._size is None:
            msg = "Cannot materialize implicitly sized scaled identity matrix."
            raise RuntimeError(msg)
        return self._scalar * jnp.identity(self._size)

    @property
    def diagonal(self):
        return self._scalar * jnp.ones(self._size)

    @property
    def T(self):  # noqa: N802
        return self

    @property
    def inv(self):
        return type(self)(1.0 / self._scalar, self._size)

    @property
    def eigval(self):
        return self.diagonal

    @property
    def eigvec(self):
        return IdentityMatrix(self._size)

    @property
    def log_abs_det(self):
        if self._size is None:
            msg = "Cannot compute log determinant of implicitly sized matrix."
            raise RuntimeError(msg)
        return self._size * jnp.log(jnp.abs(self._scalar))

    @property
    def grad_log_abs_det(self):
        return self._size / self._scalar

    def grad_quadratic_form_inv(self, vector):
        return -jnp.sum(vector**2) / self._scalar**2

    def _scalar_multiply(self, scalar):
        return ScaledIdentityMatrix(scalar * self._scalar, self._size)

    def _left_matrix_multiply(self, other):
        return self._scalar * other

    def _right_matrix_multiply(self, other):
        return self._scalar * other


class PositiveScaledIdentityMatrix(ScaledIdentityMatrix,
                                   PositiveDefiniteMatrix):
    """Scaled identity with positive scalar. Reference: mici/matrices.py:677-707."""

    @property
    def sqrt(self):
        return type(self)(jnp.sqrt(self._scalar), self._size)

    def _scalar_multiply(self, scalar):
        # Cannot branch on traced sign; retain positive type only for host
        # scalars known positive, mirroring mici/matrices.py:698-706.
        if isinstance(scalar, numbers.Number) and scalar <= 0:
            return ScaledIdentityMatrix(scalar * self._scalar, self._size)
        return PositiveScaledIdentityMatrix(scalar * self._scalar, self._size)


class DiagonalMatrix(DifferentiableMatrix, SymmetricMatrix,
                     ImplicitArrayMatrix):
    """Matrix with diagonal parameter array. Reference: mici/matrices.py:709-781."""

    def __init__(self, diag):
        diag = jnp.asarray(diag)
        if diag.ndim != 1:
            msg = "Specified diagonal must be a 1D array."
            raise ValueError(msg)
        self._diag = diag

    def tree_flatten(self):
        return (self._diag,), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj._diag = children[0]
        return obj

    @property
    def diagonal(self):
        return self._diag

    @property
    def shape(self):
        return (self._diag.shape[0], self._diag.shape[0])

    @property
    def array(self):
        return jnp.diag(self._diag)

    @property
    def T(self):  # noqa: N802
        return self

    @property
    def inv(self):
        return type(self)(1.0 / self._diag)

    @property
    def eigval(self):
        return self._diag

    @property
    def eigvec(self):
        return IdentityMatrix(self._diag.shape[0])

    @property
    def log_abs_det(self):
        return jnp.sum(jnp.log(jnp.abs(self._diag)))

    @property
    def grad_log_abs_det(self):
        return 1.0 / self._diag

    def grad_quadratic_form_inv(self, vector):
        return -((self.inv @ vector) ** 2)

    def _scalar_multiply(self, scalar):
        return DiagonalMatrix(scalar * self._diag)

    def _left_matrix_multiply(self, other):
        if other.ndim == 2:
            return self._diag[:, None] * other
        if other.ndim == 1:
            return self._diag * other
        msg = "Left matrix multiply only defined for 1D or 2D arrays."
        raise ValueError(msg)

    def _right_matrix_multiply(self, other):
        return other * self._diag


class PositiveDiagonalMatrix(DiagonalMatrix, PositiveDefiniteMatrix):
    """Diagonal matrix with positive diagonal. Reference: mici/matrices.py:784-793."""

    @property
    def sqrt(self):
        return type(self)(jnp.sqrt(self._diag))

    def _scalar_multiply(self, scalar):
        if isinstance(scalar, numbers.Number) and scalar <= 0:
            return DiagonalMatrix(scalar * self._diag)
        return PositiveDiagonalMatrix(scalar * self._diag)


# ---------------------------------------------------------------------------
# Triangular
# ---------------------------------------------------------------------------


def _tri(array, lower):
    return jnp.tril(array) if lower else jnp.triu(array)


class TriangularMatrix(InvertibleMatrix, ExplicitArrayMatrix):
    """Triangular matrix. Reference: mici/matrices.py:800-861."""

    def __init__(self, array, lower: bool = True, make_triangular: bool = True):
        array = jnp.asarray(array)
        self._array = _tri(array, lower) if make_triangular else array
        self.lower = lower

    def tree_flatten(self):
        return (self._array,), (self.lower,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj._array = children[0]
        obj.lower = aux[0]
        return obj

    @property
    def T(self):  # noqa: N802
        return TriangularMatrix(
            self._array.T, lower=not self.lower, make_triangular=False,
        )

    @property
    def inv(self):
        return InverseTriangularMatrix(
            self._array, lower=self.lower, make_triangular=False,
        )

    @property
    def log_abs_det(self):
        return jnp.sum(jnp.log(jnp.abs(self.diagonal)))

    def _scalar_multiply(self, scalar):
        return TriangularMatrix(
            scalar * self._array, lower=self.lower, make_triangular=False,
        )


class InverseTriangularMatrix(InvertibleMatrix, ImplicitArrayMatrix):
    """Inverse of a triangular matrix; matvecs are triangular solves.

    Reference: mici/matrices.py:864-956.
    """

    def __init__(self, inverse_array, lower: bool = True,
                 make_triangular: bool = True):
        inverse_array = jnp.asarray(inverse_array)
        self._inverse_array = (
            _tri(inverse_array, lower) if make_triangular else inverse_array
        )
        self.lower = lower

    def tree_flatten(self):
        return (self._inverse_array,), (self.lower,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj._inverse_array = children[0]
        obj.lower = aux[0]
        return obj

    @property
    def shape(self):
        return tuple(self._inverse_array.shape)

    @property
    def array(self):
        return self._left_matrix_multiply(jnp.identity(self.shape[0]))

    @property
    def diagonal(self):
        return 1.0 / jnp.diagonal(self._inverse_array)

    @property
    def T(self):  # noqa: N802
        return InverseTriangularMatrix(
            self._inverse_array.T, lower=not self.lower, make_triangular=False,
        )

    @property
    def inv(self):
        return TriangularMatrix(
            self._inverse_array, lower=self.lower, make_triangular=False,
        )

    @property
    def log_abs_det(self):
        return -self.inv.log_abs_det

    def _scalar_multiply(self, scalar):
        return InverseTriangularMatrix(
            self._inverse_array / scalar, lower=self.lower,
            make_triangular=False,
        )

    def _left_matrix_multiply(self, other):
        if other.ndim == 1:
            # Vector solves are the per-chain hot path (momentum matvecs):
            # dispatch so vmapped chain batches hit the Pallas lane kernels.
            return _dispatch.solve_triangular_vec(
                self._inverse_array, other, lower=self.lower,
            )
        return _dispatch.solve_triangular_mat(
            self._inverse_array, other, lower=self.lower,
        )

    def _right_matrix_multiply(self, other):
        if other.ndim == 1:
            return _dispatch.solve_triangular_vec(
                self._inverse_array, other, lower=self.lower, trans=True,
            )
        return _dispatch.solve_triangular_mat(
            self._inverse_array, other.T, lower=self.lower, trans=True,
        ).T


# ---------------------------------------------------------------------------
# Definite matrices (dense and triangular-factored)
# ---------------------------------------------------------------------------


class _BaseTriangularFactoredDefiniteMatrix(InvertibleMatrix, SymmetricMatrix):
    @property
    @abc.abstractmethod
    def factor(self):
        """Triangular factor ``L`` such that ``self = sign * L @ L.T``."""

    @property
    def log_abs_det(self):
        return 2 * self.factor.log_abs_det


class TriangularFactoredDefiniteMatrix(DifferentiableMatrix,
                                       _BaseTriangularFactoredDefiniteMatrix,
                                       ImplicitArrayMatrix):
    """Matrix parameterized as ``sign * factor @ factor.T``.

    Reference: mici/matrices.py:958-1076.
    """

    def __init__(self, factor, sign: int = 1, factor_is_lower: bool = True):
        if not isinstance(factor, (TriangularMatrix, InverseTriangularMatrix)):
            factor = TriangularMatrix(factor, lower=factor_is_lower)
        self._factor = factor
        self._sign = sign

    def tree_flatten(self):
        return (self._factor,), (self._sign,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj._factor = children[0]
        obj._sign = aux[0]
        return obj

    @property
    def factor(self):
        return self._factor

    @property
    def sign(self):
        return self._sign

    @property
    def shape(self):
        return self._factor.shape

    @property
    def array(self):
        return self._sign * (self._factor @ self._factor.T.array)

    @property
    def T(self):  # noqa: N802
        return self

    @property
    def inv(self):
        return TriangularFactoredDefiniteMatrix(
            self._factor.inv.T, sign=self._sign,
        )

    @property
    def grad_log_abs_det(self):
        # d/dL of 2 sum(log|diag L|) = 2 / diag(L) on diagonal
        diag = self._factor.diagonal
        return jnp.diag(2.0 / diag)

    def grad_quadratic_form_inv(self, vector):
        inv_factor = self._factor.inv
        inv_vector = self.inv @ vector
        inv_factor_vector = inv_factor @ vector
        return -2 * self._sign * jnp.outer(inv_vector, inv_factor_vector)

    def _scalar_multiply(self, scalar):
        # |scalar| folds into the factor; a host-level negative flips sign.
        if isinstance(scalar, numbers.Number):
            return TriangularFactoredDefiniteMatrix(
                abs(scalar) ** 0.5 * self._factor,
                sign=self._sign * (1 if scalar > 0 else -1),
            )
        return TriangularFactoredDefiniteMatrix(
            jnp.sqrt(scalar) * self._factor, sign=self._sign,
        )

    def _left_matrix_multiply(self, other):
        return self._sign * (self._factor @ (self._factor.T @ other))

    def _right_matrix_multiply(self, other):
        return self._sign * ((other @ self._factor) @ self._factor.T)


class TriangularFactoredPositiveDefiniteMatrix(
    TriangularFactoredDefiniteMatrix, PositiveDefiniteMatrix,
):
    """Positive definite matrix parameterized as ``factor @ factor.T``.

    Reference: mici/matrices.py:1078-1114.
    """

    def __init__(self, factor, factor_is_lower: bool = True):
        super().__init__(factor, sign=1, factor_is_lower=factor_is_lower)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj._factor = children[0]
        obj._sign = aux[0]
        return obj

    @property
    def inv(self):
        return TriangularFactoredPositiveDefiniteMatrix(self._factor.inv.T)

    @property
    def sqrt(self):
        return self._factor

    def _scalar_multiply(self, scalar):
        if isinstance(scalar, numbers.Number) and scalar <= 0:
            return super()._scalar_multiply(scalar)
        return TriangularFactoredPositiveDefiniteMatrix(
            jnp.sqrt(jnp.asarray(scalar)) * self._factor,
        )


class DenseDefiniteMatrix(DifferentiableMatrix,
                          _BaseTriangularFactoredDefiniteMatrix,
                          ExplicitArrayMatrix):
    """Dense definite matrix with on-demand Cholesky factorization.

    Reference: mici/matrices.py:1117-1181 (lazy Cholesky at :1163-1173
    becomes an XLA-CSE'd on-demand property here).
    """

    def __init__(self, array, sign: int = 1):
        self._array = jnp.asarray(array)
        self._sign = sign

    def tree_flatten(self):
        return (self._array,), (self._sign,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj._array = children[0]
        obj._sign = aux[0]
        return obj

    @property
    def sign(self):
        return self._sign

    @property
    def factor(self):
        # Dispatched Cholesky: vmapped chain batches (position-dependent
        # metrics, Gram matrices) route to the batch-in-lanes Pallas
        # kernel on TPU.  Reference hot path: mici/matrices.py:1163-1173.
        return TriangularMatrix(
            _dispatch.cholesky(self._sign * self._array),
            lower=True, make_triangular=False,
        )

    @property
    def T(self):  # noqa: N802
        return self

    @property
    def inv(self):
        return TriangularFactoredDefiniteMatrix(
            self.factor.inv.T, sign=self._sign,
        )

    @property
    def grad_log_abs_det(self):
        # d log|det A| / dA = A^-1 (symmetric), computed from the
        # dispatched Cholesky as sign * L^-T L^-1: on large chain batches
        # both the factorization and the inversion ride the Pallas
        # kernels and the product is one MXU matmul, replacing a batched
        # LU inverse XLA cannot batch efficiently at metric sizes
        # (reference analytic gradient: mici/matrices.py:1176-1181).
        linv = _dispatch.tri_inverse(self.factor.array)
        return self._sign * (linv.T @ linv)

    def grad_quadratic_form_inv(self, vector):
        inv_vector = self.inv @ vector
        return -jnp.outer(inv_vector, inv_vector)

    def _scalar_multiply(self, scalar):
        if isinstance(scalar, numbers.Number):
            return DenseDefiniteMatrix(
                scalar * self._array,
                sign=self._sign * (1 if scalar > 0 else -1),
            )
        return DenseDefiniteMatrix(scalar * self._array, sign=self._sign)


class DensePositiveDefiniteMatrix(DenseDefiniteMatrix, PositiveDefiniteMatrix):
    """Dense positive definite matrix. Reference: mici/matrices.py:1184-1217."""

    def __init__(self, array):
        super().__init__(array, sign=1)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj._array = children[0]
        obj._sign = aux[0]
        return obj

    @property
    def inv(self):
        return TriangularFactoredPositiveDefiniteMatrix(self.factor.inv.T)

    @property
    def sqrt(self):
        return self.factor

    def _scalar_multiply(self, scalar):
        if isinstance(scalar, numbers.Number) and scalar <= 0:
            return DenseDefiniteMatrix(scalar * self._array, sign=-1)
        return DensePositiveDefiniteMatrix(scalar * self._array)


class DensePositiveDefiniteProductMatrix(DensePositiveDefiniteMatrix):
    """Positive definite matrix of form ``rect @ pos_def @ rect.T``.

    Reference: mici/matrices.py:1219-1267 (used for Gram matrices).
    """

    def __init__(self, rect_matrix, pos_def_matrix=None):
        rect_matrix = _as_array(rect_matrix)
        if pos_def_matrix is None:
            pos_def_matrix = IdentityMatrix(rect_matrix.shape[1])
        _array = rect_matrix @ (pos_def_matrix @ rect_matrix.T)
        super().__init__(_array)
        self._rect_matrix = DenseRectangularMatrix(rect_matrix)
        self._pos_def_matrix = pos_def_matrix

    def tree_flatten(self):
        return (self._array, self._rect_matrix, self._pos_def_matrix), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj._array = children[0]
        obj._rect_matrix = children[1]
        obj._pos_def_matrix = children[2]
        obj._sign = 1
        return obj

    @property
    def grad_log_abs_det(self):
        return 2 * (self.inv @ (
            self._rect_matrix.array @ self._pos_def_matrix
        ))

    def grad_quadratic_form_inv(self, vector):
        inv_vector = self.inv @ vector
        return -2 * jnp.outer(
            inv_vector,
            self._pos_def_matrix @ (self._rect_matrix.T @ inv_vector),
        )


# ---------------------------------------------------------------------------
# Dense square (LU-factored) matrices
# ---------------------------------------------------------------------------


class DenseSquareMatrix(InvertibleMatrix, ExplicitArrayMatrix):
    """Dense general square matrix with on-demand LU factorization.

    Reference: mici/matrices.py:1270-1343.
    """

    def __init__(self, array):
        self._array = jnp.asarray(array)

    def tree_flatten(self):
        return (self._array,), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj._array = children[0]
        return obj

    @property
    def _lu_and_piv(self):
        return jsla.lu_factor(self._array)

    @property
    def T(self):  # noqa: N802
        return DenseSquareMatrix(self._array.T)

    @property
    def log_abs_det(self):
        lu, _ = self._lu_and_piv
        return jnp.sum(jnp.log(jnp.abs(jnp.diagonal(lu))))

    @property
    def inv(self):
        lu, piv = self._lu_and_piv
        return InverseLUFactoredSquareMatrix(
            self._array, lu, piv, transposed=False,
        )

    def _scalar_multiply(self, scalar):
        return DenseSquareMatrix(scalar * self._array)


class InverseLUFactoredSquareMatrix(InvertibleMatrix, ImplicitArrayMatrix):
    """Inverse of a dense square matrix represented via its LU factorization.

    Reference: mici/matrices.py:1345-1411.
    """

    def __init__(self, inv_array, inv_lu_array, inv_lu_piv,
                 transposed: bool = False):
        self._inv_array = jnp.asarray(inv_array)
        self._inv_lu_array = inv_lu_array
        self._inv_lu_piv = inv_lu_piv
        self._transposed = transposed

    def tree_flatten(self):
        return (
            (self._inv_array, self._inv_lu_array, self._inv_lu_piv),
            (self._transposed,),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj._inv_array, obj._inv_lu_array, obj._inv_lu_piv = children
        obj._transposed = aux[0]
        return obj

    @property
    def shape(self):
        return tuple(self._inv_array.shape)

    @property
    def array(self):
        return self._left_matrix_multiply(jnp.identity(self.shape[0]))

    @property
    def log_abs_det(self):
        return -jnp.sum(jnp.log(jnp.abs(jnp.diagonal(self._inv_lu_array))))

    @property
    def T(self):  # noqa: N802
        return InverseLUFactoredSquareMatrix(
            self._inv_array.T, self._inv_lu_array, self._inv_lu_piv,
            transposed=not self._transposed,
        )

    @property
    def inv(self):
        return DenseSquareMatrix(self._inv_array)

    def _solve(self, rhs, trans):
        return jsla.lu_solve(
            (self._inv_lu_array, self._inv_lu_piv), rhs, trans=trans,
        )

    def _left_matrix_multiply(self, other):
        vector = other.ndim == 1
        rhs = other[:, None] if vector else other
        result = self._solve(rhs, trans=1 if self._transposed else 0)
        return result[:, 0] if vector else result

    def _right_matrix_multiply(self, other):
        vector = other.ndim == 1
        rhs = other[None, :] if vector else other
        result = self._solve(rhs.T, trans=0 if self._transposed else 1).T
        return result[0] if vector else result

    def _scalar_multiply(self, scalar):
        return DenseSquareMatrix(scalar * self.array)


# ---------------------------------------------------------------------------
# Symmetric / orthogonal / eigendecomposed
# ---------------------------------------------------------------------------


class DenseSymmetricMatrix(InvertibleMatrix, SymmetricMatrix,
                           ExplicitArrayMatrix):
    """Dense symmetric matrix. Reference: mici/matrices.py:1414-1457."""

    def __init__(self, array):
        array = jnp.asarray(array)
        self._array = (array + array.T) / 2

    def tree_flatten(self):
        return (self._array,), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj._array = children[0]
        return obj

    @property
    def inv(self):
        return EigendecomposedSymmetricMatrix(self.eigvec, 1.0 / self.eigval)

    def _scalar_multiply(self, scalar):
        return DenseSymmetricMatrix(scalar * self._array)


class OrthogonalMatrix(InvertibleMatrix, ExplicitArrayMatrix):
    """Orthogonal matrix (inverse = transpose).

    Reference: mici/matrices.py:1459-1494.
    """

    def __init__(self, array):
        self._array = jnp.asarray(array)

    def tree_flatten(self):
        return (self._array,), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj._array = children[0]
        return obj

    @property
    def T(self):  # noqa: N802
        return OrthogonalMatrix(self._array.T)

    @property
    def inv(self):
        return self.T

    @property
    def log_abs_det(self):
        return jnp.zeros(())

    def _scalar_multiply(self, scalar):
        return ScaledOrthogonalMatrix(scalar, self._array)


class ScaledOrthogonalMatrix(InvertibleMatrix, ImplicitArrayMatrix):
    """Matrix of form ``scalar * orthogonal``.

    Reference: mici/matrices.py:1496-1527.
    """

    def __init__(self, scalar, orth_array):
        self._scalar = jnp.asarray(scalar)
        self._orth_array = jnp.asarray(orth_array)

    def tree_flatten(self):
        return (self._scalar, self._orth_array), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj._scalar, obj._orth_array = children
        return obj

    @property
    def shape(self):
        return tuple(self._orth_array.shape)

    @property
    def array(self):
        return self._scalar * self._orth_array

    @property
    def diagonal(self):
        return self._scalar * jnp.diagonal(self._orth_array)

    @property
    def T(self):  # noqa: N802
        return ScaledOrthogonalMatrix(self._scalar, self._orth_array.T)

    @property
    def inv(self):
        return ScaledOrthogonalMatrix(1.0 / self._scalar,
                                      self._orth_array.T)

    @property
    def log_abs_det(self):
        return self.shape[0] * jnp.log(jnp.abs(self._scalar))

    def _scalar_multiply(self, scalar):
        return ScaledOrthogonalMatrix(scalar * self._scalar, self._orth_array)

    def _left_matrix_multiply(self, other):
        return self._scalar * (self._orth_array @ other)

    def _right_matrix_multiply(self, other):
        return self._scalar * (other @ self._orth_array)


class EigendecomposedSymmetricMatrix(InvertibleMatrix, SymmetricMatrix,
                                     ImplicitArrayMatrix):
    """Symmetric matrix parameterized by its eigendecomposition.

    Reference: mici/matrices.py:1529-1593.
    """

    def __init__(self, eigvec, eigval):
        if not isinstance(eigvec, (OrthogonalMatrix, IdentityMatrix)):
            eigvec = OrthogonalMatrix(eigvec)
        self._eigvec_matrix = eigvec
        self._eigval = jnp.asarray(eigval)

    def tree_flatten(self):
        return (self._eigvec_matrix, self._eigval), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj._eigvec_matrix, obj._eigval = children
        return obj

    @property
    def eigvec(self):
        return self._eigvec_matrix

    @property
    def eigval(self):
        return self._eigval

    @property
    def shape(self):
        return self._eigvec_matrix.shape

    @property
    def array(self):
        return self._left_matrix_multiply(jnp.identity(self.shape[0]))

    @property
    def inv(self):
        return type(self)(self._eigvec_matrix, 1.0 / self._eigval)

    @property
    def log_abs_det(self):
        return jnp.sum(jnp.log(jnp.abs(self._eigval)))

    def _scalar_multiply(self, scalar):
        return EigendecomposedSymmetricMatrix(
            self._eigvec_matrix, scalar * self._eigval,
        )

    def _left_matrix_multiply(self, other):
        vector = other.ndim == 1
        scale = self._eigval if vector else self._eigval[:, None]
        return self._eigvec_matrix @ (
            scale * (self._eigvec_matrix.T @ other)
        )

    def _right_matrix_multiply(self, other):
        return ((other @ self._eigvec_matrix) * self._eigval
                ) @ self._eigvec_matrix.T.array


class EigendecomposedPositiveDefiniteMatrix(EigendecomposedSymmetricMatrix,
                                            PositiveDefiniteMatrix):
    """Positive definite matrix parameterized by its eigendecomposition.

    Reference: mici/matrices.py:1596-1628.
    """

    @property
    def inv(self):
        return EigendecomposedPositiveDefiniteMatrix(
            self._eigvec_matrix, 1.0 / self._eigval,
        )

    @property
    def sqrt(self):
        return EigendecomposedPositiveDefiniteMatrix(
            self._eigvec_matrix, jnp.sqrt(self._eigval),
        )


class SoftAbsRegularizedPositiveDefiniteMatrix(
    DifferentiableMatrix, EigendecomposedPositiveDefiniteMatrix,
):
    """Symmetric matrix regularized to positive-definiteness via soft-abs.

    ``matrix = eigvec @ diag(softabs(eigval)) @ eigvec.T`` where
    ``softabs(x) = x / tanh(x * softabs_coeff)``.

    Reference: mici/matrices.py:1631-1685 (the SoftAbs metric kernel;
    grad_quadratic_form_inv uses the J-matrix formula at :1678-1685 with
    removable singularities handled on the diagonal).
    """

    def __init__(self, symmetric_array, softabs_coeff: float = 1.0):
        symmetric_array = jnp.asarray(symmetric_array)
        unreg_eigval, eigvec = symmetric_eigendecomposition(symmetric_array)
        self._softabs_coeff = softabs_coeff
        self._unreg_eigval = unreg_eigval
        eigval = self._softabs_of(unreg_eigval)
        super().__init__(eigvec, eigval)

    def tree_flatten(self):
        return (
            (self._eigvec_matrix, self._eigval, self._unreg_eigval),
            (self._softabs_coeff,),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj._eigvec_matrix, obj._eigval, obj._unreg_eigval = children
        obj._softabs_coeff = aux[0]
        return obj

    def _softabs_of(self, x):
        a = self._softabs_coeff
        # x / tanh(a x) with the x -> 0 limit 1 / a handled explicitly.
        safe = jnp.where(x == 0, 1.0, x)
        return jnp.where(
            x == 0, 1.0 / a, safe / jnp.tanh(a * safe),
        )

    def softabs(self, x):
        """Smooth approximation to absolute function."""
        return self._softabs_of(x)

    def grad_softabs(self, x):
        """Derivative of smooth approximation to absolute function."""
        a = self._softabs_coeff
        safe = jnp.where(x == 0, 1.0, x)
        return jnp.where(
            x == 0,
            0.0,
            1.0 / jnp.tanh(a * safe) - a * safe / jnp.sinh(a * safe) ** 2,
        )

    @property
    def unreg_eigval(self):
        return self._unreg_eigval

    @property
    def grad_log_abs_det(self):
        grad_eigval = self.grad_softabs(self._unreg_eigval) / self._eigval
        return EigendecomposedSymmetricMatrix(
            self._eigvec_matrix, grad_eigval,
        ).array

    def grad_quadratic_form_inv(self, vector):
        lam = self._eigval
        ulam = self._unreg_eigval
        num = lam[:, None] - lam[None, :] + jnp.diag(
            self.grad_softabs(ulam),
        )
        den = ulam[:, None] - ulam[None, :]
        # equivalent of np.fill_diagonal(den, 1)
        den = jnp.where(jnp.eye(den.shape[0], dtype=bool), 1.0, den)
        j_mtx = num / den
        eigvec = self._eigvec_matrix.array
        e_vct = (eigvec.T @ vector) / lam
        return -((eigvec @ (jnp.outer(e_vct, e_vct) * j_mtx)) @ eigvec.T)


# ---------------------------------------------------------------------------
# Block matrices
# ---------------------------------------------------------------------------


class SquareBlockDiagonalMatrix(InvertibleMatrix, ImplicitArrayMatrix):
    """Square matrix with blocks along diagonal.

    Reference: mici/matrices.py:1706-1804.
    """

    def __init__(self, blocks):
        self._blocks = tuple(blocks)
        if not all(isinstance(b, SquareMatrix) for b in self._blocks):
            msg = "All blocks must be square matrices."
            raise ValueError(msg)

    def tree_flatten(self):
        return tuple(self._blocks), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj._blocks = tuple(children)
        return obj

    @property
    def blocks(self):
        return self._blocks

    @property
    def _sizes(self):
        return tuple(b.shape[0] for b in self._blocks)

    @property
    def shape(self):
        size = sum(self._sizes)
        return (size, size)

    @property
    def array(self):
        return jsla.block_diag(*(b.array for b in self._blocks))

    @property
    def diagonal(self):
        return jnp.concatenate([b.diagonal for b in self._blocks])

    @property
    def T(self):  # noqa: N802
        return type(self)(tuple(b.T for b in self._blocks))

    @property
    def inv(self):
        return type(self)(tuple(b.inv for b in self._blocks))

    @property
    def log_abs_det(self):
        return sum(b.log_abs_det for b in self._blocks)

    @property
    def eigval(self):
        return jnp.concatenate([b.eigval for b in self._blocks])

    @property
    def eigvec(self):
        return SquareBlockDiagonalMatrix(
            tuple(b.eigvec for b in self._blocks),
        )

    def _split(self, other, axis=0):
        splits = np.cumsum(self._sizes)[:-1]
        return jnp.split(other, splits, axis=axis)

    def _scalar_multiply(self, scalar):
        return type(self)(
            tuple(b._scalar_multiply(scalar) for b in self._blocks),
        )

    def _left_matrix_multiply(self, other):
        parts = self._split(other, axis=0)
        return jnp.concatenate(
            [b @ part for b, part in zip(self._blocks, parts)], axis=0,
        )

    def _right_matrix_multiply(self, other):
        parts = self._split(other, axis=-1)
        return jnp.concatenate(
            [part @ b for b, part in zip(self._blocks, parts)], axis=-1,
        )


class SymmetricBlockDiagonalMatrix(SquareBlockDiagonalMatrix, SymmetricMatrix):
    """Symmetric block diagonal matrix. Reference: mici/matrices.py:1807-1841."""

    def __init__(self, blocks):
        blocks = tuple(blocks)
        if not all(isinstance(b, SymmetricMatrix) for b in blocks):
            msg = "All blocks must be symmetric matrices."
            raise ValueError(msg)
        super().__init__(blocks)

    @property
    def T(self):  # noqa: N802
        return self


class PositiveDefiniteBlockDiagonalMatrix(DifferentiableMatrix,
                                          SymmetricBlockDiagonalMatrix,
                                          PositiveDefiniteMatrix):
    """Positive definite block diagonal matrix.

    Reference: mici/matrices.py:1844-1881.
    """

    def __init__(self, blocks):
        blocks = tuple(blocks)
        if not all(isinstance(b, PositiveDefiniteMatrix) for b in blocks):
            msg = "All blocks must be positive definite."
            raise ValueError(msg)
        super().__init__(blocks)

    @property
    def sqrt(self):
        return SquareBlockDiagonalMatrix(
            tuple(b.sqrt for b in self._blocks),
        )

    def _scalar_multiply(self, scalar):
        blocks = tuple(b._scalar_multiply(scalar) for b in self._blocks)
        if all(isinstance(b, PositiveDefiniteMatrix) for b in blocks):
            return PositiveDefiniteBlockDiagonalMatrix(blocks)
        return SymmetricBlockDiagonalMatrix(blocks)

    @property
    def grad_log_abs_det(self):
        return tuple(
            b.grad_log_abs_det if isinstance(b, DifferentiableMatrix)
            else None
            for b in self._blocks
        )

    def grad_quadratic_form_inv(self, vector):
        parts = self._split(vector, axis=0)
        return tuple(
            b.grad_quadratic_form_inv(part)
            if isinstance(b, DifferentiableMatrix) else None
            for b, part in zip(self._blocks, parts)
        )


class DenseRectangularMatrix(ExplicitArrayMatrix):
    """Dense rectangular matrix. Reference: mici/matrices.py:1883-1907."""

    def __init__(self, array):
        self._array = jnp.asarray(array)

    def tree_flatten(self):
        return (self._array,), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj._array = children[0]
        return obj

    @property
    def T(self):  # noqa: N802
        return DenseRectangularMatrix(self._array.T)

    def _scalar_multiply(self, scalar):
        return DenseRectangularMatrix(scalar * self._array)


class BlockRowMatrix(ImplicitArrayMatrix):
    """Matrix composed of horizontal concatenation of blocks.

    Reference: mici/matrices.py:1910-1956.
    """

    def __init__(self, blocks):
        self._blocks = tuple(blocks)

    def tree_flatten(self):
        return tuple(self._blocks), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj._blocks = tuple(children)
        return obj

    @property
    def blocks(self):
        return self._blocks

    @property
    def shape(self):
        return (
            self._blocks[0].shape[0],
            sum(b.shape[1] for b in self._blocks),
        )

    @property
    def array(self):
        return jnp.concatenate([b.array for b in self._blocks], axis=1)

    @property
    def T(self):  # noqa: N802
        return BlockColumnMatrix(tuple(b.T for b in self._blocks))

    def _scalar_multiply(self, scalar):
        return BlockRowMatrix(
            tuple(b._scalar_multiply(scalar) for b in self._blocks),
        )

    def _left_matrix_multiply(self, other):
        splits = np.cumsum([b.shape[1] for b in self._blocks])[:-1]
        parts = jnp.split(other, splits, axis=0)
        return sum(b @ part for b, part in zip(self._blocks, parts))

    def _right_matrix_multiply(self, other):
        return jnp.concatenate(
            [other @ b for b in self._blocks], axis=-1,
        )


class BlockColumnMatrix(ImplicitArrayMatrix):
    """Matrix composed of vertical concatenation of blocks.

    Reference: mici/matrices.py:1959-2005.
    """

    def __init__(self, blocks):
        self._blocks = tuple(blocks)

    def tree_flatten(self):
        return tuple(self._blocks), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj._blocks = tuple(children)
        return obj

    @property
    def blocks(self):
        return self._blocks

    @property
    def shape(self):
        return (
            sum(b.shape[0] for b in self._blocks),
            self._blocks[0].shape[1],
        )

    @property
    def array(self):
        return jnp.concatenate([b.array for b in self._blocks], axis=0)

    @property
    def T(self):  # noqa: N802
        return BlockRowMatrix(tuple(b.T for b in self._blocks))

    def _scalar_multiply(self, scalar):
        return BlockColumnMatrix(
            tuple(b._scalar_multiply(scalar) for b in self._blocks),
        )

    def _left_matrix_multiply(self, other):
        return jnp.concatenate(
            [b @ other for b in self._blocks], axis=0,
        )

    def _right_matrix_multiply(self, other):
        splits = np.cumsum([b.shape[0] for b in self._blocks])[:-1]
        parts = jnp.split(other, splits, axis=-1)
        return sum(part @ b for b, part in zip(self._blocks, parts))


# ---------------------------------------------------------------------------
# Low-rank update matrices (Woodbury / matrix determinant lemma)
# ---------------------------------------------------------------------------


class SquareLowRankUpdateMatrix(InvertibleMatrix, ImplicitArrayMatrix):
    """Square matrix ``square + sign * left @ inner @ right``.

    Inverse via the Woodbury identity and determinant via the matrix
    determinant lemma, both at ``O(dim_inner**3 + dim_inner**2 dim_outer)``
    cost.  Reference: mici/matrices.py:2007-2201.
    """

    def __init__(self, left_factor_matrix, right_factor_matrix, square_matrix,
                 inner_square_matrix=None, capacitance_matrix=None,
                 sign: int = 1):
        if not isinstance(left_factor_matrix, Matrix):
            left_factor_matrix = DenseRectangularMatrix(left_factor_matrix)
        if not isinstance(right_factor_matrix, Matrix):
            right_factor_matrix = DenseRectangularMatrix(right_factor_matrix)
        dim_outer, dim_inner = left_factor_matrix.shape
        if square_matrix.shape[0] != dim_outer:
            msg = "Inconsistent factor and square matrix shapes."
            raise ValueError(msg)
        if inner_square_matrix is None:
            inner_square_matrix = IdentityMatrix(dim_inner)
        self.left_factor_matrix = left_factor_matrix
        self.right_factor_matrix = right_factor_matrix
        self.square_matrix = square_matrix
        self.inner_square_matrix = inner_square_matrix
        self._capacitance_matrix = capacitance_matrix
        self._sign = sign

    def tree_flatten(self):
        return (
            (self.left_factor_matrix, self.right_factor_matrix,
             self.square_matrix, self.inner_square_matrix,
             self._capacitance_matrix),
            (self._sign,),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        (obj.left_factor_matrix, obj.right_factor_matrix, obj.square_matrix,
         obj.inner_square_matrix, obj._capacitance_matrix) = children
        obj._sign = aux[0]
        return obj

    @property
    def shape(self):
        size = self.left_factor_matrix.shape[0]
        return (size, size)

    @property
    def capacitance_matrix(self):
        if self._capacitance_matrix is not None:
            return self._capacitance_matrix
        return DenseSquareMatrix(
            self.inner_square_matrix.inv.array
            + self.right_factor_matrix
            @ (self.square_matrix.inv @ self.left_factor_matrix.array),
        )

    @property
    def array(self):
        return self.square_matrix.array + self._sign * (
            self.left_factor_matrix
            @ (self.inner_square_matrix @ self.right_factor_matrix.array)
        )

    @property
    def diagonal(self):
        return self.square_matrix.diagonal + self._sign * jnp.sum(
            (self.left_factor_matrix.array @ self.inner_square_matrix)
            * self.right_factor_matrix.T.array,
            axis=1,
        )

    @property
    def T(self):  # noqa: N802
        return type(self)(
            self.right_factor_matrix.T,
            self.left_factor_matrix.T,
            self.square_matrix.T,
            self.inner_square_matrix.T,
            None,
            self._sign,
        )

    @property
    def inv(self):
        return type(self)(
            self.square_matrix.inv @ self.left_factor_matrix,
            self.right_factor_matrix @ self.square_matrix.inv,
            self.square_matrix.inv,
            self.capacitance_matrix.inv,
            self.inner_square_matrix.inv,
            -self._sign,
        )

    @property
    def log_abs_det(self):
        return (
            self.square_matrix.log_abs_det
            + self.inner_square_matrix.log_abs_det
            + self.capacitance_matrix.log_abs_det
        )

    def _scalar_multiply(self, scalar):
        return type(self)(
            self.left_factor_matrix,
            self.right_factor_matrix,
            scalar * self.square_matrix,
            scalar * self.inner_square_matrix,
            None,
            self._sign,
        )

    def _left_matrix_multiply(self, other):
        return self.square_matrix @ other + self._sign * (
            self.left_factor_matrix
            @ (self.inner_square_matrix @ (self.right_factor_matrix @ other))
        )

    def _right_matrix_multiply(self, other):
        return other @ self.square_matrix + self._sign * (
            ((other @ self.left_factor_matrix) @ self.inner_square_matrix)
            @ self.right_factor_matrix
        )


class SymmetricLowRankUpdateMatrix(SquareLowRankUpdateMatrix,
                                   SymmetricMatrix):
    """Symmetric matrix ``sym + sign * factor @ inner @ factor.T``.

    Reference: mici/matrices.py:2204-2332.
    """

    def __init__(self, factor_matrix, symmetric_matrix,
                 inner_symmetric_matrix=None, capacitance_matrix=None,
                 sign: int = 1):
        if not isinstance(factor_matrix, Matrix):
            factor_matrix = DenseRectangularMatrix(factor_matrix)
        self.factor_matrix = factor_matrix
        self.symmetric_matrix = symmetric_matrix
        if inner_symmetric_matrix is None:
            inner_symmetric_matrix = IdentityMatrix(factor_matrix.shape[1])
        self.inner_symmetric_matrix = inner_symmetric_matrix
        super().__init__(
            left_factor_matrix=factor_matrix,
            right_factor_matrix=factor_matrix.T,
            square_matrix=symmetric_matrix,
            inner_square_matrix=inner_symmetric_matrix,
            capacitance_matrix=capacitance_matrix,
            sign=sign,
        )

    def tree_flatten(self):
        return (
            (self.factor_matrix, self.symmetric_matrix,
             self.inner_symmetric_matrix, self._capacitance_matrix),
            (self._sign,),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        (obj.factor_matrix, obj.symmetric_matrix, obj.inner_symmetric_matrix,
         obj._capacitance_matrix) = children
        obj._sign = aux[0]
        obj.left_factor_matrix = obj.factor_matrix
        obj.right_factor_matrix = obj.factor_matrix.T
        obj.square_matrix = obj.symmetric_matrix
        obj.inner_square_matrix = obj.inner_symmetric_matrix
        return obj

    @property
    def capacitance_matrix(self):
        if self._capacitance_matrix is not None:
            return self._capacitance_matrix
        return DenseSymmetricMatrix(
            self.inner_symmetric_matrix.inv.array
            + self.factor_matrix.T
            @ (self.symmetric_matrix.inv @ self.factor_matrix.array),
        )

    @property
    def T(self):  # noqa: N802
        return self

    @property
    def inv(self):
        return type(self)(
            self.symmetric_matrix.inv @ self.factor_matrix,
            self.symmetric_matrix.inv,
            self.capacitance_matrix.inv,
            self.inner_symmetric_matrix.inv,
            -self._sign,
        )

    def _scalar_multiply(self, scalar):
        return type(self)(
            self.factor_matrix,
            scalar * self.symmetric_matrix,
            scalar * self.inner_symmetric_matrix,
            None,
            self._sign,
        )


class PositiveDefiniteLowRankUpdateMatrix(DifferentiableMatrix,
                                          SymmetricLowRankUpdateMatrix,
                                          PositiveDefiniteMatrix):
    """Positive definite matrix ``pd + sign * factor @ inner_pd @ factor.T``.

    Reference: mici/matrices.py:2335-2475; ``sqrt`` uses the symmetric
    factorization of Ambikasaran, O'Neill & Singh (2016), with the inner
    symmetric square root computed by eigendecomposition (TPU friendly,
    replacing ``scipy.linalg.sqrtm``).
    """

    def __init__(self, factor_matrix, pos_def_matrix,
                 inner_pos_def_matrix=None, capacitance_matrix=None,
                 sign: int = 1):
        if not isinstance(factor_matrix, Matrix):
            factor_matrix = DenseRectangularMatrix(factor_matrix)
        self.pos_def_matrix = pos_def_matrix
        if inner_pos_def_matrix is None:
            inner_pos_def_matrix = IdentityMatrix(factor_matrix.shape[1])
        self.inner_pos_def_matrix = inner_pos_def_matrix
        super().__init__(
            factor_matrix=factor_matrix,
            symmetric_matrix=pos_def_matrix,
            inner_symmetric_matrix=inner_pos_def_matrix,
            capacitance_matrix=capacitance_matrix,
            sign=sign,
        )

    def tree_flatten(self):
        return (
            (self.factor_matrix, self.pos_def_matrix,
             self.inner_pos_def_matrix, self._capacitance_matrix),
            (self._sign,),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        (obj.factor_matrix, obj.pos_def_matrix, obj.inner_pos_def_matrix,
         obj._capacitance_matrix) = children
        obj._sign = aux[0]
        obj.symmetric_matrix = obj.pos_def_matrix
        obj.inner_symmetric_matrix = obj.inner_pos_def_matrix
        obj.left_factor_matrix = obj.factor_matrix
        obj.right_factor_matrix = obj.factor_matrix.T
        obj.square_matrix = obj.pos_def_matrix
        obj.inner_square_matrix = obj.inner_pos_def_matrix
        return obj

    @property
    def capacitance_matrix(self):
        if self._capacitance_matrix is not None:
            return self._capacitance_matrix
        return DensePositiveDefiniteMatrix(
            self.inner_pos_def_matrix.inv.array
            + self.factor_matrix.T
            @ (self.pos_def_matrix.inv @ self.factor_matrix.array),
        )

    @property
    def inv(self):
        return type(self)(
            self.pos_def_matrix.inv @ self.factor_matrix,
            self.pos_def_matrix.inv,
            self.capacitance_matrix.inv,
            self.inner_pos_def_matrix.inv,
            -self._sign,
        )

    @property
    def sqrt(self):
        w_matrix = self.pos_def_matrix.sqrt
        k_matrix = self.inner_pos_def_matrix
        u_array = w_matrix.inv @ self.factor_matrix.array
        l_array = _dispatch.cholesky(u_array.T @ u_array)
        l_matrix = TriangularMatrix(l_array, lower=True,
                                    make_triangular=False)
        dim_inner = u_array.shape[1]
        i_inner = jnp.identity(dim_inner)
        inner_sym = i_inner + l_matrix.T @ (k_matrix @ l_array)
        eigval, eigvec = jnp.linalg.eigh((inner_sym + inner_sym.T) / 2)
        m_array = (eigvec * jnp.sqrt(eigval)[None, :]) @ eigvec.T
        x_matrix = DenseSymmetricMatrix(
            l_matrix.inv.T @ ((m_array - i_inner) @ l_matrix.inv.array),
        )
        return w_matrix @ SymmetricLowRankUpdateMatrix(
            DenseRectangularMatrix(u_array),
            IdentityMatrix(u_array.shape[0]),
            x_matrix,
        )

    @property
    def grad_log_abs_det(self):
        return 2 * (
            self.inv @ (self.factor_matrix.array @ self.inner_pos_def_matrix)
        )

    def grad_quadratic_form_inv(self, vector):
        inv_matrix_vector = self.inv @ vector
        return -2 * jnp.outer(
            inv_matrix_vector,
            self.inner_pos_def_matrix
            @ (self.factor_matrix.T @ inv_matrix_vector),
        )

    def _scalar_multiply(self, scalar):
        if isinstance(scalar, numbers.Number) and scalar <= 0:
            return SymmetricLowRankUpdateMatrix(
                self.factor_matrix,
                scalar * self.pos_def_matrix,
                scalar * self.inner_pos_def_matrix,
                None,
                self._sign,
            )
        return type(self)(
            self.factor_matrix,
            scalar * self.pos_def_matrix,
            scalar * self.inner_pos_def_matrix,
            None,
            self._sign,
        )


# Register all matrix classes as pytrees (those defining tree_flatten).
from jax import tree_util as _tree_util  # noqa: E402

for _cls in (
    MatrixProduct, SquareMatrixProduct, InvertibleMatrixProduct,
    IdentityMatrix, ScaledIdentityMatrix, PositiveScaledIdentityMatrix,
    DiagonalMatrix, PositiveDiagonalMatrix, TriangularMatrix,
    InverseTriangularMatrix, TriangularFactoredDefiniteMatrix,
    TriangularFactoredPositiveDefiniteMatrix, DenseDefiniteMatrix,
    DensePositiveDefiniteMatrix, DensePositiveDefiniteProductMatrix,
    DenseSquareMatrix, InverseLUFactoredSquareMatrix, DenseSymmetricMatrix,
    OrthogonalMatrix, ScaledOrthogonalMatrix, EigendecomposedSymmetricMatrix,
    EigendecomposedPositiveDefiniteMatrix,
    SoftAbsRegularizedPositiveDefiniteMatrix, SquareBlockDiagonalMatrix,
    SymmetricBlockDiagonalMatrix, PositiveDefiniteBlockDiagonalMatrix,
    DenseRectangularMatrix, BlockRowMatrix, BlockColumnMatrix,
    SquareLowRankUpdateMatrix, SymmetricLowRankUpdateMatrix,
    PositiveDefiniteLowRankUpdateMatrix,
):
    _tree_util.register_pytree_node_class(_cls)
