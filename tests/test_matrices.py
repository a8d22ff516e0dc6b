"""Tests for mici_tpu.matrices against dense NumPy oracles.

Mirrors the reference test strategy (mici tests/test_matrices.py:83-360):
generic property grids crossed over every matrix type, with dense NumPy
oracles for operators and autodiff (jax.grad of slogdet / solve) oracles for
gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mici_tpu import matrices

SIZE = 5
SEED = 3141


def _rng():
    return np.random.default_rng(SEED)


def _random_posdef(rng, size=SIZE):
    a = rng.standard_normal((size, size))
    return a @ a.T + size * np.eye(size)


def _random_sym(rng, size=SIZE):
    a = rng.standard_normal((size, size))
    return (a + a.T) / 2


def _random_orth(rng, size=SIZE):
    q, _ = np.linalg.qr(rng.standard_normal((size, size)))
    return q


def make_cases():
    rng = _rng()
    posdef = _random_posdef(rng)
    sym = _random_sym(rng)
    sq = rng.standard_normal((SIZE, SIZE))
    tril = np.tril(rng.standard_normal((SIZE, SIZE))) + SIZE * np.eye(SIZE)
    diag = np.abs(rng.standard_normal(SIZE)) + 0.5
    orth = _random_orth(rng)
    eigval = np.abs(rng.standard_normal(SIZE)) + 0.5
    scalar = 1.7
    factor = rng.standard_normal((SIZE, 2))
    inner = _random_posdef(rng, 2)
    blk_pd_1 = _random_posdef(rng, 2)
    blk_pd_2 = _random_posdef(rng, 3)

    cases = {
        "identity": (
            matrices.IdentityMatrix(SIZE), np.eye(SIZE)),
        "scaled_identity": (
            matrices.ScaledIdentityMatrix(-scalar, SIZE),
            -scalar * np.eye(SIZE)),
        "pos_scaled_identity": (
            matrices.PositiveScaledIdentityMatrix(scalar, SIZE),
            scalar * np.eye(SIZE)),
        "diagonal": (
            matrices.DiagonalMatrix(diag - 1.0), np.diag(diag - 1.0)),
        "pos_diagonal": (
            matrices.PositiveDiagonalMatrix(diag), np.diag(diag)),
        "triangular_lower": (
            matrices.TriangularMatrix(tril, lower=True), tril),
        "triangular_upper": (
            matrices.TriangularMatrix(tril.T, lower=False), tril.T),
        "inverse_triangular": (
            matrices.InverseTriangularMatrix(tril, lower=True),
            np.linalg.inv(tril)),
        "triangular_factored_definite": (
            matrices.TriangularFactoredDefiniteMatrix(tril, sign=-1),
            -tril @ tril.T),
        "triangular_factored_pos_def": (
            matrices.TriangularFactoredPositiveDefiniteMatrix(tril),
            tril @ tril.T),
        "dense_definite": (
            matrices.DenseDefiniteMatrix(-posdef, sign=-1), -posdef),
        "dense_pos_def": (
            matrices.DensePositiveDefiniteMatrix(posdef), posdef),
        "dense_pos_def_product": (
            matrices.DensePositiveDefiniteProductMatrix(
                factor.T, matrices.DensePositiveDefiniteMatrix(posdef)),
            factor.T @ posdef @ factor),
        "dense_square": (
            matrices.DenseSquareMatrix(sq), sq),
        "inverse_lu": (
            matrices.DenseSquareMatrix(sq).inv, np.linalg.inv(sq)),
        "dense_symmetric": (
            matrices.DenseSymmetricMatrix(sym), sym),
        "orthogonal": (
            matrices.OrthogonalMatrix(orth), orth),
        "scaled_orthogonal": (
            matrices.ScaledOrthogonalMatrix(-scalar, orth), -scalar * orth),
        "eigendecomposed_symmetric": (
            matrices.EigendecomposedSymmetricMatrix(orth, eigval - 1.0),
            orth @ np.diag(eigval - 1.0) @ orth.T),
        "eigendecomposed_pos_def": (
            matrices.EigendecomposedPositiveDefiniteMatrix(orth, eigval),
            orth @ np.diag(eigval) @ orth.T),
        "softabs": (
            matrices.SoftAbsRegularizedPositiveDefiniteMatrix(sym, 1.5),
            None),  # oracle computed below
        "block_diag_pos_def": (
            matrices.PositiveDefiniteBlockDiagonalMatrix([
                matrices.DensePositiveDefiniteMatrix(blk_pd_1),
                matrices.DensePositiveDefiniteMatrix(blk_pd_2),
            ]),
            np.block([
                [blk_pd_1, np.zeros((2, 3))],
                [np.zeros((3, 2)), blk_pd_2],
            ])),
        "square_block_diag": (
            matrices.SquareBlockDiagonalMatrix([
                matrices.DenseSquareMatrix(sq[:2, :2]),
                matrices.DenseSquareMatrix(sq[2:, 2:]),
            ]),
            np.block([
                [sq[:2, :2], np.zeros((2, 3))],
                [np.zeros((3, 2)), sq[2:, 2:]],
            ])),
        "square_low_rank_update": (
            matrices.SquareLowRankUpdateMatrix(
                factor, factor.T * 2.0, matrices.DenseSquareMatrix(sq)),
            sq + factor @ (factor.T * 2.0)),
        "symmetric_low_rank_update": (
            matrices.SymmetricLowRankUpdateMatrix(
                factor, matrices.DenseSymmetricMatrix(sym),
                matrices.DenseSymmetricMatrix(inner)),
            sym + factor @ inner @ factor.T),
        "pos_def_low_rank_update": (
            matrices.PositiveDefiniteLowRankUpdateMatrix(
                factor, matrices.DensePositiveDefiniteMatrix(posdef),
                matrices.DensePositiveDefiniteMatrix(inner)),
            posdef + factor @ inner @ factor.T),
        "matrix_product": (
            matrices.DensePositiveDefiniteMatrix(posdef)
            @ matrices.DenseSquareMatrix(sq),
            posdef @ sq),
        "block_row": (
            matrices.BlockRowMatrix([
                matrices.DenseRectangularMatrix(factor.T),
                matrices.DenseRectangularMatrix(factor.T),
            ]),
            np.concatenate([factor.T, factor.T], axis=1)),
        "block_column": (
            matrices.BlockColumnMatrix([
                matrices.DenseRectangularMatrix(factor),
                matrices.DenseRectangularMatrix(factor),
            ]),
            np.concatenate([factor, factor], axis=0)),
    }
    # Softabs oracle
    ev, evec = np.linalg.eigh(sym)
    sab = ev / np.tanh(ev * 1.5)
    cases["softabs"] = (
        cases["softabs"][0], evec @ np.diag(sab) @ evec.T)
    return cases


CASES = make_cases()


@pytest.fixture(params=list(CASES))
def case(request):
    return CASES[request.param]


def test_array(case):
    matrix, oracle = case
    np.testing.assert_allclose(matrix.array, oracle, atol=1e-10)


def test_shape(case):
    matrix, oracle = case
    assert matrix.shape == oracle.shape


def test_diagonal(case):
    matrix, oracle = case
    if oracle.shape[0] == oracle.shape[1]:
        np.testing.assert_allclose(
            matrix.diagonal, np.diagonal(oracle), atol=1e-10)


def test_left_matmul(case):
    matrix, oracle = case
    rng = _rng()
    v = rng.standard_normal(oracle.shape[1])
    b = rng.standard_normal((oracle.shape[1], 3))
    np.testing.assert_allclose(matrix @ v, oracle @ v, atol=1e-9)
    np.testing.assert_allclose(matrix @ b, oracle @ b, atol=1e-9)


def test_right_matmul(case):
    matrix, oracle = case
    rng = _rng()
    v = rng.standard_normal(oracle.shape[0])
    b = rng.standard_normal((3, oracle.shape[0]))
    np.testing.assert_allclose(v @ matrix, v @ oracle, atol=1e-9)
    np.testing.assert_allclose(b @ matrix, b @ oracle, atol=1e-9)


def test_transpose(case):
    matrix, oracle = case
    np.testing.assert_allclose(matrix.T.array, oracle.T, atol=1e-10)


def test_scalar_multiply(case):
    matrix, oracle = case
    np.testing.assert_allclose((2.5 * matrix).array, 2.5 * oracle,
                               atol=1e-9)
    np.testing.assert_allclose((matrix / 2.0).array, oracle / 2.0,
                               atol=1e-9)
    np.testing.assert_allclose((-matrix).array, -oracle, atol=1e-10)


def test_log_abs_det(case):
    matrix, oracle = case
    if isinstance(matrix, matrices.SquareMatrix):
        np.testing.assert_allclose(
            matrix.log_abs_det, np.linalg.slogdet(oracle)[1], atol=1e-8)


def test_inv(case):
    matrix, oracle = case
    if isinstance(matrix, matrices.InvertibleMatrix):
        rng = _rng()
        v = rng.standard_normal(oracle.shape[0])
        np.testing.assert_allclose(
            matrix.inv @ v, np.linalg.solve(oracle, v), atol=1e-8)
        # double inverse returns to original action
        np.testing.assert_allclose(
            matrix.inv.inv @ v, oracle @ v, atol=1e-8)


def test_symmetric_eig(case):
    matrix, oracle = case
    if isinstance(matrix, matrices.SymmetricMatrix):
        np.testing.assert_allclose(
            np.sort(matrix.eigval), np.sort(np.linalg.eigvalsh(oracle)),
            atol=1e-8)
        eigvec = np.asarray(matrix.eigvec.array)
        eigval = np.asarray(matrix.eigval)
        np.testing.assert_allclose(
            eigvec @ np.diag(eigval) @ eigvec.T, oracle, atol=1e-8)


def test_pos_def_sqrt(case):
    matrix, oracle = case
    if isinstance(matrix, matrices.PositiveDefiniteMatrix):
        sqrt = np.asarray(matrix.sqrt.array)
        np.testing.assert_allclose(sqrt @ sqrt.T, oracle, atol=1e-8)


def test_pytree_roundtrip(case):
    matrix, oracle = case
    leaves, treedef = jax.tree_util.tree_flatten(matrix)
    rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
    np.testing.assert_allclose(rebuilt.array, oracle, atol=1e-10)


def test_jit_matmul(case):
    matrix, oracle = case
    rng = _rng()
    v = rng.standard_normal(oracle.shape[1])

    @jax.jit
    def f(m, x):
        return m @ x

    np.testing.assert_allclose(f(matrix, v), oracle @ v, atol=1e-9)


# ---------------------------------------------------------------------------
# Gradient oracles (reference: tests/test_matrices.py:330-359, but using
# jax.grad of dense slogdet / solve computations as the oracle)
# ---------------------------------------------------------------------------


def test_grad_log_abs_det_dense_pos_def():
    rng = _rng()
    posdef = _random_posdef(rng)
    matrix = matrices.DensePositiveDefiniteMatrix(posdef)
    oracle = jax.grad(lambda a: jnp.linalg.slogdet(a)[1])(jnp.asarray(posdef))
    np.testing.assert_allclose(matrix.grad_log_abs_det, oracle, atol=1e-8)


def test_grad_quadratic_form_inv_dense_pos_def():
    rng = _rng()
    posdef = _random_posdef(rng)
    v = rng.standard_normal(SIZE)
    matrix = matrices.DensePositiveDefiniteMatrix(posdef)
    oracle = jax.grad(
        lambda a: v @ jnp.linalg.solve(a, v))(jnp.asarray(posdef))
    np.testing.assert_allclose(
        matrix.grad_quadratic_form_inv(v), oracle, atol=1e-8)


def test_grad_log_abs_det_diagonal():
    rng = _rng()
    diag = np.abs(rng.standard_normal(SIZE)) + 0.5
    matrix = matrices.PositiveDiagonalMatrix(diag)
    oracle = jax.grad(lambda d: jnp.sum(jnp.log(d)))(jnp.asarray(diag))
    np.testing.assert_allclose(matrix.grad_log_abs_det, oracle, atol=1e-10)


def test_grad_quadratic_form_inv_diagonal():
    rng = _rng()
    diag = np.abs(rng.standard_normal(SIZE)) + 0.5
    v = rng.standard_normal(SIZE)
    matrix = matrices.PositiveDiagonalMatrix(diag)
    oracle = jax.grad(lambda d: jnp.sum(v**2 / d))(jnp.asarray(diag))
    np.testing.assert_allclose(
        matrix.grad_quadratic_form_inv(v), oracle, atol=1e-10)


def test_grad_log_abs_det_scaled_identity():
    matrix = matrices.PositiveScaledIdentityMatrix(1.7, SIZE)
    oracle = jax.grad(lambda s: SIZE * jnp.log(s))(1.7)
    np.testing.assert_allclose(matrix.grad_log_abs_det, oracle, atol=1e-10)


def test_grad_softabs():
    rng = _rng()
    sym = _random_sym(rng)
    v = rng.standard_normal(SIZE)
    matrix = matrices.SoftAbsRegularizedPositiveDefiniteMatrix(sym, 1.5)

    def log_det(h):
        ev = jnp.linalg.eigvalsh(h)
        return jnp.sum(jnp.log(ev / jnp.tanh(ev * 1.5)))

    oracle_ld = jax.grad(log_det)(jnp.asarray(sym))
    np.testing.assert_allclose(matrix.grad_log_abs_det, oracle_ld, atol=1e-7)

    def quad_form(h):
        ev, evec = jnp.linalg.eigh(h)
        lam = ev / jnp.tanh(ev * 1.5)
        return (v @ evec) @ ((evec.T @ v) / lam)

    oracle_qf = jax.grad(quad_form)(jnp.asarray(sym))
    np.testing.assert_allclose(
        matrix.grad_quadratic_form_inv(v), oracle_qf, atol=1e-7)


def test_grad_low_rank_update():
    rng = _rng()
    posdef = _random_posdef(rng)
    factor = rng.standard_normal((SIZE, 2))
    inner = _random_posdef(rng, 2)
    v = rng.standard_normal(SIZE)
    matrix = matrices.PositiveDefiniteLowRankUpdateMatrix(
        factor, matrices.DensePositiveDefiniteMatrix(posdef),
        matrices.DensePositiveDefiniteMatrix(inner))

    def full(f):
        return posdef + f @ inner @ f.T

    oracle_ld = jax.grad(
        lambda f: jnp.linalg.slogdet(full(f))[1])(jnp.asarray(factor))
    np.testing.assert_allclose(matrix.grad_log_abs_det, oracle_ld, atol=1e-7)
    oracle_qf = jax.grad(
        lambda f: v @ jnp.linalg.solve(full(f), v))(jnp.asarray(factor))
    np.testing.assert_allclose(
        matrix.grad_quadratic_form_inv(v), oracle_qf, atol=1e-7)


# ---------------------------------------------------------------------------
# Batched (vmap) behavior — the core TPU execution mode
# ---------------------------------------------------------------------------


def test_vmap_solve():
    rng = _rng()
    batch = np.stack([_random_posdef(rng) for _ in range(4)])
    vs = rng.standard_normal((4, SIZE))

    def solve(arr, v):
        return matrices.DensePositiveDefiniteMatrix(arr).inv @ v

    out = jax.vmap(solve)(jnp.asarray(batch), jnp.asarray(vs))
    for i in range(4):
        np.testing.assert_allclose(
            out[i], np.linalg.solve(batch[i], vs[i]), atol=1e-8)


def test_vmap_softabs_metric():
    rng = _rng()
    batch = np.stack([_random_sym(rng) for _ in range(4)])
    vs = rng.standard_normal((4, SIZE))

    def f(arr, v):
        m = matrices.SoftAbsRegularizedPositiveDefiniteMatrix(arr, 1.0)
        return m.inv @ v, m.log_abs_det

    outs, lads = jax.vmap(f)(jnp.asarray(batch), jnp.asarray(vs))
    for i in range(4):
        ev, evec = np.linalg.eigh(batch[i])
        lam = ev / np.tanh(ev)
        m = evec @ np.diag(lam) @ evec.T
        np.testing.assert_allclose(
            outs[i], np.linalg.solve(m, vs[i]), atol=1e-8)
        np.testing.assert_allclose(
            lads[i], np.linalg.slogdet(m)[1], atol=1e-8)


def test_invertible_matrix_product():
    rng = _rng()
    posdef = _random_posdef(rng)
    sq = rng.standard_normal((SIZE, SIZE))
    prod = (matrices.DensePositiveDefiniteMatrix(posdef)
            @ matrices.DenseSquareMatrix(sq))
    oracle = posdef @ sq
    v = rng.standard_normal(SIZE)
    assert isinstance(prod, matrices.InvertibleMatrixProduct)
    np.testing.assert_allclose(
        prod.inv @ v, np.linalg.solve(oracle, v), atol=1e-8)
    np.testing.assert_allclose(
        prod.log_abs_det, np.linalg.slogdet(oracle)[1], atol=1e-8)


def test_hash_and_eq():
    rng = _rng()
    posdef = _random_posdef(rng)
    m1 = matrices.DensePositiveDefiniteMatrix(posdef)
    m2 = matrices.DensePositiveDefiniteMatrix(posdef.copy())
    m3 = matrices.DensePositiveDefiniteMatrix(posdef * 2)
    assert m1 == m2
    assert hash(m1) == hash(m2)
    assert m1 != m3
