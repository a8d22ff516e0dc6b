"""Tests for masked iterative solvers.

Mirrors reference test strategy (mici tests/test_solvers.py): parameterized
convergent and divergent fixed-point problems; divergence produces error
flags (rather than the reference's ConvergenceError exceptions) and never
stalls a vmapped batch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mici_tpu import solvers

CONVERGENT = {
    # babylonian square root of 2: x -> (x + 2/x)/2
    "babylonian": (lambda x: 0.5 * (x + 2.0 / x), np.full(3, 1.0),
                   np.full(3, np.sqrt(2.0))),
    "cosine": (lambda x: jnp.cos(x), np.full(3, 0.5),
               np.full(3, 0.7390851332151607)),
    "ratio": (lambda x: (x + 3.0) / (x + 1.0), np.full(3, 1.0),
              np.full(3, np.sqrt(3.0))),
}

DIVERGENT = {
    "doubling": lambda x: 2.0 * x + 1.0,
    "quadratic": lambda x: x**2 + 1.0,
}

FIXED_POINT_SOLVERS = {
    "direct": solvers.solve_fixed_point_direct,
    "steffensen": solvers.solve_fixed_point_steffensen,
}


@pytest.mark.parametrize("solver_name", list(FIXED_POINT_SOLVERS))
@pytest.mark.parametrize("problem", list(CONVERGENT))
@pytest.mark.parametrize("norm", [solvers.maximum_norm,
                                  solvers.euclidean_norm])
def test_fixed_point_convergent(solver_name, problem, norm):
    solver = FIXED_POINT_SOLVERS[solver_name]
    func, x0, expected = CONVERGENT[problem]
    x, error = solver(func, jnp.asarray(x0), norm=norm)
    assert not bool(error)
    np.testing.assert_allclose(np.asarray(x), expected, atol=1e-8)


@pytest.mark.parametrize("solver_name,problem", [
    ("direct", "doubling"), ("direct", "quadratic"),
    # Steffensen solves linear problems exactly, so only the quadratic
    # problem is divergent for it (as in the reference parameterization).
    ("steffensen", "quadratic"),
])
def test_fixed_point_divergent_flags(solver_name, problem):
    solver = FIXED_POINT_SOLVERS[solver_name]
    func = DIVERGENT[problem]
    x, error = solver(func, jnp.full(3, 2.0))
    assert bool(error)


def test_fixed_point_max_iters_flags():
    # slow contraction that cannot converge in 2 iterations (direct) or a
    # nonlinear problem that needs more than 1 Steffensen iteration
    x, error = solvers.solve_fixed_point_direct(
        lambda x: 0.999 * x, jnp.full(3, 1.0), max_iters=2,
    )
    assert bool(error)
    x, error = solvers.solve_fixed_point_steffensen(
        lambda x: jnp.cos(x), jnp.full(3, 0.5), max_iters=1,
    )
    assert bool(error)


def test_fixed_point_vmap_mixed_convergence():
    """Divergent lanes flag without stalling convergent lanes."""

    def func(x):
        # lane-dependent behavior: scale > 1 diverges
        return x * jnp.array([0.5, 2.0, 0.3])

    def solve(x0):
        return solvers.solve_fixed_point_direct(
            lambda x: func(x), x0, max_iters=300,
        )

    # batched version with per-lane scaling via vmap over independent
    # problems
    def single(scale, x0):
        x, err = solvers.solve_fixed_point_direct(
            lambda x: scale * x, x0, max_iters=50,
        )
        return x, err

    scales = jnp.array([0.5, 2.0, 0.3])
    x0s = jnp.full((3, 2), 1.0)
    xs, errs = jax.vmap(single)(scales, x0s)
    assert not bool(errs[0])
    assert bool(errs[1])
    assert not bool(errs[2])
    np.testing.assert_allclose(np.asarray(xs[0]), 0.0, atol=1e-8)


def test_nan_produces_error_flag():
    def func(x):
        return jnp.sqrt(x - 10.0)  # NaN for x < 10

    x, error = solvers.solve_fixed_point_direct(func, jnp.full(2, 1.0))
    assert bool(error)


def test_norms():
    v = jnp.asarray([-3.0, 4.0])
    np.testing.assert_allclose(solvers.maximum_norm(v), 4.0)
    np.testing.assert_allclose(solvers.euclidean_norm(v), 5.0)


def test_default_tol_dtype_aware():
    # f64 (and wider) keeps the reference value exactly
    assert solvers.default_tol(jnp.float64, 1e-9) == 1e-9
    assert solvers.default_tol(np.float64, 2e-8) == 2e-8
    # f32 (and narrower) rescales above the f32 residual floor
    assert solvers.default_tol(jnp.float32, 1e-9) == pytest.approx(1e-6)
    assert solvers.default_tol(jnp.bfloat16, 1e-8) == pytest.approx(1e-5)


def test_resolve_tol_explicit_value_wins():
    assert solvers._resolve_tol(3e-4, jnp.float32, 1e-9) == 3e-4
    assert solvers._resolve_tol(None, jnp.float32, 1e-9) == pytest.approx(
        1e-6)
    assert solvers._resolve_tol(None, jnp.float64, 1e-9) == 1e-9


def test_default_tol_scale_aware():
    # f32 default tolerances are proportionate to problem scale so a
    # small-scale problem keeps a proportionately small residual bound.
    assert float(solvers.default_tol(jnp.float32, 1e-9, scale=1.0)) == (
        pytest.approx(1e-6)
    )
    assert float(solvers.default_tol(jnp.float32, 1e-9, scale=1e-3)) == (
        pytest.approx(1e-9)
    )
    assert float(solvers.default_tol(jnp.float32, 1e-9, scale=1e3)) == (
        pytest.approx(1e-3)
    )
    # Scale is floored at machine epsilon so a zero-scale problem keeps a
    # nonzero (attainable) tolerance.
    assert float(solvers.default_tol(jnp.float32, 1e-9, scale=0.0)) > 0
    # f64 stays absolute (reference parity) regardless of scale.
    assert solvers.default_tol(jnp.float64, 1e-9, scale=1e-3) == 1e-9
    # Explicit tolerances are always absolute.
    assert solvers._resolve_tol(3e-4, jnp.float32, 1e-9, scale=1e-3) == 3e-4


def test_fixed_point_small_scale_residual_proportionate():
    # Fixed point of x -> (x + c / x) / 2 is sqrt(c); with c ~ 1e-8 the
    # solution is ~1e-4-scaled, so the f32 scale-aware default tolerance
    # must bound the residual proportionately (~1e-10 rather than the
    # blanket absolute 1e-6 that would accept a 1% relative error).
    c = jnp.float32(1e-8)

    def func(x):
        return 0.5 * (x + c / x)

    x0 = jnp.full((1,), 1e-3, dtype=jnp.float32)
    x, error = solvers.solve_fixed_point_direct(func, x0)
    assert not bool(error)
    resid = float(np.abs(np.asarray(func(x) - x)).max())
    assert resid < 5e-9
    np.testing.assert_allclose(np.asarray(x), 1e-4, rtol=1e-4)


ACCELERATED_SOLVERS = {
    "newton": solvers.solve_fixed_point_newton,
    "anderson": solvers.solve_fixed_point_anderson,
}


@pytest.mark.parametrize("solver_name", list(ACCELERATED_SOLVERS))
@pytest.mark.parametrize("problem", list(CONVERGENT))
def test_accelerated_fixed_point_convergent(solver_name, problem):
    func, x0, expected = CONVERGENT[problem]
    solver = ACCELERATED_SOLVERS[solver_name]
    x, error = solver(func, jnp.asarray(x0))
    assert not bool(error)
    np.testing.assert_allclose(np.asarray(x), expected, rtol=1e-7)


@pytest.mark.parametrize("solver_name,problem", [
    # Newton solves the linear "doubling" problem exactly (it finds the
    # x = -1 fixed point in one step, like Steffensen), so only the
    # quadratic problem — whose residual has no real root — is divergent.
    ("newton", "quadratic"),
    ("anderson", "doubling"),
    ("anderson", "quadratic"),
])
def test_accelerated_fixed_point_divergent_flags(solver_name, problem):
    func = DIVERGENT[problem]
    solver = ACCELERATED_SOLVERS[solver_name]
    _x, error = solver(func, jnp.full(3, 1.0))
    assert bool(error)


def _min_iters_to_converge(solver, func, x0, limit=100, **kwargs):
    # minimal max_iters for which the solver clears the failure flag
    # (iteration counts are invisible to host code inside while_loop)
    for k in range(1, limit + 1):
        _x, err = solver(func, jnp.asarray(x0), max_iters=k, **kwargs)
        if not bool(err):
            return k
    return limit + 1


def test_acceleration_reduces_iterations():
    """Anderson/Newton must beat direct iteration on a slowly-contracting
    fixed point (the motivation: fewer vmapped lockstep rounds)."""
    # x -> cos(x): contraction factor ~0.67 — direct iteration is slow
    func, x0, expected = CONVERGENT["cosine"]
    n_direct = _min_iters_to_converge(
        solvers.solve_fixed_point_direct, func, x0)
    n_anderson = _min_iters_to_converge(
        solvers.solve_fixed_point_anderson, func, x0)
    n_newton = _min_iters_to_converge(
        solvers.solve_fixed_point_newton, func, x0, limit=20)
    assert n_anderson < n_direct
    assert n_newton < n_direct
    x, error = solvers.solve_fixed_point_newton(func, jnp.asarray(x0),
                                                max_iters=10)
    assert not bool(error)
    np.testing.assert_allclose(np.asarray(x), expected, rtol=1e-7)


@pytest.mark.parametrize("problem", list(CONVERGENT))
def test_fixed_point_unrolled_convergent(problem):
    func, x0, expected = CONVERGENT[problem]
    x, error = solvers.solve_fixed_point_unrolled(
        func, jnp.asarray(x0), n_iters=60,
    )
    assert not bool(error)
    np.testing.assert_allclose(np.asarray(x), expected, atol=1e-8)


def test_fixed_point_unrolled_flags_unconverged_and_nan():
    # Too few iterations of a slow contraction: final residual > tol.
    _, error = solvers.solve_fixed_point_unrolled(
        lambda x: 0.5 * (x + 2.0 / x), jnp.full(3, 100.0), n_iters=2,
    )
    assert bool(error)
    _, error = solvers.solve_fixed_point_unrolled(
        lambda x: x + jnp.nan, jnp.full(3, 1.0), n_iters=2,
    )
    assert bool(error)


def test_fixed_point_unrolled_is_static():
    # The unrolled solver must introduce no while_loop (static cost for
    # exact roofline FLOP accounting, benchmarks/roofline.py).
    jaxpr = jax.make_jaxpr(
        lambda x: solvers.solve_fixed_point_unrolled(
            lambda y: jnp.cos(y), x, n_iters=4,
        )[0],
    )(jnp.ones(3))
    assert "while" not in str(jaxpr)
    assert str(jaxpr).count("cos") == 4


def test_fixed_point_unrolled_matches_direct_trajectory():
    # Same math as direct iteration run for the same number of steps.
    func = lambda x: jnp.cos(x)  # noqa: E731
    x0 = jnp.full(3, 0.5)
    x_unrolled, _ = solvers.solve_fixed_point_unrolled(func, x0, n_iters=7)
    x_ref = x0
    for _ in range(7):
        x_ref = func(x_ref)
    np.testing.assert_allclose(np.asarray(x_unrolled), np.asarray(x_ref))
