"""Coverage for every Riemannian system specialization.

Invariant (reversibility + energy) tests for scalar / diagonal / Cholesky /
dense metric functions with the implicit leapfrog integrator, plus parity
of system quantities against the reference for each specialization.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/reference/src")
import mici  # noqa: E402

from mici_tpu import integrators, systems  # noqa: E402
from mici_tpu.states import ChainState  # noqa: E402

SEED = 1337
DIM = 3


def j_nld(q):
    return 0.25 * jnp.sum(q**4) + 0.5 * jnp.sum(q**2)


def np_nld(q):
    return 0.25 * np.sum(q**4) + 0.5 * np.sum(q**2)


def np_grad(q):
    return q**3 + q


# metric parameter functions (jnp and numpy versions + their vjps)
def j_scalar_metric(q):
    return 1.0 + jnp.sum(q**2)


def np_scalar_metric(q):
    return 1.0 + np.sum(q**2)


def np_vjp_scalar(q):
    def vjp(v):
        return 2.0 * v * q

    return vjp


def j_diag_metric(q):
    return 1.0 + q**2


def np_diag_metric(q):
    return 1.0 + q**2


def np_vjp_diag(q):
    def vjp(v):
        return 2.0 * np.asarray(v) * q

    return vjp


def j_chol_metric(q):
    return jnp.diag(1.0 + q**2) + jnp.tril(
        0.1 * jnp.outer(q, q), k=-1,
    )


def np_chol_metric(q):
    return np.diag(1.0 + q**2) + np.tril(0.1 * np.outer(q, q), k=-1)


def np_vjp_chol(q):
    def vjp(v):
        v = np.asarray(v)
        out = 2.0 * np.diagonal(v) * q
        lower = np.tril(v, k=-1)
        out = out + 0.1 * (lower @ q + lower.T @ q)
        return out

    return vjp


def j_dense_metric(q):
    return jnp.eye(DIM) * (1.0 + jnp.sum(q**2)) + 0.1 * jnp.outer(q, q)


def np_dense_metric(q):
    return np.eye(DIM) * (1.0 + np.sum(q**2)) + 0.1 * np.outer(q, q)


def np_vjp_dense(q):
    def vjp(v):
        v = np.asarray(v)
        return (2.0 * q * np.trace(v)
                + 0.1 * (v @ q + v.T @ q))

    return vjp


SPECIALIZATIONS = {
    "scalar": (
        lambda: systems.ScalarRiemannianMetricSystem(
            j_nld, j_scalar_metric),
        lambda: mici.systems.ScalarRiemannianMetricSystem(
            np_nld, np_scalar_metric, grad_neg_log_dens=np_grad,
            vjp_metric_scalar_func=np_vjp_scalar),
    ),
    "diagonal": (
        lambda: systems.DiagonalRiemannianMetricSystem(
            j_nld, j_diag_metric),
        lambda: mici.systems.DiagonalRiemannianMetricSystem(
            np_nld, np_diag_metric, grad_neg_log_dens=np_grad,
            vjp_metric_diagonal_func=np_vjp_diag),
    ),
    "cholesky": (
        lambda: systems.CholeskyFactoredRiemannianMetricSystem(
            j_nld, j_chol_metric),
        lambda: mici.systems.CholeskyFactoredRiemannianMetricSystem(
            np_nld, np_chol_metric, grad_neg_log_dens=np_grad,
            vjp_metric_chol_func=np_vjp_chol),
    ),
    "dense": (
        lambda: systems.DenseRiemannianMetricSystem(
            j_nld, j_dense_metric),
        lambda: mici.systems.DenseRiemannianMetricSystem(
            np_nld, np_dense_metric, grad_neg_log_dens=np_grad,
            vjp_metric_func=np_vjp_dense),
    ),
}


def _init_state(system, seed=0, scale=0.4):
    rng = np.random.default_rng(SEED + seed)
    pos = rng.standard_normal(DIM) * scale
    state = system.prepare_state(ChainState(pos=pos, mom=None, dir=1))
    mom = system.sample_momentum(state, jax.random.PRNGKey(seed))
    return state.replace(mom=mom)


@pytest.mark.parametrize("name", list(SPECIALIZATIONS))
def test_system_quantities_match_reference(name):
    make_tpu, make_ref = SPECIALIZATIONS[name]
    tpu_system = make_tpu()
    ref_system = make_ref()
    rng = np.random.default_rng(SEED)
    for case in range(5):
        pos = rng.standard_normal(DIM) * 0.5
        mom = rng.standard_normal(DIM) * 0.5
        t_state = tpu_system.prepare_state(
            ChainState(pos=pos.copy(), mom=mom.copy(), dir=1))
        r_state = mici.states.ChainState(
            pos=pos.copy(), mom=mom.copy(), dir=1)
        np.testing.assert_allclose(
            float(tpu_system.h(t_state)), ref_system.h(r_state),
            rtol=1e-8)
        np.testing.assert_allclose(
            np.asarray(tpu_system.dh1_dpos(t_state)),
            ref_system.dh1_dpos(r_state), rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(tpu_system.dh2_dpos(t_state)),
            ref_system.dh2_dpos(r_state), rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(tpu_system.dh2_dmom(t_state)),
            ref_system.dh2_dmom(r_state), rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("name", list(SPECIALIZATIONS))
def test_implicit_leapfrog_invariants(name):
    make_tpu, _ = SPECIALIZATIONS[name]
    system = make_tpu()
    integrator = integrators.ImplicitLeapfrogIntegrator(
        system, step_size=0.03,
        fixed_point_solver_kwargs={"convergence_tol": 1e-12})

    @jax.jit
    def roundtrip(state):
        def step(s, _):
            return integrator.step(s), system.h(s)

        s, hs = jax.lax.scan(step, state, None, length=10)
        fwd_err = s.error
        s = s.replace(dir=-s.dir)
        s, _ = jax.lax.scan(step, s, None, length=10)
        return s, fwd_err, hs

    state = _init_state(system)
    out, fwd_err, hs = roundtrip(state)
    assert int(fwd_err) == 0
    assert int(out.error) == 0
    np.testing.assert_allclose(out.pos, state.pos, atol=1e-7)
    np.testing.assert_allclose(out.mom, state.mom, atol=1e-7)
    h0 = float(system.h(state))
    assert np.max(np.abs(np.asarray(hs) - h0)) < 0.1


def test_gaussian_constrained_dense_metric_parity():
    """GaussianDenseConstrained system with a *dense* metric: eigen-flow
    dh2_flow_dmom path (mici/systems.py:1161-1184)."""
    rng = np.random.default_rng(SEED)
    a = rng.standard_normal((3, 3))
    metric = a @ a.T + 3 * np.eye(3)

    def np_constr(q):
        return np.array([np.sum(q**2) - 1.0])

    def np_jacob(q):
        return 2.0 * q[None, :]

    def np_mhp(q):
        def mhp(m):
            return 2.0 * np.asarray(m)[0]

        return mhp

    def np_g_nld(q):
        return 0.5 * np.sum((q - 0.2) ** 2)

    def np_g_grad(q):
        return q - 0.2

    ref_system = mici.systems.GaussianDenseConstrainedEuclideanMetricSystem(
        np_g_nld, np_constr, metric=metric, grad_neg_log_dens=np_g_grad,
        jacob_constr=np_jacob, mhp_constr=np_mhp)

    def j_constr(q):
        return jnp.array([jnp.sum(q**2) - 1.0])

    tpu_system = systems.GaussianDenseConstrainedEuclideanMetricSystem(
        lambda q: 0.5 * jnp.sum((q - 0.2) ** 2), j_constr,
        metric=jnp.asarray(metric))

    solver_kwargs = {"constraint_tol": 1e-12, "position_tol": 1e-12}
    ref_integ = mici.integrators.ConstrainedLeapfrogIntegrator(
        ref_system, step_size=0.05, projection_solver_kwargs=solver_kwargs)
    tpu_integ = integrators.ConstrainedLeapfrogIntegrator(
        tpu_system, step_size=0.05, projection_solver_kwargs=solver_kwargs)

    pos = rng.standard_normal(3)
    pos /= np.linalg.norm(pos)
    mom = rng.standard_normal(3)
    ref_state = mici.states.ChainState(pos=pos.copy(), mom=mom.copy(), dir=1)
    ref_state.mom = ref_system.project_onto_cotangent_space(
        ref_state.mom, ref_state)
    tpu_state = tpu_system.prepare_state(ChainState(
        pos=pos.copy(), mom=np.asarray(ref_state.mom).copy(), dir=1))
    for _ in range(8):
        ref_state = ref_integ.step(ref_state)
        tpu_state = tpu_integ.step(tpu_state)
        assert int(tpu_state.error) == 0
    np.testing.assert_allclose(
        np.asarray(tpu_state.pos), ref_state.pos, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(tpu_state.mom), ref_state.mom, rtol=1e-6, atol=1e-8)
