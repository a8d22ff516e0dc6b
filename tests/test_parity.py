"""Trajectory-for-trajectory parity tests against the reference mici.

BASELINE.json requires the rebuild to match reference Mici (NumPy/SciPy
backend) trajectory-for-trajectory at tolerance on shared inputs.  These
tests import the reference library from /root/reference/src (pure Python)
as a *test oracle*: identical initial states and deterministic algorithm
parameters must produce matching integrator trajectories, adapter update
sequences and stage schedules.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/reference/src")

import mici  # noqa: E402  (reference implementation, used as oracle)

from mici_tpu import (  # noqa: E402
    adapters as t_adapters,
    integrators as t_integrators,
    solvers as t_solvers,
    stagers as t_stagers,
    systems as t_systems,
    transitions as t_transitions,
)
from mici_tpu.states import ChainState  # noqa: E402

SEED = 20240816
DIM = 4
N_STEP = 25
STEP_SIZE = 0.17


# -- shared model definitions (numpy for mici, jnp for mici_tpu) ------------


def np_nld(q):
    return 0.25 * np.sum(q**4) + 0.5 * np.sum(q**2)


def np_grad_nld(q):
    return q**3 + q


def j_nld(q):
    return 0.25 * jnp.sum(q**4) + 0.5 * jnp.sum(q**2)


def _roundtrip_states(rng):
    pos = rng.standard_normal(DIM)
    mom = rng.standard_normal(DIM)
    return pos, mom


METRICS = {
    "identity": None,
    "diag": np.abs(np.random.default_rng(SEED).standard_normal(DIM)) + 0.5,
    "dense": None,  # filled below
}
_a = np.random.default_rng(SEED + 1).standard_normal((DIM, DIM))
METRICS["dense"] = _a @ _a.T + DIM * np.eye(DIM)


@pytest.mark.parametrize("metric_name", list(METRICS))
@pytest.mark.parametrize("integrator_name", [
    "leapfrog", "bcss2", "bcss3", "bcss4",
])
def test_euclidean_trajectory_parity(metric_name, integrator_name):
    metric = METRICS[metric_name]
    ref_system = mici.systems.EuclideanMetricSystem(
        np_nld, metric=None if metric is None else np.asarray(metric),
        grad_neg_log_dens=np_grad_nld,
    )
    tpu_system = t_systems.EuclideanMetricSystem(
        j_nld, metric=None if metric is None else jnp.asarray(metric),
    )
    ref_cls = {
        "leapfrog": mici.integrators.LeapfrogIntegrator,
        "bcss2": mici.integrators.BCSSTwoStageIntegrator,
        "bcss3": mici.integrators.BCSSThreeStageIntegrator,
        "bcss4": mici.integrators.BCSSFourStageIntegrator,
    }[integrator_name]
    tpu_cls = {
        "leapfrog": t_integrators.LeapfrogIntegrator,
        "bcss2": t_integrators.BCSSTwoStageIntegrator,
        "bcss3": t_integrators.BCSSThreeStageIntegrator,
        "bcss4": t_integrators.BCSSFourStageIntegrator,
    }[integrator_name]
    ref_integ = ref_cls(ref_system, STEP_SIZE)
    tpu_integ = tpu_cls(tpu_system, STEP_SIZE)

    rng = np.random.default_rng(SEED + 2)
    pos, mom = _roundtrip_states(rng)

    ref_state = mici.states.ChainState(pos=pos.copy(), mom=mom.copy(), dir=1)
    tpu_state = tpu_system.prepare_state(
        ChainState(pos=pos.copy(), mom=mom.copy(), dir=1))
    for _ in range(N_STEP):
        ref_state = ref_integ.step(ref_state)
        tpu_state = tpu_integ.step(tpu_state)
    np.testing.assert_allclose(
        np.asarray(tpu_state.pos), ref_state.pos, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(tpu_state.mom), ref_state.mom, rtol=1e-9, atol=1e-9)
    # Hamiltonians agree too
    np.testing.assert_allclose(
        float(tpu_system.h(tpu_state)), ref_system.h(ref_state),
        rtol=1e-9, atol=1e-9)


def test_gaussian_euclidean_trajectory_parity():
    metric = METRICS["dense"]
    ref_system = mici.systems.GaussianEuclideanMetricSystem(
        np_nld, metric=metric, grad_neg_log_dens=np_grad_nld)
    tpu_system = t_systems.GaussianEuclideanMetricSystem(
        j_nld, metric=jnp.asarray(metric))
    ref_integ = mici.integrators.LeapfrogIntegrator(ref_system, STEP_SIZE)
    tpu_integ = t_integrators.LeapfrogIntegrator(tpu_system, STEP_SIZE)
    rng = np.random.default_rng(SEED + 3)
    pos, mom = _roundtrip_states(rng)
    ref_state = mici.states.ChainState(pos=pos.copy(), mom=mom.copy(), dir=1)
    tpu_state = tpu_system.prepare_state(
        ChainState(pos=pos.copy(), mom=mom.copy(), dir=1))
    for _ in range(N_STEP):
        ref_state = ref_integ.step(ref_state)
        tpu_state = tpu_integ.step(tpu_state)
    np.testing.assert_allclose(
        np.asarray(tpu_state.pos), ref_state.pos, rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(tpu_state.mom), ref_state.mom, rtol=1e-7, atol=1e-8)


# -- banana model with analytic derivatives for Riemannian parity -----------


def np_banana_nld(q):
    return 0.5 * q[0] ** 2 / 8.0 + 0.5 * (q[1] - q[0] ** 2 / 4.0) ** 2


def np_banana_grad(q):
    r = q[1] - q[0] ** 2 / 4.0
    return np.array([q[0] / 8.0 - r * q[0] / 2.0, r])


def np_banana_hess(q):
    h00 = 1.0 / 8.0 + 3.0 * q[0] ** 2 / 8.0 - q[1] / 2.0
    h01 = -q[0] / 2.0
    return np.array([[h00, h01], [h01, 1.0]])


def np_banana_mtp(q):
    def mtp(m):
        m = np.asarray(m)
        return np.array([
            m[0, 0] * 3.0 * q[0] / 4.0 - (m[0, 1] + m[1, 0]) / 2.0,
            -m[0, 0] / 2.0,
        ])

    return mtp


def j_banana_nld(q):
    return 0.5 * q[0] ** 2 / 8.0 + 0.5 * (q[1] - q[0] ** 2 / 4.0) ** 2


def test_banana_analytic_derivatives_match_autodiff():
    """Validate the hand-coded oracle derivatives against JAX autodiff."""
    rng = np.random.default_rng(SEED)
    q = rng.standard_normal(2)
    np.testing.assert_allclose(
        np_banana_grad(q), jax.grad(j_banana_nld)(jnp.asarray(q)),
        atol=1e-10)
    np.testing.assert_allclose(
        np_banana_hess(q),
        jax.hessian(j_banana_nld)(jnp.asarray(q)), atol=1e-10)
    m = rng.standard_normal((2, 2))
    tress = jax.jacfwd(jax.hessian(j_banana_nld))(jnp.asarray(q))
    np.testing.assert_allclose(
        np_banana_mtp(q)(m), np.einsum("ij,ijk->k", m, np.asarray(tress)),
        atol=1e-10)


def test_softabs_riemannian_trajectory_parity():
    """Implicit leapfrog on SoftAbs metric matches reference trajectory."""
    softabs_coeff = 1.2
    ref_system = mici.systems.SoftAbsRiemannianMetricSystem(
        np_banana_nld, grad_neg_log_dens=np_banana_grad,
        hess_neg_log_dens=np_banana_hess,
        mtp_neg_log_dens=np_banana_mtp, softabs_coeff=softabs_coeff)
    tpu_system = t_systems.SoftAbsRiemannianMetricSystem(
        j_banana_nld, softabs_coeff=softabs_coeff)
    solver_kwargs = {"convergence_tol": 1e-12, "max_iters": 100}
    ref_integ = mici.integrators.ImplicitLeapfrogIntegrator(
        ref_system, step_size=0.1,
        fixed_point_solver_kwargs=solver_kwargs)
    tpu_integ = t_integrators.ImplicitLeapfrogIntegrator(
        tpu_system, step_size=0.1,
        fixed_point_solver_kwargs=solver_kwargs)
    rng = np.random.default_rng(SEED + 4)
    pos = rng.standard_normal(2) * 0.5
    mom = rng.standard_normal(2) * 0.5
    ref_state = mici.states.ChainState(pos=pos.copy(), mom=mom.copy(), dir=1)
    tpu_state = tpu_system.prepare_state(
        ChainState(pos=pos.copy(), mom=mom.copy(), dir=1))
    for _ in range(10):
        ref_state = ref_integ.step(ref_state)
        tpu_state = tpu_integ.step(tpu_state)
        assert int(tpu_state.error) == 0
    np.testing.assert_allclose(
        np.asarray(tpu_state.pos), ref_state.pos, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(tpu_state.mom), ref_state.mom, rtol=1e-6, atol=1e-7)


def test_implicit_midpoint_trajectory_parity():
    ref_system = mici.systems.EuclideanMetricSystem(
        np_nld, grad_neg_log_dens=np_grad_nld)
    tpu_system = t_systems.EuclideanMetricSystem(j_nld)
    solver_kwargs = {"convergence_tol": 1e-12}
    ref_integ = mici.integrators.ImplicitMidpointIntegrator(
        ref_system, step_size=0.1,
        fixed_point_solver_kwargs=solver_kwargs)
    tpu_integ = t_integrators.ImplicitMidpointIntegrator(
        tpu_system, step_size=0.1,
        fixed_point_solver_kwargs=solver_kwargs)
    rng = np.random.default_rng(SEED + 5)
    pos, mom = _roundtrip_states(rng)
    ref_state = mici.states.ChainState(pos=pos.copy(), mom=mom.copy(), dir=1)
    tpu_state = tpu_system.prepare_state(
        ChainState(pos=pos.copy(), mom=mom.copy(), dir=1))
    for _ in range(10):
        ref_state = ref_integ.step(ref_state)
        tpu_state = tpu_integ.step(tpu_state)
        assert int(tpu_state.error) == 0
    np.testing.assert_allclose(
        np.asarray(tpu_state.pos), ref_state.pos, rtol=1e-8, atol=1e-8)


# -- constrained trajectory parity ------------------------------------------


def np_constr(q):
    return np.array([np.sum(q**2) - 1.0])


def np_jacob_constr(q):
    return 2.0 * q[None, :]


def j_constr(q):
    return jnp.array([jnp.sum(q**2) - 1.0])


def np_sphere_nld(q):
    return 0.5 * np.sum((q - 0.3) ** 2)


def np_sphere_grad(q):
    return q - 0.3


def j_sphere_nld(q):
    return 0.5 * jnp.sum((q - 0.3) ** 2)


@pytest.mark.parametrize("solver_name", ["quasi_newton", "newton"])
def test_constrained_trajectory_parity(solver_name):
    ref_solver = {
        "quasi_newton":
            mici.solvers.solve_projection_onto_manifold_quasi_newton,
        "newton": mici.solvers.solve_projection_onto_manifold_newton,
    }[solver_name]
    tpu_solver = {
        "quasi_newton":
            t_solvers.solve_projection_onto_manifold_quasi_newton,
        "newton": t_solvers.solve_projection_onto_manifold_newton,
    }[solver_name]
    ref_system = mici.systems.DenseConstrainedEuclideanMetricSystem(
        np_sphere_nld, np_constr, dens_wrt_hausdorff=True,
        grad_neg_log_dens=np_sphere_grad, jacob_constr=np_jacob_constr)
    tpu_system = t_systems.DenseConstrainedEuclideanMetricSystem(
        j_sphere_nld, j_constr, dens_wrt_hausdorff=True)
    solver_kwargs = {"constraint_tol": 1e-12, "position_tol": 1e-12}
    ref_integ = mici.integrators.ConstrainedLeapfrogIntegrator(
        ref_system, step_size=0.08, projection_solver=ref_solver,
        projection_solver_kwargs=solver_kwargs)
    tpu_integ = t_integrators.ConstrainedLeapfrogIntegrator(
        tpu_system, step_size=0.08, projection_solver=tpu_solver,
        projection_solver_kwargs=solver_kwargs)
    rng = np.random.default_rng(SEED + 6)
    pos = rng.standard_normal(3)
    pos = pos / np.linalg.norm(pos)
    mom = rng.standard_normal(3)
    # project momentum with reference system for identical starting point
    ref_state = mici.states.ChainState(pos=pos.copy(), mom=mom.copy(), dir=1)
    ref_state.mom = ref_system.project_onto_cotangent_space(
        ref_state.mom, ref_state)
    tpu_state = tpu_system.prepare_state(
        ChainState(pos=pos.copy(), mom=np.asarray(ref_state.mom).copy(),
                   dir=1))
    for _ in range(15):
        ref_state = ref_integ.step(ref_state)
        tpu_state = tpu_integ.step(tpu_state)
        assert int(tpu_state.error) == 0
    np.testing.assert_allclose(
        np.asarray(tpu_state.pos), ref_state.pos, rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(tpu_state.mom), ref_state.mom, rtol=1e-7, atol=1e-8)


def test_constrained_non_hausdorff_trajectory_parity():
    """Gram log-determinant correction path (dens_wrt_hausdorff=False)."""

    def np_mhp_constr(q):
        def mhp(m):
            # constr hessian: hess[0] = 2 I; mhp(m)[k] = sum_i m[0,k]*2
            return 2.0 * np.asarray(m)[0]

        return mhp

    ref_system = mici.systems.DenseConstrainedEuclideanMetricSystem(
        np_sphere_nld, np_constr, dens_wrt_hausdorff=False,
        grad_neg_log_dens=np_sphere_grad, jacob_constr=np_jacob_constr,
        mhp_constr=np_mhp_constr)
    tpu_system = t_systems.DenseConstrainedEuclideanMetricSystem(
        j_sphere_nld, j_constr, dens_wrt_hausdorff=False)
    solver_kwargs = {"constraint_tol": 1e-12, "position_tol": 1e-12}
    ref_integ = mici.integrators.ConstrainedLeapfrogIntegrator(
        ref_system, step_size=0.08, projection_solver_kwargs=solver_kwargs)
    tpu_integ = t_integrators.ConstrainedLeapfrogIntegrator(
        tpu_system, step_size=0.08, projection_solver_kwargs=solver_kwargs)
    rng = np.random.default_rng(SEED + 7)
    pos = rng.standard_normal(3)
    pos = pos / np.linalg.norm(pos)
    mom = rng.standard_normal(3)
    ref_state = mici.states.ChainState(pos=pos.copy(), mom=mom.copy(), dir=1)
    ref_state.mom = ref_system.project_onto_cotangent_space(
        ref_state.mom, ref_state)
    tpu_state = tpu_system.prepare_state(
        ChainState(pos=pos.copy(), mom=np.asarray(ref_state.mom).copy(),
                   dir=1))
    for _ in range(10):
        ref_state = ref_integ.step(ref_state)
        tpu_state = tpu_integ.step(tpu_state)
        assert int(tpu_state.error) == 0
    np.testing.assert_allclose(
        np.asarray(tpu_state.pos), ref_state.pos, rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(
        float(tpu_system.h1(tpu_state)), ref_system.h1(ref_state),
        rtol=1e-8)


# -- adapter parity ---------------------------------------------------------


def test_dual_averaging_update_sequence_parity():
    """Same synthetic accept-stat sequence -> same step size sequence."""
    ref_system = mici.systems.EuclideanMetricSystem(
        np_nld, grad_neg_log_dens=np_grad_nld)
    tpu_system = t_systems.EuclideanMetricSystem(j_nld)
    ref_integ = mici.integrators.LeapfrogIntegrator(ref_system)
    tpu_integ = t_integrators.LeapfrogIntegrator(tpu_system)
    ref_trans = mici.transitions.MultinomialDynamicIntegrationTransition(
        ref_system, ref_integ)
    tpu_trans = t_transitions.MultinomialDynamicIntegrationTransition(
        tpu_system, tpu_integ)
    ref_adapter = mici.adapters.DualAveragingStepSizeAdapter()
    tpu_adapter = t_adapters.DualAveragingStepSizeAdapter()

    rng = np.random.default_rng(SEED + 8)
    pos, mom = _roundtrip_states(rng)
    ref_state = mici.states.ChainState(pos=pos.copy(), mom=mom.copy(), dir=1)
    tpu_state = tpu_system.prepare_state(
        ChainState(pos=pos.copy(), mom=mom.copy(), dir=1))

    ref_adapt_state = ref_adapter.initialize(ref_state, ref_trans)
    tpu_adapt_state, tpu_params = tpu_adapter.initialize(
        tpu_state, tpu_trans)
    # identical coarse init step size search result
    np.testing.assert_allclose(
        float(tpu_params["step_size"]), ref_integ.step_size, rtol=1e-10)

    accept_stats = rng.uniform(0.2, 1.0, size=50)
    for a in accept_stats:
        stats = {"accept_stat": float(a)}
        ref_adapter.update(ref_adapt_state, ref_state, stats, ref_trans)
        tpu_adapt_state, tpu_params = tpu_adapter.update(
            tpu_adapt_state, tpu_state, stats, tpu_params)
        np.testing.assert_allclose(
            float(tpu_params["step_size"]), ref_integ.step_size,
            rtol=1e-8)
    # finalize: smoothed value
    ref_adapter.finalize(ref_adapt_state, ref_state, ref_trans, None)
    tpu_trans_final, _ = tpu_adapter.finalize(
        jax.tree_util.tree_map(lambda x: jnp.asarray(x)[None],
                               tpu_adapt_state),
        None, tpu_trans, None)
    np.testing.assert_allclose(
        float(tpu_trans_final.integrator.step_size), ref_integ.step_size,
        rtol=1e-8)


@pytest.mark.parametrize("adapter_type", ["variance", "covariance"])
def test_metric_adapter_parity(adapter_type):
    """Same position sequences across 3 chains -> same finalized metric."""
    ref_cls = {
        "variance": mici.adapters.OnlineVarianceMetricAdapter,
        "covariance": mici.adapters.OnlineCovarianceMetricAdapter,
    }[adapter_type]
    tpu_cls = {
        "variance": t_adapters.OnlineVarianceMetricAdapter,
        "covariance": t_adapters.OnlineCovarianceMetricAdapter,
    }[adapter_type]
    ref_system = mici.systems.EuclideanMetricSystem(
        np_nld, grad_neg_log_dens=np_grad_nld)
    tpu_system = t_systems.EuclideanMetricSystem(j_nld)
    ref_integ = mici.integrators.LeapfrogIntegrator(ref_system, 0.1)
    tpu_integ = t_integrators.LeapfrogIntegrator(tpu_system, 0.1)
    ref_trans = mici.transitions.MultinomialDynamicIntegrationTransition(
        ref_system, ref_integ)
    tpu_trans = t_transitions.MultinomialDynamicIntegrationTransition(
        tpu_system, tpu_integ)
    ref_adapter = ref_cls()
    tpu_adapter = tpu_cls()

    rng = np.random.default_rng(SEED + 9)
    n_chain, n_iter = 3, 40
    positions = rng.standard_normal((n_chain, n_iter, DIM))

    ref_adapt_states = []
    ref_states = []
    for c in range(n_chain):
        state = mici.states.ChainState(
            pos=positions[c, 0].copy(), mom=np.zeros(DIM), dir=1)
        a_state = ref_adapter.initialize(state, ref_trans)
        for i in range(n_iter):
            state.pos = positions[c, i].copy()
            ref_adapter.update(a_state, state, {}, ref_trans)
        ref_adapt_states.append(a_state)
        ref_states.append(state)
    ref_rngs = [np.random.default_rng(0) for _ in range(n_chain)]
    ref_adapter.finalize(ref_adapt_states, ref_states, ref_trans, ref_rngs)
    ref_metric = ref_trans.system.metric.array

    def run_chain(c):
        state = tpu_system.prepare_state(ChainState(
            pos=positions[c, 0], mom=np.zeros(DIM), dir=1))
        a_state, params = tpu_adapter.initialize(state, tpu_trans)
        for i in range(n_iter):
            a_state, params = tpu_adapter.update(
                a_state, state.replace(pos=jnp.asarray(positions[c, i])),
                {}, params)
        return a_state, state

    results = [run_chain(c) for c in range(n_chain)]
    batched_adapt = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[r[0] for r in results])
    batched_states = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[r[1] for r in results])
    tpu_trans_final, _ = tpu_adapter.finalize(
        batched_adapt, batched_states, tpu_trans, jax.random.PRNGKey(0))
    tpu_metric = np.asarray(tpu_trans_final.system.metric.array)
    np.testing.assert_allclose(tpu_metric, ref_metric, rtol=1e-8, atol=1e-10)


# -- stager parity ----------------------------------------------------------


@pytest.mark.parametrize("n_warm_up", [10, 50, 100, 150, 500, 1000, 1337])
def test_windowed_stager_schedule_parity(n_warm_up):
    class FastAdapter:
        is_fast = True

    class SlowAdapter:
        is_fast = False

    adapters_dict = {"integration_transition": [FastAdapter(),
                                                SlowAdapter()]}
    ref_stager = mici.stagers.WindowedWarmUpStager()
    tpu_stager = t_stagers.WindowedWarmUpStager()
    ref_stages = ref_stager.stages(n_warm_up, 100, adapters_dict, None)
    tpu_stages = tpu_stager.stages(n_warm_up, 100, adapters_dict, None)
    assert list(ref_stages) == list(tpu_stages)
    for key in ref_stages:
        assert ref_stages[key].n_iter == tpu_stages[key].n_iter
        assert ref_stages[key].record_stats == tpu_stages[key].record_stats


# -- termination criterion parity -------------------------------------------


def test_termination_criteria_parity():
    rng = np.random.default_rng(SEED + 10)
    ref_system = mici.systems.EuclideanMetricSystem(
        np_nld, grad_neg_log_dens=np_grad_nld)
    tpu_system = t_systems.EuclideanMetricSystem(j_nld)
    for _ in range(20):
        pos1, mom1 = rng.standard_normal((2, DIM))
        pos2, mom2 = rng.standard_normal((2, DIM))
        sum_mom = rng.standard_normal(DIM)
        s1 = mici.states.ChainState(pos=pos1, mom=mom1, dir=1)
        s2 = mici.states.ChainState(pos=pos2, mom=mom2, dir=1)
        t1 = tpu_system.prepare_state(ChainState(pos=pos1, mom=mom1, dir=1))
        t2 = tpu_system.prepare_state(ChainState(pos=pos2, mom=mom2, dir=1))
        ref_euc = mici.transitions.euclidean_no_u_turn_criterion(
            ref_system, s1, s2, sum_mom)
        tpu_euc = t_transitions.euclidean_no_u_turn_criterion(
            tpu_system, t1, t2, jnp.asarray(sum_mom))
        assert bool(ref_euc) == bool(tpu_euc)
        ref_rie = mici.transitions.riemannian_no_u_turn_criterion(
            ref_system, s1, s2, sum_mom)
        tpu_rie = t_transitions.riemannian_no_u_turn_criterion(
            tpu_system, t1, t2, jnp.asarray(sum_mom))
        assert bool(ref_rie) == bool(tpu_rie)


# -- fixed point solver parity ----------------------------------------------


def test_fixed_point_solver_parity():
    def np_func(x):
        return np.cos(x) * 0.9

    def j_func(x):
        return jnp.cos(x) * 0.9

    x0 = np.full(3, 0.4)
    ref_sol = mici.solvers.solve_fixed_point_direct(np_func, x0.copy())
    tpu_sol, err = t_solvers.solve_fixed_point_direct(
        j_func, jnp.asarray(x0))
    assert not bool(err)
    np.testing.assert_allclose(np.asarray(tpu_sol), ref_sol, atol=1e-9)

    ref_sol_s = mici.solvers.solve_fixed_point_steffensen(np_func, x0.copy())
    tpu_sol_s, err_s = t_solvers.solve_fixed_point_steffensen(
        j_func, jnp.asarray(x0))
    assert not bool(err_s)
    np.testing.assert_allclose(np.asarray(tpu_sol_s), ref_sol_s, atol=1e-9)


@pytest.mark.parametrize("metric_name", ["identity", "diag"])
def test_gaussian_euclidean_diag_metric_parity(metric_name):
    """Gaussian-split h2 flow (eigen rotation) for identity/diagonal metrics."""
    metric = None if metric_name == "identity" else METRICS["diag"]
    ref_system = mici.systems.GaussianEuclideanMetricSystem(
        np_nld, metric=None if metric is None else np.asarray(metric),
        grad_neg_log_dens=np_grad_nld)
    tpu_system = t_systems.GaussianEuclideanMetricSystem(
        j_nld, metric=None if metric is None else jnp.asarray(metric))
    ref_integ = mici.integrators.LeapfrogIntegrator(ref_system, STEP_SIZE)
    tpu_integ = t_integrators.LeapfrogIntegrator(tpu_system, STEP_SIZE)
    rng = np.random.default_rng(SEED + 11)
    pos, mom = _roundtrip_states(rng)
    ref_state = mici.states.ChainState(pos=pos.copy(), mom=mom.copy(), dir=1)
    tpu_state = tpu_system.prepare_state(
        ChainState(pos=pos.copy(), mom=mom.copy(), dir=1))
    for _ in range(N_STEP):
        ref_state = ref_integ.step(ref_state)
        tpu_state = tpu_integ.step(tpu_state)
    np.testing.assert_allclose(
        np.asarray(tpu_state.pos), ref_state.pos, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(tpu_state.mom), ref_state.mom, rtol=1e-8, atol=1e-9)


def test_bcss_gaussian_split_parity():
    """Symmetric composition over the Gaussian-split flows."""
    ref_system = mici.systems.GaussianEuclideanMetricSystem(
        np_nld, grad_neg_log_dens=np_grad_nld)
    tpu_system = t_systems.GaussianEuclideanMetricSystem(j_nld)
    ref_integ = mici.integrators.BCSSTwoStageIntegrator(
        ref_system, STEP_SIZE)
    tpu_integ = t_integrators.BCSSTwoStageIntegrator(
        tpu_system, STEP_SIZE)
    rng = np.random.default_rng(SEED + 12)
    pos, mom = _roundtrip_states(rng)
    ref_state = mici.states.ChainState(pos=pos.copy(), mom=mom.copy(), dir=1)
    tpu_state = tpu_system.prepare_state(
        ChainState(pos=pos.copy(), mom=mom.copy(), dir=1))
    for _ in range(N_STEP):
        ref_state = ref_integ.step(ref_state)
        tpu_state = tpu_integ.step(tpu_state)
    np.testing.assert_allclose(
        np.asarray(tpu_state.pos), ref_state.pos, rtol=1e-8, atol=1e-9)
