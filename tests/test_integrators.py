"""Integrator invariant tests.

Mirrors reference test strategy (mici tests/test_integrators.py:72-197):
exact reversibility under direction negation, approximate Hamiltonian
conservation over long trajectories, volume preservation (ensemble
determinant), and constraint preservation for constrained integrators,
crossed over integrators x systems x metric types x random states.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mici_tpu import integrators, matrices, solvers, systems
from mici_tpu.states import ChainState

SEED = 20200710
N_STATE = 2
SIZE = 5
N_STEP_REV = 16
N_STEP_H = 100
STEP_SIZE = 0.05


def _rng():
    return np.random.default_rng(SEED)


def _neg_log_dens_gaussian(q):
    return 0.5 * jnp.sum(q**2)


def _neg_log_dens_nonlinear(q):
    return 0.25 * jnp.sum(q**4) + 0.5 * jnp.sum(q**2)


def _metrics(rng):
    a = rng.standard_normal((SIZE, SIZE))
    posdef = a @ a.T + SIZE * np.eye(SIZE)
    return {
        "identity": None,
        "diagonal": matrices.PositiveDiagonalMatrix(
            np.abs(rng.standard_normal(SIZE)) + 0.5),
        "dense": matrices.DensePositiveDefiniteMatrix(posdef),
    }


def _make_cases():
    rng = _rng()
    cases = {}
    for metric_name, metric in _metrics(rng).items():
        for dens_name, nld in (
            ("gaussian", _neg_log_dens_gaussian),
            ("nonlinear", _neg_log_dens_nonlinear),
        ):
            system = systems.EuclideanMetricSystem(nld, metric=metric)
            int_makers = [("leapfrog", integrators.LeapfrogIntegrator)]
            # BCSS compositions: exercise on the dense-metric nonlinear
            # case only (full grid covered by the parity tests).
            if metric_name == "dense" and dens_name == "nonlinear":
                int_makers += [
                    ("bcss2", integrators.BCSSTwoStageIntegrator),
                    ("bcss3", integrators.BCSSThreeStageIntegrator),
                    ("bcss4", integrators.BCSSFourStageIntegrator),
                ]
            for int_name, make in int_makers:
                cases[f"{int_name}-euclid-{metric_name}-{dens_name}"] = (
                    system, make(system, STEP_SIZE))
            if metric_name == "identity":
                gsystem = systems.GaussianEuclideanMetricSystem(
                    nld, metric=metric)
                cases[f"leapfrog-gaussian-{metric_name}-{dens_name}"] = (
                    gsystem,
                    integrators.LeapfrogIntegrator(gsystem, STEP_SIZE))
    # Implicit integrators on Riemannian systems
    rsystem = systems.SoftAbsRiemannianMetricSystem(
        _neg_log_dens_nonlinear, softabs_coeff=1.0)
    cases["implicit_leapfrog-softabs"] = (
        rsystem,
        integrators.ImplicitLeapfrogIntegrator(
            rsystem, step_size=0.02,
            fixed_point_solver_kwargs={"convergence_tol": 1e-12}))
    dsystem = systems.DiagonalRiemannianMetricSystem(
        _neg_log_dens_nonlinear,
        metric_diagonal_func=lambda q: 1.0 + q**2)
    cases["implicit_leapfrog-diag_riemannian"] = (
        dsystem,
        integrators.ImplicitLeapfrogIntegrator(
            dsystem, step_size=0.02,
            fixed_point_solver_kwargs={"convergence_tol": 1e-12}))
    # Accelerated fixed-point solvers (Anderson / Newton) must preserve
    # the same integrator invariants as direct iteration.
    cases["implicit_leapfrog-softabs-anderson"] = (
        rsystem,
        integrators.ImplicitLeapfrogIntegrator(
            rsystem, step_size=0.02,
            fixed_point_solver=solvers.solve_fixed_point_anderson,
            fixed_point_solver_kwargs={"convergence_tol": 1e-12}))
    cases["implicit_leapfrog-softabs-newton"] = (
        rsystem,
        integrators.ImplicitLeapfrogIntegrator(
            rsystem, step_size=0.02,
            fixed_point_solver=solvers.solve_fixed_point_newton,
            fixed_point_solver_kwargs={"convergence_tol": 1e-12}))
    cases["implicit_midpoint-softabs"] = (
        rsystem,
        integrators.ImplicitMidpointIntegrator(
            rsystem, step_size=0.02,
            fixed_point_solver_kwargs={"convergence_tol": 1e-12}))
    cases["implicit_midpoint-euclid"] = (
        systems.EuclideanMetricSystem(_neg_log_dens_nonlinear),
        integrators.ImplicitMidpointIntegrator(
            systems.EuclideanMetricSystem(_neg_log_dens_nonlinear),
            step_size=0.02,
            fixed_point_solver_kwargs={"convergence_tol": 1e-12}))
    return cases


CASES = _make_cases()


def _init_states(system, n=N_STATE, size=SIZE):
    rng = np.random.default_rng(SEED + 1)
    states = []
    for i in range(n):
        pos = rng.standard_normal(size) * 0.5
        state = ChainState(pos=pos, mom=None, dir=1)
        state = system.prepare_state(state)
        mom = system.sample_momentum(state, jax.random.PRNGKey(i))
        state = state.replace(mom=mom)
        states.append(state)
    return states


@pytest.fixture(params=list(CASES))
def case(request):
    return CASES[request.param]


def test_reversibility(case):
    """Integrate forward n steps, negate direction, integrate n steps back.

    Reference: mici tests/test_integrators.py:76-91.
    """
    system, integrator = case

    @jax.jit
    def roundtrip(state):
        def step(s, _):
            return integrator.step(s), None

        s, _ = jax.lax.scan(step, state, None, length=N_STEP_REV)
        fwd_error = s.error
        s = s.replace(dir=-s.dir)
        s, _ = jax.lax.scan(step, s, None, length=N_STEP_REV)
        return s, fwd_error

    for state in _init_states(system):
        s, fwd_error = roundtrip(state)
        assert int(fwd_error) == 0
        assert int(s.error) == 0
        np.testing.assert_allclose(s.pos, state.pos, atol=1e-7)
        np.testing.assert_allclose(s.mom, state.mom, atol=1e-7)


def test_hamiltonian_conservation(case):
    """Hamiltonian approximately conserved along trajectory.

    Reference: mici tests/test_integrators.py:93-108.
    """
    system, integrator = case

    def run(state):
        h_init = system.h(state)

        def body(s, _):
            s = integrator.step(s)
            return s, system.h(s)

        _, hs = jax.lax.scan(body, state, None, length=N_STEP_H)
        return h_init, hs

    run_jit = jax.jit(run)
    for state in _init_states(system):
        h_init, hs = run_jit(state)
        np.testing.assert_allclose(
            np.full(N_STEP_H, float(h_init)), np.asarray(hs), atol=0.3,
        )


def test_state_not_mutated(case):
    system, integrator = case
    for state in _init_states(system):
        pos0, mom0 = np.array(state.pos), np.array(state.mom)
        integrator.step(state)
        np.testing.assert_array_equal(state.pos, pos0)
        np.testing.assert_array_equal(state.mom, mom0)


def test_jit_and_vmap_step(case):
    system, integrator = case
    states = _init_states(system)
    batched = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *states)

    @jax.jit
    def stepper(intg, s):
        return intg.step(s)

    out = jax.vmap(stepper, in_axes=(None, 0))(integrator, batched)
    for i, state in enumerate(states):
        single = stepper(integrator, state)
        np.testing.assert_allclose(
            jax.tree_util.tree_map(lambda x: x[i], out).pos,
            single.pos, atol=1e-10)


@pytest.mark.parametrize("make_integrator", [
    integrators.LeapfrogIntegrator,
    integrators.BCSSTwoStageIntegrator,
    integrators.BCSSThreeStageIntegrator,
    integrators.BCSSFourStageIntegrator,
])
@pytest.mark.parametrize("nld", [
    _neg_log_dens_gaussian, _neg_log_dens_nonlinear,
])
def test_volume_preservation(make_integrator, nld):
    """|det(Jacobian of step map)| == 1 (symplectic => volume preserving).

    Reference: mici tests/test_integrators.py:127-142 (ensemble determinant
    check, here replaced by an exact autodiff Jacobian determinant).
    """
    system = systems.EuclideanMetricSystem(nld)
    integrator = make_integrator(system, STEP_SIZE)
    rng = np.random.default_rng(SEED)
    z0 = rng.standard_normal(2 * SIZE)

    def step_map(z):
        state = system.prepare_state(
            ChainState(pos=z[:SIZE], mom=z[SIZE:], dir=1))
        out = integrator.step(state)
        return jnp.concatenate([out.pos, out.mom])

    jac = jax.jacfwd(step_map)(jnp.asarray(z0))
    _, logdet = np.linalg.slogdet(np.asarray(jac))
    np.testing.assert_allclose(logdet, 0.0, atol=1e-10)


# ---------------------------------------------------------------------------
# Constrained integrator tests (reference: tests/test_integrators.py:145-197)
# ---------------------------------------------------------------------------


def _make_constrained_case(projection_solver):
    # Unit circle in 2D: c(q) = |q|^2 - 1
    def constr(q):
        return jnp.array([jnp.sum(q**2) - 1.0])

    system = systems.DenseConstrainedEuclideanMetricSystem(
        lambda q: 0.5 * jnp.sum(q**2), constr, dens_wrt_hausdorff=True)
    integrator = integrators.ConstrainedLeapfrogIntegrator(
        system, step_size=0.05, projection_solver=projection_solver,
        projection_solver_kwargs={"constraint_tol": 1e-12,
                                  "position_tol": 1e-11})
    return system, integrator


@pytest.mark.parametrize("projection_solver", [
    solvers.solve_projection_onto_manifold_quasi_newton,
    solvers.solve_projection_onto_manifold_newton,
    solvers.solve_projection_onto_manifold_newton_with_line_search,
])
def test_constrained_leapfrog(projection_solver):
    system, integrator = _make_constrained_case(projection_solver)
    rng = np.random.default_rng(SEED)
    theta = rng.uniform(0, 2 * np.pi)
    pos = np.array([np.cos(theta), np.sin(theta)])
    state = system.prepare_state(ChainState(pos=pos, mom=None, dir=1))
    mom = system.sample_momentum(state, jax.random.PRNGKey(0))
    state = state.replace(mom=mom)

    @jax.jit
    def forward(state):
        def step(s, _):
            s = integrator.step(s)
            outs = (
                system.constr(s),
                system.jacob_constr(s) @ system.dh2_dmom(s),
                s.error,
                system.h(s),
            )
            return s, outs

        return jax.lax.scan(step, state, None, length=20)

    # constraint and cotangency preserved along trajectory
    s, (constrs, cotangency, step_errors, hs) = forward(state)
    assert int(np.max(np.abs(np.asarray(step_errors)))) == 0
    np.testing.assert_allclose(np.asarray(constrs), 0.0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(cotangency), 0.0, atol=1e-8)

    # Hamiltonian conservation
    h0 = float(system.h(state))
    assert np.max(np.abs(np.asarray(hs) - h0)) < 0.1

    # reversibility
    s, _ = forward(s.replace(dir=-s.dir))
    np.testing.assert_allclose(s.pos, state.pos, atol=1e-6)
    np.testing.assert_allclose(s.mom, state.mom, atol=1e-6)


def test_constrained_leapfrog_small_scale_f32_residuals_proportionate():
    """Scale-aware f32 default tolerances on a 1e-3-sized constraint.

    With the blanket absolute f32 rescale (1e-9 -> 1e-6) a circle of
    radius 1e-3 would accept constraint residuals as large as the
    constraint scale itself (|q|^2 - r^2 ~ 1e-6).  The scale-aware
    defaults bound residuals proportionately (~1e-9 for 1e-3-scaled
    positions).
    """
    r = 1e-3

    def constr(q):
        return jnp.array([jnp.sum(q**2) - r**2])

    system = systems.DenseConstrainedEuclideanMetricSystem(
        lambda q: jnp.sum(q**2) / (2 * r**2), constr,
        dens_wrt_hausdorff=True)
    # default (None) tolerances: these must resolve scale-aware in f32
    integrator = integrators.ConstrainedLeapfrogIntegrator(
        system, step_size=5e-7)
    pos = np.array([r, 0.0], dtype=np.float32)
    state = system.prepare_state(ChainState(pos=pos, mom=None, dir=1))
    # O(1) momentum (identity metric): velocities O(1), so tiny step size
    mom = jnp.asarray([0.0, 1.0], dtype=jnp.float32)
    state = state.replace(mom=mom)

    @jax.jit
    def forward(state):
        def step(s, _):
            s = integrator.step(s)
            return s, (system.constr(s), s.error)

        return jax.lax.scan(step, state, None, length=20)

    s, (constrs, step_errors) = forward(state)
    assert s.pos.dtype == jnp.float32
    assert int(np.max(np.abs(np.asarray(step_errors)))) == 0
    # residuals proportionate to the constraint scale (r^2 = 1e-6):
    # bounded by ~1e-9, three orders below the blanket absolute 1e-6
    assert float(np.max(np.abs(np.asarray(constrs)))) < 5e-9


def test_constrained_gaussian_system():
    """GaussianDenseConstrained system with torus-like constraint."""

    def constr(q):
        return jnp.array([jnp.sum(q**2) - 1.0])

    system = systems.GaussianDenseConstrainedEuclideanMetricSystem(
        lambda q: 0.5 * jnp.sum((q - 0.5)**2), constr)
    integrator = integrators.ConstrainedLeapfrogIntegrator(
        system, step_size=0.05,
        projection_solver_kwargs={"constraint_tol": 1e-12,
                                  "position_tol": 1e-11})
    pos = np.array([1.0, 0.0, 0.0])
    state = system.prepare_state(ChainState(pos=pos, mom=None, dir=1))
    mom = system.sample_momentum(state, jax.random.PRNGKey(1))
    state = state.replace(mom=mom)

    @jax.jit
    def forward(state):
        def step(s, _):
            s = integrator.step(s)
            return s, (system.constr(s), s.error)

        return jax.lax.scan(step, state, None, length=10)

    s, (constrs, step_errors) = forward(state)
    assert int(np.max(np.abs(np.asarray(step_errors)))) == 0
    np.testing.assert_allclose(np.asarray(constrs), 0.0, atol=1e-8)
    # reversibility
    s, _ = forward(s.replace(dir=-s.dir))
    np.testing.assert_allclose(s.pos, state.pos, atol=1e-6)


def test_divergent_step_sets_error_flag():
    """A pathologically large step should flag, not raise or hang."""
    system = systems.SoftAbsRiemannianMetricSystem(
        _neg_log_dens_nonlinear, softabs_coeff=1.0)
    integrator = integrators.ImplicitLeapfrogIntegrator(
        system, step_size=50.0,
        fixed_point_solver_kwargs={"max_iters": 10})
    state = system.prepare_state(
        ChainState(pos=np.full(SIZE, 2.0), mom=np.full(SIZE, 5.0), dir=1))
    stepped = integrator.step(state)
    assert int(stepped.error) != 0
