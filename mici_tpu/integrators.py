"""Symplectic integrators for simulating Hamiltonian dynamics.

Reference: mici/integrators.py (984 LoC).  Integrators are pytree objects
holding their system (itself a pytree, so the adapter-tuned metric flows
through) and a ``step_size`` leaf (a traced scalar during warm-up so the
dual-averaging adapter can update it inside a compiled ``scan``).  A step
is ``integrator.step(state) -> new_state``; failures of iterative sub-steps
(solver non-convergence, reversibility-check violations) set bits in the
state's error bitmask rather than raising (mici/errors.py semantics), so
vmapped batches of chains are never stalled by a single diverging chain.
"""

from __future__ import annotations

import jax.numpy as jnp

from mici_tpu import errors
from mici_tpu._pytree import register_pytree
from mici_tpu.solvers import (
    _resolve_tol,
    maximum_norm,
    solve_fixed_point_direct,
    solve_projection_onto_manifold_newton,
)


class Integrator:
    """Base class for symplectic integrators.

    Reference: mici/integrators.py:30-89.
    """

    def __init__(self, system, step_size=None):
        self.system = system
        self.step_size = step_size

    def step(self, state):
        """Perform a single integrator step from a supplied state.

        The input state must have been passed through
        ``system.prepare_state`` (or be the output of a previous step);
        the returned state is likewise prepared.
        """
        if self.step_size is None:
            msg = (
                "Integrator `step_size` is `None`. This value should only be "
                "used if a step size adapter is being used to set the step "
                "size."
            )
            raise errors.AdaptationError(msg)
        return self._step(state, state.dir * self.step_size)

    def _reverse_tol(self, state, scale=None):
        # ``scale`` is the norm of the quantity the reversibility check
        # compares (position / momentum baseline), making the f32 default
        # tolerance proportionate to problem scale (see solvers.default_tol).
        return _resolve_tol(
            getattr(self, "reverse_check_tol", None), state.pos.dtype, 2e-8,
            scale=scale,
        )


class TractableFlowIntegrator(Integrator):
    """Base class for integrators of systems with tractable component flows.

    Reference: mici/integrators.py:92-131.
    """

    def __init__(self, system, step_size=None):
        if not hasattr(system, "h1_flow") or not hasattr(system, "h2_flow"):
            msg = (
                f"{type(self)} can only be used for systems with explicit "
                f"`h1_flow` and `h2_flow` Hamiltonian component flow maps. "
                f"For systems in which only `h1_flow` is available the "
                f"`ImplicitLeapfrogIntegrator` class may be used instead and "
                f"for systems in which neither `h1_flow` or `h2_flow` is "
                f"available the `ImplicitMidpointIntegrator` class may be "
                f"used."
            )
            raise ValueError(msg)
        super().__init__(system, step_size)


@register_pytree(data_fields=("system", "step_size"))
class LeapfrogIntegrator(TractableFlowIntegrator):
    r"""Leapfrog (Störmer-Verlet) integrator.

    ``Psi(t) = Phi_1(t/2) o Phi_2(t) o Phi_1(t/2)``.
    Reference: mici/integrators.py:134-173.  Exactly one gradient
    evaluation per step: the trailing half h1 flow reuses the gradient
    computed when ``h2_flow`` refreshed the state aux, and the leading half
    flow reuses the aux carried from the previous step.
    """

    def _step(self, state, time_step):
        state = self.system.h1_flow(state, 0.5 * time_step)
        state = self.system.h2_flow(state, time_step)
        return self.system.h1_flow(state, 0.5 * time_step)


@register_pytree(
    data_fields=("system", "step_size"),
    static_fields=("coefficients", "initial_h1_flow_step"),
)
class SymmetricCompositionIntegrator(TractableFlowIntegrator):
    r"""Symmetric composition of alternating h1/h2 flows.

    ``Psi(t) = A(a_S t) o B(b_S t) o ... o A(a_1 t) o B(b_1 t) o A(a_0 t)``
    with symmetric, consistent coefficients completed from the supplied free
    coefficients.  Reference: mici/integrators.py:176-276.
    """

    def __init__(self, system, free_coefficients, *, step_size=None,
                 initial_h1_flow_step=True):
        super().__init__(system, step_size)
        self.initial_h1_flow_step = initial_h1_flow_step
        n_free = len(free_coefficients)
        coefficients = list(free_coefficients)
        # Coefficient completion (mici/integrators.py:261-272): append the
        # central coefficients enforcing consistency sum(a) = sum(b) = 1,
        # then mirror for symmetry.
        coefficients.append(0.5 - sum(free_coefficients[n_free % 2::2]))
        coefficients.append(
            1 - 2 * sum(free_coefficients[(n_free + 1) % 2::2]),
        )
        self.coefficients = tuple(coefficients + coefficients[-2::-1])

    def _step(self, state, time_step):
        flow_a = (self.system.h1_flow if self.initial_h1_flow_step
                  else self.system.h2_flow)
        flow_b = (self.system.h2_flow if self.initial_h1_flow_step
                  else self.system.h1_flow)
        for i, coefficient in enumerate(self.coefficients):
            flow = flow_a if i % 2 == 0 else flow_b
            state = flow(state, coefficient * time_step)
        return state


class BCSSTwoStageIntegrator(SymmetricCompositionIntegrator):
    """Two-stage BCSS composition (a_0 = (3 - sqrt 3) / 6).

    Reference: mici/integrators.py:279-305 (Blanes, Casas & Sanz-Serna
    2014, eq. 6.4).
    """

    def __init__(self, system, step_size=None):
        a_0 = (3 - 3**0.5) / 6
        super().__init__(system, (a_0,), step_size=step_size,
                         initial_h1_flow_step=True)


class BCSSThreeStageIntegrator(SymmetricCompositionIntegrator):
    """Three-stage BCSS composition.

    Reference: mici/integrators.py:308-341 (BCSS 2014, eq. 6.7).
    """

    def __init__(self, system, step_size=None):
        a_0 = 0.11888010966548
        b_1 = 0.29619504261126
        super().__init__(system, (a_0, b_1), step_size=step_size,
                         initial_h1_flow_step=True)


class BCSSFourStageIntegrator(SymmetricCompositionIntegrator):
    """Four-stage BCSS composition.

    Reference: mici/integrators.py:344-378 (BCSS 2014, eq. 6.8).
    """

    def __init__(self, system, step_size=None):
        a_0 = 0.071353913450279725904
        b_1 = 0.191667800000000000000
        a_1 = 0.268548791161230105820
        super().__init__(system, (a_0, b_1, a_1), step_size=step_size,
                         initial_h1_flow_step=True)


@register_pytree(
    data_fields=("system", "step_size"),
    static_fields=(
        "reverse_check_tol", "reverse_check_norm", "fixed_point_solver",
        "fixed_point_solver_kwargs",
    ),
)
class ImplicitLeapfrogIntegrator(Integrator):
    r"""Implicit (generalized) leapfrog for non-separable Hamiltonians.

    ``Psi(t) = A(t/2) o B(t/2) o C(t/2) o C*(t/2) o B*(t/2) o A*(t/2)``
    with fixed-point solves in the implicit component maps B and C* and
    explicit reversibility checks of the implicit sub-steps.
    Reference: mici/integrators.py:381-544.  Solver non-convergence sets
    the CONVERGENCE error bit; reversibility-check failure sets the
    NON_REVERSIBLE bit.
    """

    def __init__(self, system, step_size=None, reverse_check_tol=None,
                 reverse_check_norm=maximum_norm,
                 fixed_point_solver=solve_fixed_point_direct,
                 fixed_point_solver_kwargs=None):
        super().__init__(system, step_size)
        # None resolves to a dtype-aware default at trace time
        # (2e-8 in f64, rescaled for f32; see solvers.default_tol).
        self.reverse_check_tol = reverse_check_tol
        self.reverse_check_norm = reverse_check_norm
        self.fixed_point_solver = fixed_point_solver
        self.fixed_point_solver_kwargs = tuple(sorted(
            (fixed_point_solver_kwargs or {}).items(),
        ))

    def _solve_fixed_point(self, func, x_init):
        return self.fixed_point_solver(
            func, x_init, **dict(self.fixed_point_solver_kwargs),
        )

    def _step_a(self, state, time_step):
        return self.system.h1_flow(state, time_step)

    def _dh2_dpos_fn(self, state):
        """Momentum-only dh2_dpos closure with position-fixed work hoisted
        outside the fixed-point loop (one metric-VJP forward per sub-step
        instead of one per solver iteration)."""
        if hasattr(self.system, "dh2_dpos_fn"):
            return self.system.dh2_dpos_fn(state)
        return lambda mom: self.system.dh2_dpos(state.replace(mom=mom))

    def _step_b_fwd(self, state, time_step):
        # Solve p' = p - t * dh2_dpos(q, p') for p' (position fixed, so the
        # aux metric stays valid across fixed-point iterations).
        mom_init = state.mom
        dh2_dpos = self._dh2_dpos_fn(state)

        def fixed_point_func(mom):
            return mom_init - time_step * dh2_dpos(mom)

        mom, fp_error = self._solve_fixed_point(fixed_point_func, mom_init)
        return state.replace(mom=mom).with_error_bit(
            errors.CONVERGENCE_BIT, fp_error,
        )

    def _step_b_adj(self, state, time_step):
        mom_init = state.mom
        state_explicit = state.replace(
            mom=state.mom - time_step * self.system.dh2_dpos(state),
        )
        state_back = self._step_b_fwd(state_explicit, -time_step)
        rev_diff = self.reverse_check_norm(state_back.mom - mom_init)
        rev_tol = self._reverse_tol(state, self.reverse_check_norm(mom_init))
        return state_explicit.with_error_bit(
            errors.NON_REVERSIBLE_BIT,
            (rev_diff > rev_tol) | jnp.isnan(rev_diff),
        ).with_error_bit(errors.CONVERGENCE_BIT, state_back.error != 0)

    def _step_c_fwd(self, state, time_step):
        pos_init = state.pos
        new_pos = state.pos + time_step * self.system.dh2_dmom(state)
        state_explicit = self.system.prepare_state(
            state.replace(pos=new_pos),
        )
        state_back = self._step_c_adj(state_explicit, -time_step)
        rev_diff = self.reverse_check_norm(state_back.pos - pos_init)
        rev_tol = self._reverse_tol(state, self.reverse_check_norm(pos_init))
        return state_explicit.with_error_bit(
            errors.NON_REVERSIBLE_BIT,
            (rev_diff > rev_tol) | jnp.isnan(rev_diff),
        ).with_error_bit(
            errors.CONVERGENCE_BIT, state_back.error != 0,
        )

    def _step_c_adj(self, state, time_step):
        pos_init = state.pos

        def fixed_point_func(pos):
            return pos_init + time_step * self.system.dh2_dmom(
                state.replace(pos=pos, aux={}),
            )

        pos, fp_error = self._solve_fixed_point(fixed_point_func, pos_init)
        return self.system.prepare_state(
            state.replace(pos=pos),
        ).with_error_bit(errors.CONVERGENCE_BIT, fp_error)

    def _step(self, state, time_step):
        state = self._step_a(state, time_step)
        state = self._step_b_fwd(state, time_step)
        state = self._step_c_fwd(state, time_step)
        state = self._step_c_adj(state, time_step)
        state = self._step_b_adj(state, time_step)
        return self._step_a(state, time_step)


@register_pytree(
    data_fields=("system", "step_size"),
    static_fields=(
        "reverse_check_tol", "reverse_check_norm", "fixed_point_solver",
        "fixed_point_solver_kwargs",
    ),
)
class ImplicitMidpointIntegrator(Integrator):
    r"""Implicit midpoint integrator for general Hamiltonians.

    ``Psi(t) = A(t/2) o A*(t/2)`` with an implicit Euler half-step solved
    by fixed-point iteration in the joint position-momentum space and an
    explicit reversibility check.  Reference: mici/integrators.py:547-681.
    """

    def __init__(self, system, step_size=None, reverse_check_tol=None,
                 reverse_check_norm=maximum_norm,
                 fixed_point_solver=solve_fixed_point_direct,
                 fixed_point_solver_kwargs=None):
        super().__init__(system, step_size)
        # None resolves to a dtype-aware default at trace time
        # (2e-8 in f64, rescaled for f32; see solvers.default_tol).
        self.reverse_check_tol = reverse_check_tol
        self.reverse_check_norm = reverse_check_norm
        self.fixed_point_solver = fixed_point_solver
        self.fixed_point_solver_kwargs = tuple(sorted(
            (fixed_point_solver_kwargs or {}).items(),
        ))

    def _solve_fixed_point(self, func, x_init):
        return self.fixed_point_solver(
            func, x_init, **dict(self.fixed_point_solver_kwargs),
        )

    def _step_a_fwd(self, state, time_step):
        dim = state.pos.shape[0]
        pos_mom_init = jnp.concatenate([state.pos, state.mom])

        def fixed_point_func(pos_mom):
            trial = state.replace(
                pos=pos_mom[:dim], mom=pos_mom[dim:], aux={},
            )
            return pos_mom_init + jnp.concatenate([
                time_step * self.system.dh_dmom(trial),
                -time_step * self.system.dh_dpos(trial),
            ])

        pos_mom, fp_error = self._solve_fixed_point(
            fixed_point_func, pos_mom_init,
        )
        return self.system.prepare_state(
            state.replace(pos=pos_mom[:dim], mom=pos_mom[dim:]),
        ).with_error_bit(errors.CONVERGENCE_BIT, fp_error)

    def _step_a_adj(self, state, time_step):
        state_prev = state
        new_state = self.system.prepare_state(state.replace(
            pos=state.pos + time_step * self.system.dh_dmom(state_prev),
            mom=state.mom - time_step * self.system.dh_dpos(state_prev),
        ))
        state_back = self._step_a_fwd(new_state, -time_step)
        rev_diff = self.reverse_check_norm(jnp.concatenate([
            state_back.pos - state_prev.pos,
            state_back.mom - state_prev.mom,
        ]))
        rev_tol = self._reverse_tol(state, self.reverse_check_norm(
            jnp.concatenate([state_prev.pos, state_prev.mom]),
        ))
        return new_state.with_error_bit(
            errors.NON_REVERSIBLE_BIT,
            (rev_diff > rev_tol) | jnp.isnan(rev_diff),
        ).with_error_bit(errors.CONVERGENCE_BIT, state_back.error != 0)

    def _step(self, state, time_step):
        state = self._step_a_fwd(state, time_step / 2)
        return self._step_a_adj(state, time_step / 2)


@register_pytree(
    data_fields=("system", "step_size"),
    static_fields=(
        "n_inner_step", "reverse_check_tol", "reverse_check_norm",
        "projection_solver", "projection_solver_kwargs",
    ),
)
class ConstrainedLeapfrogIntegrator(TractableFlowIntegrator):
    r"""Constrained (RATTLE / geodesic) leapfrog integrator.

    ``Psi(t) = A(t/2) o B(t/n)^n o A(t/2)`` where A is the h1 flow followed
    by cotangent-space projection and B is the h2 flow followed by a
    manifold retraction (projection solver), cotangent projection and an
    explicit reversibility check.  Reference: mici/integrators.py:684-984.
    """

    def __init__(self, system, step_size=None, n_inner_step=1,
                 reverse_check_tol=None, reverse_check_norm=maximum_norm,
                 projection_solver=solve_projection_onto_manifold_newton,
                 projection_solver_kwargs=None):
        super().__init__(system, step_size)
        self.n_inner_step = n_inner_step
        self.reverse_check_tol = reverse_check_tol
        self.reverse_check_norm = reverse_check_norm
        self.projection_solver = projection_solver
        self.projection_solver_kwargs = tuple(sorted(
            (projection_solver_kwargs or {}).items(),
        ))

    def _h2_flow_retraction_onto_manifold(self, state, state_prev, time_step,
                                          prepare=True):
        state = self.system.h2_flow(state, time_step, prepare=False)
        return self.projection_solver(
            state, state_prev, time_step, self.system,
            _prepare_result=prepare,
            **dict(self.projection_solver_kwargs),
        )

    def _project_onto_cotangent_space(self, state):
        return state.replace(
            mom=self.system.project_onto_cotangent_space(state.mom, state),
        )

    def _step_a(self, state, time_step):
        state = self.system.h1_flow(state, time_step)
        return self._project_onto_cotangent_space(state)

    def _step_b(self, state, time_step):
        # Reference: mici/integrators.py:951-979.
        time_step_inner = time_step / self.n_inner_step
        for _ in range(self.n_inner_step):
            state_prev = state
            state = self._h2_flow_retraction_onto_manifold(
                state, state_prev, time_step_inner,
            )
            state = self._project_onto_cotangent_space(state)
            state_back = self._h2_flow_retraction_onto_manifold(
                state, state, -time_step_inner, prepare=False,
            )
            rev_diff = self.reverse_check_norm(
                state_back.pos - state_prev.pos,
            )
            rev_tol = self._reverse_tol(
                state, self.reverse_check_norm(state_prev.pos),
            )
            state = state.with_error_bit(
                errors.NON_REVERSIBLE_BIT,
                (rev_diff > rev_tol) | jnp.isnan(rev_diff),
            ).with_error_bit(
                errors.CONVERGENCE_BIT, state_back.error != 0,
            )
        return state

    def _step(self, state, time_step):
        state = self._step_a(state, 0.5 * time_step)
        state = self._step_b(state, time_step)
        return self._step_a(state, 0.5 * time_step)


# Pytree registration for concrete subclasses (per-class, not inherited).
_SYMMETRIC_FIELDS = dict(
    data_fields=("system", "step_size"),
    static_fields=("coefficients", "initial_h1_flow_step"),
)
register_pytree(**_SYMMETRIC_FIELDS)(BCSSTwoStageIntegrator)
register_pytree(**_SYMMETRIC_FIELDS)(BCSSThreeStageIntegrator)
register_pytree(**_SYMMETRIC_FIELDS)(BCSSFourStageIntegrator)
