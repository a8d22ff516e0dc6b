"""Masked iterative solvers for implicit and constrained integrators.

Reference: mici/solvers.py (fixed-point solvers at :47-154, manifold
projection solvers at :195-614).  The reference raises ``ConvergenceError``
mid-iteration; here every solver is a bounded ``lax.while_loop`` whose
per-chain failure state is a *flag*, so a diverging chain cannot stall a
vmapped batch (each chain's loop predicate goes false independently and the
vmapped loop runs until all lanes finish, cf. SURVEY.md §7).  Failure flags
are folded into the chain state's error bitmask by callers.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from mici_tpu import errors


#: Multiplier applied to the reference's f64 tolerances when running in
#: f32: 1e-9 -> 1e-6 (constraint/fixed-point), 1e-8 -> 1e-5 (position),
#: 2e-8 -> 2e-5 (reversibility), *per unit of problem scale*.  These sit
#: just above the f32 residual floor for O(1)-scaled problems (f32 eps ~
#: 1.2e-7); measured on the torus benchmark they give ~0% solver-failure
#: rates where the raw f64 values give >60%.
_F32_TOL_FACTOR = 1e3


def default_tol(dtype, f64_value, scale=None):
    """Dtype-aware tolerance: the reference (f64) value, rescaled for f32.

    The reference's solver/reversibility tolerances (e.g. ``1e-9``,
    mici/solvers.py:50) assume double precision; on TPU the default
    compute dtype is float32 whose error floor makes those unattainable.
    Tolerances passed as ``None`` resolve through this map.

    Args:
        dtype: Compute dtype the solver iterates in.
        f64_value: The reference's double-precision tolerance.
        scale: Optional problem-scale estimate (a norm of the iterate /
            position).  In reduced precision the attainable residual floor
            is *relative* — roughly ``eps * scale`` — so a fixed absolute
            rescale silently loosens small-scale problems and is
            unattainable for large-scale ones.  When given, the f32
            tolerance is proportional to ``max(scale, eps)`` so residual
            bounds stay proportionate to the data: an O(1e-3)-scaled
            constraint resolves to ~1e-9 rather than the blanket 1e-6.
            Ignored in f64 (reference parity: absolute tolerances).
    """
    f64_value = float(f64_value)
    if jnp.finfo(dtype).bits >= 64:
        return f64_value
    tol = f64_value * _F32_TOL_FACTOR
    if scale is None:
        return tol
    return tol * jnp.maximum(
        jnp.asarray(scale, dtype), jnp.finfo(dtype).eps,
    )


def _resolve_tol(tol, dtype, f64_value, scale=None):
    """Explicit user tolerances win (absolute); None is dtype/scale-aware."""
    return default_tol(dtype, f64_value, scale) if tol is None else tol


def euclidean_norm(vct):
    """Calculate the Euclidean (L-2) norm of a vector.

    Reference: mici/solvers.py:20-22.
    """
    return jnp.sqrt(jnp.sum(vct**2))


def maximum_norm(vct):
    """Calculate the maximum (L-infinity) norm of a vector.

    Reference: mici/solvers.py:25-27.
    """
    return jnp.max(jnp.abs(vct))


def solve_fixed_point_direct(func, x0, convergence_tol=None,
                             divergence_tol=1e10, max_iters=100,
                             norm=maximum_norm):
    """Solve fixed point equation ``func(x) = x`` using direct iteration.

    Reference: mici/solvers.py:47-94.

    Returns:
        Tuple ``(x, error_flag)`` with ``error_flag`` a boolean scalar that
        is True when the iteration diverged, produced NaNs, or failed to
        converge within ``max_iters``.
    """
    user_tol = convergence_tol

    def cond(carry):
        i, _x, converged, diverged = carry
        return (i < max_iters) & ~converged & ~diverged

    def body(carry):
        i, x, _, _ = carry
        x_new = func(x)
        error = norm(x_new - x)
        # Scale-aware default tolerance: the attainable f32 residual floor
        # is relative to the iterate's magnitude, so the default tolerance
        # tracks it (explicit tolerances stay absolute).
        tol = _resolve_tol(user_tol, x0.dtype, 1e-9, scale=norm(x_new))
        diverged = (error > divergence_tol) | jnp.isnan(error)
        converged = error < tol
        return (i + 1, x_new, converged, diverged)

    _, x, converged, diverged = lax.while_loop(
        cond, body, (jnp.int32(0), x0, jnp.bool_(False), jnp.bool_(False)),
    )
    return x, diverged | ~converged


def solve_fixed_point_unrolled(func, x0, n_iters=8, convergence_tol=None,
                               norm=maximum_norm):
    """Fixed-iteration direct fixed-point iteration, statically unrolled.

    Runs exactly ``n_iters`` applications of ``func`` with the loop
    unrolled at trace time (no ``lax.while_loop``): every chain in a
    vmapped batch does identical static work, the compiler can fuse and
    software-pipeline across iterations, and the compiled program's cost
    is a static function of the shapes — the solver of choice for
    compute-bound Riemannian regimes where the iteration body is
    factorization-dominated and early exit saves nothing under lockstep
    (benchmarks/roofline.py), and the building block for exact FLOP
    accounting of the hot path.  No reference counterpart (the
    reference's solvers all early-exit, mici/solvers.py:47-154); the
    convergence *check* semantics match :func:`solve_fixed_point_direct`
    applied to the final iterate only.

    Returns:
        Tuple ``(x, error_flag)`` with ``error_flag`` True when the final
        residual exceeds the tolerance or is NaN.
    """
    x_prev = x = x0
    for _ in range(max(1, int(n_iters))):
        x_prev = x
        x = func(x)
    error = norm(x - x_prev)
    tol = _resolve_tol(convergence_tol, x0.dtype, 1e-9, scale=norm(x))
    return x, (error > tol) | jnp.isnan(error)


def solve_fixed_point_steffensen(func, x0, convergence_tol=None,
                                 divergence_tol=1e10, max_iters=100,
                                 norm=maximum_norm):
    """Solve fixed point equation ``func(x) = x`` using Steffensen's method.

    Steffensen's method achieves quadratic convergence at the cost of two
    function evaluations per iteration.  Reference: mici/solvers.py:97-154.

    Returns:
        Tuple ``(x, error_flag)`` as for :func:`solve_fixed_point_direct`.
    """
    user_tol = convergence_tol

    def cond(carry):
        i, _x, converged, diverged = carry
        return (i < max_iters) & ~converged & ~diverged

    def body(carry):
        i, x0_, _, _ = carry
        x1 = func(x0_)
        x2 = func(x1)
        denom = x2 - 2 * x1 + x0_
        # Avoid division by zero (mici/solvers.py:134-137).
        eps = jnp.finfo(x0_.dtype).eps
        denom = jnp.where(jnp.abs(denom) == 0.0, eps, denom)
        x_new = x0_ - (x1 - x0_) ** 2 / denom
        error = norm(x_new - x0_)
        tol = _resolve_tol(user_tol, x0.dtype, 1e-9, scale=norm(x_new))
        diverged = (error > divergence_tol) | jnp.isnan(error)
        converged = error < tol
        return (i + 1, x_new, converged, diverged)

    _, x, converged, diverged = lax.while_loop(
        cond, body, (jnp.int32(0), x0, jnp.bool_(False), jnp.bool_(False)),
    )
    return x, diverged | ~converged


def solve_fixed_point_newton(func, x0, convergence_tol=None,
                             divergence_tol=1e10, max_iters=20,
                             norm=maximum_norm):
    """Solve fixed point equation ``func(x) = x`` using Newton's method.

    Applies Newton iteration to the residual ``g(x) = func(x) - x`` with
    the Jacobian computed by forward-mode autodiff, giving quadratic
    convergence at ``dim + 1`` function-evaluation cost per iteration —
    profitable for the low-dimensional, high-lockstep-cost momentum /
    position fixed points of the implicit integrators (each saved
    iteration saves a full vmapped lockstep round).  No reference
    analogue (the reference only ships direct and Steffensen iterations,
    mici/solvers.py:47-154); same flag-based failure contract as
    :func:`solve_fixed_point_direct`.

    Returns:
        Tuple ``(x, error_flag)`` as for :func:`solve_fixed_point_direct`.
    """
    import jax

    user_tol = convergence_tol

    def g(x):
        return func(x) - x

    jac_g = jax.jacfwd(g)

    def cond(carry):
        i, _x, converged, diverged = carry
        return (i < max_iters) & ~converged & ~diverged

    def body(carry):
        i, x, _, _ = carry
        resid = g(x)
        jac = jac_g(x)
        delta = jnp.linalg.solve(jac, resid)
        x_new = x - delta
        error = norm(delta)
        tol = _resolve_tol(user_tol, x0.dtype, 1e-9, scale=norm(x_new))
        diverged = (error > divergence_tol) | jnp.any(jnp.isnan(x_new))
        converged = error < tol
        return (i + 1, x_new, converged, diverged)

    _, x, converged, diverged = lax.while_loop(
        cond, body, (jnp.int32(0), x0, jnp.bool_(False), jnp.bool_(False)),
    )
    return x, diverged | ~converged


def solve_fixed_point_anderson(func, x0, convergence_tol=None,
                               divergence_tol=1e10, max_iters=100,
                               norm=maximum_norm, memory=3,
                               regularization=1e-8, mixing=1.0):
    """Solve fixed point equation ``func(x) = x`` with Anderson acceleration.

    Type-II Anderson mixing over a window of the last ``memory`` iterates:
    each step combines the stored fixed-point images with weights
    minimizing the norm of the combined residual (a regularized ``m x m``
    normal-equation solve), at one function evaluation per iteration —
    typically converging in substantially fewer lockstep iterations than
    direct iteration for the implicit-integrator momentum/position solves.
    No reference analogue (mici/solvers.py ships direct and Steffensen
    only); same flag-based failure contract as
    :func:`solve_fixed_point_direct`.

    Args:
        func: Fixed-point map.
        x0: Initial iterate (flat vector).
        convergence_tol: Convergence tolerance on the residual norm
            (``None`` resolves dtype/scale-aware, see :func:`default_tol`).
        divergence_tol: Residual norm above which the solve is flagged
            diverged.
        max_iters: Maximum iterations.
        norm: Norm used for convergence/divergence checks.
        memory: Anderson window size ``m``.
        regularization: Tikhonov regularization of the normal equations
            (relative to the Gram trace), making repeated/degenerate
            history columns harmless.
        mixing: Damping factor in ``(0, 1]`` applied to the accelerated
            update.

    Returns:
        Tuple ``(x, error_flag)`` as for :func:`solve_fixed_point_direct`.
    """
    user_tol = convergence_tol
    x0_flat = jnp.ravel(x0)
    d = x0_flat.shape[0]
    m = int(memory)

    def cond(carry):
        i, _x, _hist_x, _hist_g, converged, diverged = carry
        return (i < max_iters) & ~converged & ~diverged

    def body(carry):
        i, x, hist_x, hist_g, _, _ = carry
        gx = jnp.ravel(func(jnp.reshape(x, jnp.shape(x0))))
        resid = gx - x
        error = norm(resid)
        tol = _resolve_tol(user_tol, x0.dtype, 1e-9, scale=norm(gx))
        diverged = (error > divergence_tol) | jnp.any(jnp.isnan(gx))
        converged = error < tol

        # Insert the newest (iterate, image) pair into the circular
        # history; before the window fills the older slots hold copies of
        # the first pair, which the regularized solve treats as one column.
        slot = i % m
        hist_x = hist_x.at[slot].set(x)
        hist_g = hist_g.at[slot].set(gx)
        valid = jnp.arange(m) <= i  # slots written so far (i < m phase)
        fill_x = jnp.where(valid[:, None], hist_x, x[None, :])
        fill_g = jnp.where(valid[:, None], hist_g, gx[None, :])
        residuals = fill_g - fill_x  # (m, d)

        gram = residuals @ residuals.T
        reg = regularization * (jnp.trace(gram) + 1.0)
        gram = gram + reg * jnp.eye(m, dtype=gram.dtype)
        weights = jnp.linalg.solve(gram, jnp.ones((m,), gram.dtype))
        weights = weights / jnp.sum(weights)
        x_acc = weights @ (
            fill_x + mixing * residuals
        )
        # Guard the accelerated step: fall back to plain iteration if the
        # combination produced non-finite values.
        x_new = jnp.where(jnp.all(jnp.isfinite(x_acc)), x_acc, gx)
        x_new = jnp.where(converged | diverged, x, x_new)
        return (i + 1, x_new, hist_x, hist_g, converged, diverged)

    hist_x0 = jnp.zeros((m, d), dtype=x0_flat.dtype)
    hist_g0 = jnp.zeros((m, d), dtype=x0_flat.dtype)
    _, x, _, _, converged, diverged = lax.while_loop(
        cond, body,
        (jnp.int32(0), x0_flat, hist_x0, hist_g0,
         jnp.bool_(False), jnp.bool_(False)),
    )
    return jnp.reshape(x, jnp.shape(x0)), diverged | ~converged


def _finalize_projection(system, state, pos, mu, dh2_flow_mom_dmom,
                         time_step, success, prepare):
    """Apply the momentum correction and package the solved state.

    Preserves the direction indicator and accumulated error bits of the
    input state (only pos/mom/aux are updated).
    """
    mom = state.mom - jnp.sign(time_step) * (dh2_flow_mom_dmom @ mu)
    state = state.replace(pos=pos, mom=mom, aux={})
    if prepare:
        state = system.prepare_state(state)
    return state.with_error_bit(errors.CONVERGENCE_BIT, ~success)


def solve_projection_onto_manifold_quasi_newton(
    state, state_prev, time_step, system, constraint_tol=None,
    position_tol=None, divergence_tol=1e10, max_iters=50,
    norm=maximum_norm, _prepare_result=True,
):
    r"""Solve constraint equation using symmetric quasi-Newton method.

    Solves ``c(Phi_2(t)(q, p + dc(q)^T lambda)) = 0`` for the Lagrange
    multipliers projecting a post-``h2_flow`` state onto the manifold, with
    the residual Jacobian frozen at the previous state so a single matrix
    decomposition (hoisted outside the iteration loop) is reused.

    Reference: mici/solvers.py:195-343.  Failure (divergence, NaN, or
    ``max_iters`` exhaustion) sets the CONVERGENCE error bit on the
    returned state instead of raising.
    """
    pos_scale = norm(state.pos)
    constraint_tol = _resolve_tol(
        constraint_tol, state.pos.dtype, 1e-9, scale=pos_scale,
    )
    position_tol = _resolve_tol(
        position_tol, state.pos.dtype, 1e-8, scale=pos_scale,
    )
    jacob_constr_prev = system.jacob_constr(state_prev)
    dh2_flow_pos_dmom, dh2_flow_mom_dmom = system.dh2_flow_dmom(
        state_prev, jnp.abs(time_step),
    )
    # ``.inv`` triggers the factorization *here*, outside the loop, so the
    # decomposition is computed once (mici/solvers.py:314-317).
    inv_jacob_constr_inner_product = system.jacob_constr_inner_product(
        jacob_constr_prev, dh2_flow_pos_dmom,
    ).inv

    def cond(carry):
        i, _pos, _mu, converged, diverged = carry
        return (i < max_iters) & ~converged & ~diverged

    def body(carry):
        i, pos, mu, _, _ = carry
        constr = system._constr(pos)
        error = norm(constr)
        delta_mu = jacob_constr_prev.T @ (
            inv_jacob_constr_inner_product @ constr
        )
        delta_pos = dh2_flow_pos_dmom @ delta_mu
        diverged = (error > divergence_tol) | jnp.isnan(error)
        converged = (error < constraint_tol) & (norm(delta_pos) < position_tol)
        apply = ~(converged | diverged)
        pos = jnp.where(apply, pos - delta_pos, pos)
        mu = jnp.where(apply, mu + delta_mu, mu)
        return (i + 1, pos, mu, converged, diverged)

    init = (
        jnp.int32(0), state.pos, jnp.zeros_like(state.pos),
        jnp.bool_(False), jnp.bool_(False),
    )
    _, pos, mu, converged, _diverged = lax.while_loop(cond, body, init)
    return _finalize_projection(
        system, state, pos, mu, dh2_flow_mom_dmom, time_step,
        converged, _prepare_result,
    )


def solve_projection_onto_manifold_newton(
    state, state_prev, time_step, system, constraint_tol=None,
    position_tol=None, divergence_tol=1e10, max_iters=50,
    norm=maximum_norm, _prepare_result=True,
):
    r"""Solve constraint equation using Newton's method.

    Re-evaluates the constraint Jacobian and re-factorizes the residual
    Jacobian on every iteration.  Reference: mici/solvers.py:346-469.
    """
    pos_scale = norm(state.pos)
    constraint_tol = _resolve_tol(
        constraint_tol, state.pos.dtype, 1e-9, scale=pos_scale,
    )
    position_tol = _resolve_tol(
        position_tol, state.pos.dtype, 1e-8, scale=pos_scale,
    )
    jacob_constr_prev = system.jacob_constr(state_prev)
    dh2_flow_pos_dmom, dh2_flow_mom_dmom = system.dh2_flow_dmom(
        state_prev, jnp.abs(time_step),
    )

    def cond(carry):
        i, _pos, _mu, converged, diverged = carry
        return (i < max_iters) & ~converged & ~diverged

    def body(carry):
        i, pos, mu, _, _ = carry
        jacob_constr, constr = system._jacob_constr(pos)
        error = norm(constr)
        delta_mu = jacob_constr_prev.T @ (
            system.jacob_constr_inner_product(
                jacob_constr, dh2_flow_pos_dmom, jacob_constr_prev,
            ).inv
            @ constr
        )
        delta_pos = dh2_flow_pos_dmom @ delta_mu
        diverged = (error > divergence_tol) | jnp.isnan(error)
        converged = (error < constraint_tol) & (norm(delta_pos) < position_tol)
        apply = ~(converged | diverged)
        pos = jnp.where(apply, pos - delta_pos, pos)
        mu = jnp.where(apply, mu + delta_mu, mu)
        return (i + 1, pos, mu, converged, diverged)

    init = (
        jnp.int32(0), state.pos, jnp.zeros_like(state.pos),
        jnp.bool_(False), jnp.bool_(False),
    )
    _, pos, mu, converged, _diverged = lax.while_loop(cond, body, init)
    return _finalize_projection(
        system, state, pos, mu, dh2_flow_mom_dmom, time_step,
        converged, _prepare_result,
    )


def solve_projection_onto_manifold_newton_with_line_search(
    state, state_prev, time_step, system, constraint_tol=None,
    position_tol=None, divergence_tol=1e10, max_iters=50,
    max_line_search_iters=10, norm=maximum_norm, _prepare_result=True,
):
    r"""Solve constraint equation using Newton's method with backtracking.

    As :func:`solve_projection_onto_manifold_newton` but scaling each Newton
    update by a step size found by halving until the constraint residual
    norm decreases.  Reference: mici/solvers.py:472-614.
    """
    pos_scale = norm(state.pos)
    constraint_tol = _resolve_tol(
        constraint_tol, state.pos.dtype, 1e-9, scale=pos_scale,
    )
    position_tol = _resolve_tol(
        position_tol, state.pos.dtype, 1e-8, scale=pos_scale,
    )
    jacob_constr_prev = system.jacob_constr(state_prev)
    dh2_flow_pos_dmom, dh2_flow_mom_dmom = system.dh2_flow_dmom(
        state_prev, jnp.abs(time_step),
    )

    def cond(carry):
        i, _pos, _mu, converged, diverged, _prev_step_delta = carry
        return (i < max_iters) & ~converged & ~diverged

    def body(carry):
        i, pos, mu, _, _, _prev_step_delta = carry
        jacob_constr, constr = system._jacob_constr(pos)
        error = norm(constr)
        diverged = (i > 0) & ((error > divergence_tol) | jnp.isnan(error))
        converged = (error < constraint_tol) & (
            (i == 0) | (_prev_step_delta < position_tol)
        )
        delta_mu = jacob_constr_prev.T @ (
            system.jacob_constr_inner_product(
                jacob_constr, dh2_flow_pos_dmom, jacob_constr_prev,
            ).inv
            @ constr
        )
        delta_pos = -(dh2_flow_pos_dmom @ delta_mu)

        # Backtracking line search (mici/solvers.py:597-604): keep the first
        # step size in (1, 1/2, 1/4, ...) that decreases the residual norm
        # (falling back to the smallest candidate if none does), masked so
        # the search runs a bounded number of candidate evaluations.
        def ls_body(ls_i, ls_carry):
            step_size, found = ls_carry
            trial_pos = pos + step_size * delta_pos
            new_error = norm(system._constr(trial_pos))
            success = new_error < error
            step_size = jnp.where(~found & ~success, step_size * 0.5,
                                  step_size)
            return (step_size, found | success)

        step_size, _found = lax.fori_loop(
            0, max_line_search_iters, ls_body,
            (jnp.asarray(1.0, dtype=pos.dtype), jnp.bool_(False)),
        )
        apply = ~(converged | diverged)
        pos = jnp.where(apply, pos + step_size * delta_pos, pos)
        mu = jnp.where(apply, mu + step_size * delta_mu, mu)
        step_delta_norm = norm(step_size * delta_pos)
        return (i + 1, pos, mu, converged, diverged, step_delta_norm)

    init = (
        jnp.int32(0), state.pos, jnp.zeros_like(state.pos),
        jnp.bool_(False), jnp.bool_(False),
        jnp.asarray(jnp.inf, dtype=state.pos.dtype),
    )
    _, pos, mu, converged, _diverged, _ = lax.while_loop(cond, body, init)
    return _finalize_projection(
        system, state, pos, mu, dh2_flow_mom_dmom, time_step,
        converged, _prepare_result,
    )
