"""Hamiltonian systems on Euclidean, Riemannian and constrained manifolds.

Reference: mici/systems.py (1920 LoC).  Systems here are immutable pytree
objects whose methods are pure functions of an immutable
:class:`~mici_tpu.states.ChainState`; the reference's ``cache_in_state``
memoization (mici/states.py:37-157) is replaced by the explicit ``aux``
dict threaded through states: ``prepare_state`` populates the
position-dependent derived quantities (negative log density value/gradient,
metric operator, constraint Jacobian, ...) and each accessor reuses the aux
entry when present — a *static* (trace-time) decision, so compiled code
contains exactly one evaluation per position, as in the reference's cache.

The ``metric`` field is a pytree leaf, so "setting the metric" (which the
reference does by mutation in ``Adapter.finalize``, mici/adapters.py:511)
is a functional ``system.replace(metric=...)`` that flows through jit.
"""

from __future__ import annotations

import abc

import jax
import jax.numpy as jnp

from mici_tpu import matrices
from mici_tpu._pytree import register_pytree
from mici_tpu.autodiff import autodiff_fallback, wrap_function


def _coerce_metric(metric):
    """Coerce array-like metric specifications to matrix objects.

    Reference: mici/systems.py:332-346.
    """
    if metric is None:
        return matrices.IdentityMatrix()
    if isinstance(metric, matrices.Matrix):
        return metric
    metric = jnp.asarray(metric)
    if metric.ndim == 1:
        return matrices.PositiveDiagonalMatrix(metric)
    if metric.ndim == 2:
        return matrices.DensePositiveDefiniteMatrix(metric)
    msg = (
        "If an array value is used for `metric` it must be either 1D "
        "(diagonal matrix) or 2D (dense positive definite matrix)."
    )
    raise ValueError(msg)


class _SystemBase(abc.ABC):
    """Shared method implementations for all systems.

    Public interface mirrors mici/systems.py:39-229: ``h``, ``h1``, ``h2``,
    ``dh1_dpos``, ``dh2_dpos``, ``dh2_dmom``, ``h1_flow``,
    ``sample_momentum``, with flows returning *new* states.
    """

    # -- aux management ----------------------------------------------------

    def _compute_aux(self, pos):
        grad, val = self._grad_neg_log_dens(pos)
        return {"neg_log_dens": val, "grad_neg_log_dens": grad}

    def prepare_state(self, state):
        """Return state with position-dependent aux entries populated."""
        return state.replace(aux=self._compute_aux(state.pos))

    # -- h1 component ------------------------------------------------------

    def neg_log_dens(self, state):
        """Negative logarithm of unnormalized density of target distribution.

        Reference: mici/systems.py:97-108.
        """
        if "neg_log_dens" in state.aux:
            return state.aux["neg_log_dens"]
        return self._neg_log_dens(state.pos)

    def grad_neg_log_dens(self, state):
        """Derivative of negative log density with respect to position.

        Reference: mici/systems.py:110-119.
        """
        if "grad_neg_log_dens" in state.aux:
            return state.aux["grad_neg_log_dens"]
        return self._grad_neg_log_dens(state.pos)[0]

    def h1(self, state):
        """Hamiltonian component depending only on position.

        Reference: mici/systems.py:121-130.
        """
        return self.neg_log_dens(state)

    def dh1_dpos(self, state):
        """Derivative of h1 with respect to position.

        Reference: mici/systems.py:132-141.
        """
        return self.grad_neg_log_dens(state)

    def h1_flow(self, state, dt):
        """Apply exact flow map of h1 for time dt (momentum kick).

        Reference: mici/systems.py:143-152.  Position (and so aux) is
        unchanged.
        """
        return state.replace(mom=state.mom - dt * self.dh1_dpos(state))

    def h(self, state):
        """Hamiltonian function. Reference: mici/systems.py:154-165."""
        return self.h1(state) + self.h2(state)

    def dh_dpos(self, state):
        return self.dh1_dpos(state) + self.dh2_dpos(state)

    def dh_dmom(self, state):
        return self.dh2_dmom(state)

    # -- h2 component (abstract) -------------------------------------------

    @abc.abstractmethod
    def h2(self, state):
        """Hamiltonian component depending on momentum (and maybe position)."""

    @abc.abstractmethod
    def dh2_dmom(self, state):
        """Derivative of h2 with respect to momentum."""

    def dh2_dpos(self, state):
        """Derivative of h2 with respect to position."""
        return jnp.zeros_like(state.pos)

    @abc.abstractmethod
    def sample_momentum(self, state, rng):
        """Sample momentum from conditional distribution given position.

        Args:
            state: Chain state (position used).
            rng: JAX PRNG key.
        """


class System(_SystemBase):
    """Base class for Hamiltonian systems with a Lebesgue-density h1.

    Reference: mici/systems.py:39-229.
    """

    def __init__(self, neg_log_dens, *, grad_neg_log_dens=None, backend=None):
        """
        Args:
            neg_log_dens: Function of position array returning negative log
                (unnormalized) density of target distribution.
            grad_neg_log_dens: Optional function returning either the
                gradient of ``neg_log_dens``, or a 2-tuple of (gradient,
                value).  If None, JAX autodiff is used.
            backend: AD backend name (kept for reference API parity; all
                built-in names map to native JAX autodiff).
        """
        self._neg_log_dens = wrap_function(neg_log_dens, backend)
        self._grad_neg_log_dens = _normalize_grad_fn(
            autodiff_fallback(
                grad_neg_log_dens, neg_log_dens, "grad_and_value",
                "grad_neg_log_dens", backend if grad_neg_log_dens is None
                else backend,
            ),
            neg_log_dens,
        )


def _normalize_grad_fn(grad_fn, value_fn):
    """Normalize user grad function to always return (grad, value)."""

    def wrapped(pos):
        result = grad_fn(pos)
        if isinstance(result, tuple):
            return result[0], result[1]
        return result, value_fn(pos)

    return wrapped


class TractableFlowSystem(System):
    """System with tractable h2 flow. Reference: mici/systems.py:232-261."""

    @abc.abstractmethod
    def h2_flow(self, state, dt):
        """Apply exact flow map of h2 for time dt, refreshing aux."""


@register_pytree(
    data_fields=("metric",),
    static_fields=("_neg_log_dens", "_grad_neg_log_dens"),
)
class EuclideanMetricSystem(TractableFlowSystem):
    r"""Hamiltonian system with a Euclidean metric on the position space.

    ``h2(q, p) = p^T M^{-1} p / 2`` with constant positive definite metric
    ``M``.  Reference: mici/systems.py:264-366.
    """

    def __init__(self, neg_log_dens, *, metric=None, grad_neg_log_dens=None,
                 backend=None):
        super().__init__(
            neg_log_dens, grad_neg_log_dens=grad_neg_log_dens,
            backend=backend,
        )
        self.metric = _coerce_metric(metric)

    def h2(self, state):
        return 0.5 * state.mom @ self.dh2_dmom(state)

    def dh2_dmom(self, state):
        return self.metric.inv @ state.mom

    def h2_flow(self, state, dt, prepare=True):
        new_pos = state.pos + dt * self.dh2_dmom(state)
        state = state.replace(pos=new_pos, aux={})
        return self.prepare_state(state) if prepare else state

    def sample_momentum(self, state, rng):
        noise = jax.random.normal(
            rng, shape=state.pos.shape, dtype=state.pos.dtype,
        )
        return self.metric.sqrt @ noise


class GaussianEuclideanMetricSystem(EuclideanMetricSystem):
    r"""Euclidean system with analytically solvable Gaussian h2 component.

    ``h1(q) = l(q) - q^T q / 2`` and ``h2(q, p) = q^T q / 2 + p^T M^{-1} p /
    2`` (Shahbaba et al. split); the h2 flow is a rotation in the metric
    eigenbasis.  Reference: mici/systems.py:369-474.
    """

    def h2(self, state):
        return (0.5 * state.pos @ state.pos
                + 0.5 * state.mom @ (self.metric.inv @ state.mom))

    def dh2_dmom(self, state):
        return self.metric.inv @ state.mom

    def dh2_dpos(self, state):
        return state.pos

    def h2_flow(self, state, dt, prepare=True):
        # Reference: mici/systems.py:464-474 (cos/sin rotation in eigenbasis)
        if isinstance(self.metric, matrices.IdentityMatrix):
            sin_dt, cos_dt = jnp.sin(dt), jnp.cos(dt)
            new_pos = cos_dt * state.pos + sin_dt * state.mom
            new_mom = cos_dt * state.mom - sin_dt * state.pos
        else:
            omega = 1.0 / jnp.sqrt(self.metric.eigval)
            sin_omega_dt = jnp.sin(omega * dt)
            cos_omega_dt = jnp.cos(omega * dt)
            eigvec = self.metric.eigvec
            pos_t = eigvec.T @ state.pos
            mom_t = eigvec.T @ state.mom
            new_pos = eigvec @ (
                cos_omega_dt * pos_t + (sin_omega_dt * omega) * mom_t
            )
            new_mom = eigvec @ (
                cos_omega_dt * mom_t - (sin_omega_dt / omega) * pos_t
            )
        state = state.replace(pos=new_pos, mom=new_mom, aux={})
        return self.prepare_state(state) if prepare else state


# ---------------------------------------------------------------------------
# Constrained systems
# ---------------------------------------------------------------------------


class ConstrainedTractableFlowSystem(TractableFlowSystem):
    """Base class for systems subject to holonomic constraints.

    Reference: mici/systems.py:477-616.
    """

    @abc.abstractmethod
    def constr(self, state):
        """Value of constraint function at state position."""

    @abc.abstractmethod
    def jacob_constr(self, state):
        """Jacobian of constraint function at state position."""

    @abc.abstractmethod
    def jacob_constr_inner_product(self, jacob_constr_1, inner_product_matrix,
                                   jacob_constr_2=None):
        """Compute ``J1 @ M @ J2.T``, exploiting structure where possible.

        Reference: mici/systems.py:551-578.
        """

    @abc.abstractmethod
    def dh2_flow_dmom(self, state, dt):
        """Derivatives of h2 flow map with respect to momentum.

        Returns matrices ``(dpos_dmom, dmom_dmom)``.
        Reference: mici/systems.py:580-594.
        """

    def project_onto_cotangent_space(self, mom, state):
        """Project momentum onto cotangent space of manifold at state.

        Reference: mici/systems.py:863-873 (right-to-left association).
        """
        mom = mom - self.jacob_constr(state).T @ (
            self.inv_gram(state)
            @ (self.jacob_constr(state) @ (self.metric.inv @ mom))
        )
        return mom

    def sample_momentum(self, state, rng):
        # Reference: mici/systems.py:607-616.
        mom = super().sample_momentum(state, rng)
        return self.project_onto_cotangent_space(mom, state)


@register_pytree(
    data_fields=("metric",),
    static_fields=(
        "_neg_log_dens", "_grad_neg_log_dens", "_constr", "_jacob_constr",
        "dens_wrt_hausdorff",
    ),
)
class ConstrainedEuclideanMetricSystem(ConstrainedTractableFlowSystem,
                                       EuclideanMetricSystem):
    """Euclidean system subject to holonomic constraints.

    Reference: mici/systems.py:619-873.
    """

    def __init__(self, neg_log_dens, constr, *, metric=None,
                 dens_wrt_hausdorff=True, grad_neg_log_dens=None,
                 jacob_constr=None, backend=None):
        EuclideanMetricSystem.__init__(
            self, neg_log_dens, metric=metric,
            grad_neg_log_dens=grad_neg_log_dens, backend=backend,
        )
        self._constr = wrap_function(constr, backend)
        self.dens_wrt_hausdorff = dens_wrt_hausdorff
        self._jacob_constr = _normalize_grad_fn(
            autodiff_fallback(
                jacob_constr, constr, "jacobian_and_value", "jacob_constr",
                backend,
            ),
            constr,
        )

    def _compute_aux(self, pos):
        aux = super()._compute_aux(pos)
        jacob, constr = self._jacob_constr(pos)
        aux["constr"] = constr
        aux["jacob_constr"] = jacob
        return aux

    def constr(self, state):
        if "constr" in state.aux:
            return state.aux["constr"]
        return self._constr(state.pos)

    def jacob_constr(self, state):
        if "jacob_constr" in state.aux:
            return state.aux["jacob_constr"]
        return self._jacob_constr(state.pos)[0]

    def dh2_flow_dmom(self, state, dt):
        # Reference: mici/systems.py:790-799.
        return (
            dt * self.metric.inv,
            matrices.IdentityMatrix(state.pos.shape[0]),
        )

    def gram(self, state):
        """Gram matrix ``jacob_constr @ inv(metric) @ jacob_constr.T``.

        Reference: mici/systems.py:801-824.
        """
        return self.jacob_constr_inner_product(
            self.jacob_constr(state), self.metric.inv,
        )

    def inv_gram(self, state):
        """Inverse of Gram matrix. Reference: mici/systems.py:826-835."""
        return self.gram(state).inv

    def log_det_sqrt_gram(self, state):
        """Half of log-determinant of Gram matrix.

        Reference: mici/systems.py:837-839.
        """
        return 0.5 * self.gram(state).log_abs_det

    @abc.abstractmethod
    def grad_log_det_sqrt_gram(self, state):
        """Derivative of half log-determinant of Gram matrix wrt position."""

    def h1(self, state):
        # Reference: mici/systems.py:853-857.
        if self.dens_wrt_hausdorff:
            return self.neg_log_dens(state)
        return self.neg_log_dens(state) + self.log_det_sqrt_gram(state)

    def dh1_dpos(self, state):
        # Reference: mici/systems.py:858-861.
        if self.dens_wrt_hausdorff:
            return self.grad_neg_log_dens(state)
        return (self.grad_neg_log_dens(state)
                + self.grad_log_det_sqrt_gram(state))


class DenseConstrainedEuclideanMetricSystem(ConstrainedEuclideanMetricSystem):
    """Euclidean system subject to a dense set of constraints.

    Reference: mici/systems.py:876-1038.
    """

    def __init__(self, neg_log_dens, constr, *, metric=None,
                 dens_wrt_hausdorff=True, grad_neg_log_dens=None,
                 jacob_constr=None, mhp_constr=None, backend=None):
        super().__init__(
            neg_log_dens, constr, metric=metric,
            dens_wrt_hausdorff=dens_wrt_hausdorff,
            grad_neg_log_dens=grad_neg_log_dens, jacob_constr=jacob_constr,
            backend=backend,
        )
        if not dens_wrt_hausdorff:
            self._mhp_constr = autodiff_fallback(
                mhp_constr, constr, "mhp_jacobian_and_value", "mhp_constr",
                backend,
            )
        else:
            self._mhp_constr = None

    def mhp_constr(self, state):
        """Matrix-Hessian-product function of constraint at state position.

        Reference: mici/systems.py:1008-1010.
        """
        result = self._mhp_constr(state.pos)
        if isinstance(result, tuple):
            return result[0]
        return result

    def jacob_constr_inner_product(self, jacob_constr_1, inner_product_matrix,
                                   jacob_constr_2=None):
        # Reference: mici/systems.py:1012-1025.
        j1 = jacob_constr_1
        if jacob_constr_2 is None or jacob_constr_2 is jacob_constr_1:
            return matrices.DensePositiveDefiniteMatrix(
                j1 @ (inner_product_matrix @ j1.T),
            )
        return matrices.DenseSquareMatrix(
            j1 @ (inner_product_matrix @ jacob_constr_2.T),
        )

    def grad_log_det_sqrt_gram(self, state):
        # Reference: mici/systems.py:1027-1033.
        mhp = self.mhp_constr(state)
        return mhp(
            self.inv_gram(state)
            @ self.jacob_constr(state) @ self.metric.inv,
        )


class GaussianDenseConstrainedEuclideanMetricSystem(
    GaussianEuclideanMetricSystem, DenseConstrainedEuclideanMetricSystem,
):
    """Gaussian Euclidean system subject to dense constraints.

    Reference: mici/systems.py:1041-1184.
    """

    def __init__(self, neg_log_dens, constr, *, metric=None,
                 grad_neg_log_dens=None, jacob_constr=None, mhp_constr=None,
                 backend=None):
        DenseConstrainedEuclideanMetricSystem.__init__(
            self, neg_log_dens, constr, metric=metric,
            dens_wrt_hausdorff=False, grad_neg_log_dens=grad_neg_log_dens,
            jacob_constr=jacob_constr, mhp_constr=mhp_constr,
            backend=backend,
        )

    def jacob_constr_inner_product(self, jacob_constr_1, inner_product_matrix,
                                   jacob_constr_2=None):
        # Reference: mici/systems.py:1147-1159 (symmetric not pos def as
        # inner product matrix may be indefinite for Gaussian flow).
        j1 = jacob_constr_1
        if jacob_constr_2 is None or jacob_constr_2 is jacob_constr_1:
            return matrices.DenseSymmetricMatrix(
                j1 @ (inner_product_matrix @ j1.T),
            )
        return matrices.DenseSquareMatrix(
            j1 @ (inner_product_matrix @ jacob_constr_2.T),
        )

    def dh2_flow_dmom(self, state, dt):
        # Reference: mici/systems.py:1161-1184.
        if isinstance(self.metric, matrices.IdentityMatrix):
            size = state.pos.shape[0]
            return (
                matrices.ScaledIdentityMatrix(jnp.sin(dt), size),
                matrices.ScaledIdentityMatrix(jnp.cos(dt), size),
            )
        omega = 1.0 / jnp.sqrt(self.metric.eigval)
        eigvec = self.metric.eigvec
        return (
            matrices.EigendecomposedSymmetricMatrix(
                eigvec, jnp.sin(omega * dt) * omega,
            ),
            matrices.EigendecomposedSymmetricMatrix(
                eigvec, jnp.cos(omega * dt),
            ),
        )


# ---------------------------------------------------------------------------
# Riemannian systems
# ---------------------------------------------------------------------------


@register_pytree(
    data_fields=(),
    static_fields=(
        "_neg_log_dens", "_grad_neg_log_dens", "_metric_matrix_class",
        "_metric_func", "_vjp_metric_func", "_metric_kwargs",
    ),
)
class RiemannianMetricSystem(System):
    r"""Riemannian Hamiltonian system with a position-dependent metric.

    ``h1(q) = l(q) + log|M(q)| / 2`` and ``h2(q, p) = p^T M(q)^{-1} p / 2``
    (Girolami & Calderhead 2011).  Reference: mici/systems.py:1187-1402.

    The metric operator for the current position is cached in ``state.aux``
    so its factorization (e.g. the SoftAbs eigendecomposition) is computed
    once per position within an integrator step.
    """

    def __init__(self, neg_log_dens, metric_matrix_class, metric_func, *,
                 vjp_metric_func=None, grad_neg_log_dens=None,
                 metric_kwargs=None, backend=None):
        super().__init__(
            neg_log_dens, grad_neg_log_dens=grad_neg_log_dens,
            backend=backend,
        )
        self._metric_matrix_class = metric_matrix_class
        self._metric_func = wrap_function(metric_func, backend)
        self._vjp_metric_func = autodiff_fallback(
            vjp_metric_func, metric_func, "vjp_and_value", "vjp_metric_func",
            backend,
        )
        self._metric_kwargs = (
            () if metric_kwargs is None else tuple(sorted(
                metric_kwargs.items(),
            ))
        )

    def _make_metric(self, param):
        return self._metric_matrix_class(param, **dict(self._metric_kwargs))

    def _compute_aux(self, pos):
        aux = super()._compute_aux(pos)
        param = self._metric_func(pos)
        aux["metric"] = self._make_metric(param)
        return aux

    def metric_func(self, state):
        """Parameter array of metric matrix representation at state position.

        Reference: mici/systems.py:1327-1337.
        """
        return self._metric_func(state.pos)

    def vjp_metric_func(self, state):
        """VJP function for the metric parameter function at state position.

        Reference: mici/systems.py:1339-1358.  Returns only the VJP closure
        (the forward value is recovered by XLA CSE when needed).
        """
        vjp, _ = self._vjp_metric_func(state.pos)
        return vjp

    def metric(self, state):
        """Metric matrix representation at state position.

        Reference: mici/systems.py:1360-1373.
        """
        if "metric" in state.aux:
            return state.aux["metric"]
        return self._make_metric(self._metric_func(state.pos))

    def h(self, state):
        return self.h1(state) + self.h2(state)

    def h1(self, state):
        return (self.neg_log_dens(state)
                + 0.5 * self.metric(state).log_abs_det)

    def dh1_dpos(self, state):
        # Reference: mici/systems.py:1381-1387.
        vjp_metric = self.vjp_metric_func(state)
        return self.grad_neg_log_dens(state) + 0.5 * vjp_metric(
            self.metric(state).grad_log_abs_det,
        )

    def h2(self, state):
        return 0.5 * state.mom @ (self.metric(state).inv @ state.mom)

    def dh2_dpos(self, state):
        # Reference: mici/systems.py:1392-1396.
        vjp_metric = self.vjp_metric_func(state)
        return 0.5 * vjp_metric(
            self.metric(state).grad_quadratic_form_inv(state.mom),
        )

    def dh2_dpos_fn(self, state):
        """Return ``mom -> dh2_dpos`` at the state's (fixed) position.

        The returned closure reuses a single evaluation of the metric VJP
        residuals and the cached metric operator, so implicit integrators
        can hoist the metric-function forward pass out of their fixed-point
        solver loops (the compiled-world equivalent of the reference's
        per-position VJP cache, mici/states.py:78-157 +
        mici/systems.py:1339-1358).
        """
        vjp_metric = self.vjp_metric_func(state)
        metric = self.metric(state)

        def fn(mom):
            return 0.5 * vjp_metric(metric.grad_quadratic_form_inv(mom))

        return fn

    def dh2_dmom(self, state):
        return self.metric(state).inv @ state.mom

    def sample_momentum(self, state, rng):
        noise = jax.random.normal(
            rng, shape=state.pos.shape, dtype=state.pos.dtype,
        )
        return self.metric(state).sqrt @ noise


class ScalarRiemannianMetricSystem(RiemannianMetricSystem):
    """Riemannian system with scaled-identity metric representation.

    Reference: mici/systems.py:1405-1490.
    """

    def __init__(self, neg_log_dens, metric_scalar_func, *,
                 vjp_metric_scalar_func=None, grad_neg_log_dens=None,
                 backend=None):
        super().__init__(
            neg_log_dens, matrices.PositiveScaledIdentityMatrix,
            metric_scalar_func, vjp_metric_func=vjp_metric_scalar_func,
            grad_neg_log_dens=grad_neg_log_dens, backend=backend,
        )

    def _compute_aux(self, pos):
        aux = System._compute_aux(self, pos)
        param = self._metric_func(pos)
        aux["metric"] = matrices.PositiveScaledIdentityMatrix(
            param, pos.shape[0],
        )
        return aux

    def metric(self, state):
        if "metric" in state.aux:
            return state.aux["metric"]
        return matrices.PositiveScaledIdentityMatrix(
            self._metric_func(state.pos), state.pos.shape[0],
        )


class DiagonalRiemannianMetricSystem(RiemannianMetricSystem):
    """Riemannian system with diagonal metric representation.

    Reference: mici/systems.py:1493-1571.
    """

    def __init__(self, neg_log_dens, metric_diagonal_func, *,
                 vjp_metric_diagonal_func=None, grad_neg_log_dens=None,
                 backend=None):
        super().__init__(
            neg_log_dens, matrices.PositiveDiagonalMatrix,
            metric_diagonal_func,
            vjp_metric_func=vjp_metric_diagonal_func,
            grad_neg_log_dens=grad_neg_log_dens, backend=backend,
        )


class CholeskyFactoredRiemannianMetricSystem(RiemannianMetricSystem):
    """Riemannian system with Cholesky-factored metric representation.

    Reference: mici/systems.py:1574-1653.
    """

    def __init__(self, neg_log_dens, metric_chol_func, *,
                 vjp_metric_chol_func=None, grad_neg_log_dens=None,
                 backend=None):
        super().__init__(
            neg_log_dens, matrices.TriangularFactoredPositiveDefiniteMatrix,
            metric_chol_func, vjp_metric_func=vjp_metric_chol_func,
            grad_neg_log_dens=grad_neg_log_dens, backend=backend,
        )


class DenseRiemannianMetricSystem(RiemannianMetricSystem):
    """Riemannian system with dense metric representation.

    Reference: mici/systems.py:1656-1734.
    """

    def __init__(self, neg_log_dens, metric_func, *, vjp_metric_func=None,
                 grad_neg_log_dens=None, backend=None):
        super().__init__(
            neg_log_dens, matrices.DensePositiveDefiniteMatrix, metric_func,
            vjp_metric_func=vjp_metric_func,
            grad_neg_log_dens=grad_neg_log_dens, backend=backend,
        )


@register_pytree(
    data_fields=(),
    static_fields=(
        "_neg_log_dens", "_grad_neg_log_dens", "_metric_matrix_class",
        "_metric_func", "_vjp_metric_func", "_metric_kwargs",
        "_hess_neg_log_dens", "_mtp_neg_log_dens",
    ),
)
class SoftAbsRiemannianMetricSystem(RiemannianMetricSystem):
    """SoftAbs Riemannian metric system (eigenvalue-regularized Hessian).

    The metric is ``M(q) = eigvec @ softabs(eigval) @ eigvec.T`` of the
    Hessian of the negative log density (Betancourt 2013).
    Reference: mici/systems.py:1737-1920.
    """

    def __init__(self, neg_log_dens, *, grad_neg_log_dens=None,
                 hess_neg_log_dens=None, mtp_neg_log_dens=None,
                 softabs_coeff=1.0, backend=None):
        self._hess_neg_log_dens = autodiff_fallback(
            hess_neg_log_dens, neg_log_dens, "hessian_grad_and_value",
            "neg_log_dens", backend,
        )
        self._mtp_neg_log_dens = autodiff_fallback(
            mtp_neg_log_dens, neg_log_dens, "mtp_hessian_grad_and_value",
            "mtp_neg_log_dens", backend,
        )
        super().__init__(
            neg_log_dens,
            matrices.SoftAbsRegularizedPositiveDefiniteMatrix,
            self._hess_only, vjp_metric_func=self._mtp_only,
            grad_neg_log_dens=grad_neg_log_dens,
            metric_kwargs={"softabs_coeff": softabs_coeff},
            backend=backend,
        )

    def _hess_only(self, pos):
        result = self._hess_neg_log_dens(pos)
        if isinstance(result, tuple):
            return result[0]
        return result

    def _mtp_only(self, pos):
        result = self._mtp_neg_log_dens(pos)
        if isinstance(result, tuple):
            return result[0], result[1]
        return result

    def hess_neg_log_dens(self, state):
        """Hessian of negative log density at state position.

        Reference: mici/systems.py:1883-1895.
        """
        return self._hess_only(state.pos)

    def mtp_neg_log_dens(self, state):
        """Matrix-Tressian-product of negative log density at state position.

        Reference: mici/systems.py:1897-1920.
        """
        return self._mtp_only(state.pos)[0]

    def metric_func(self, state):
        return self.hess_neg_log_dens(state)

    def vjp_metric_func(self, state):
        vjp, _ = self._mtp_only(state.pos)
        return vjp


# Pytree registration for concrete subclasses (registration is per-class,
# not inherited).
_EUCLIDEAN_FIELDS = dict(
    data_fields=("metric",),
    static_fields=("_neg_log_dens", "_grad_neg_log_dens"),
)
_CONSTRAINED_FIELDS = dict(
    data_fields=("metric",),
    static_fields=(
        "_neg_log_dens", "_grad_neg_log_dens", "_constr", "_jacob_constr",
        "dens_wrt_hausdorff", "_mhp_constr",
    ),
)
_RIEMANNIAN_FIELDS = dict(
    data_fields=(),
    static_fields=(
        "_neg_log_dens", "_grad_neg_log_dens", "_metric_matrix_class",
        "_metric_func", "_vjp_metric_func", "_metric_kwargs",
    ),
)

register_pytree(**_EUCLIDEAN_FIELDS)(GaussianEuclideanMetricSystem)
register_pytree(**_CONSTRAINED_FIELDS)(DenseConstrainedEuclideanMetricSystem)
register_pytree(**_CONSTRAINED_FIELDS)(
    GaussianDenseConstrainedEuclideanMetricSystem)
register_pytree(**_RIEMANNIAN_FIELDS)(ScalarRiemannianMetricSystem)
register_pytree(**_RIEMANNIAN_FIELDS)(DiagonalRiemannianMetricSystem)
register_pytree(**_RIEMANNIAN_FIELDS)(CholeskyFactoredRiemannianMetricSystem)
register_pytree(**_RIEMANNIAN_FIELDS)(DenseRiemannianMetricSystem)
