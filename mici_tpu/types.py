"""Type aliases for the user-supplied callable vocabulary.

Reference: mici/types.py:28-146.  The aliases document the expected
signatures of every user-supplied callable (model functions, derivative
functions, trace functions, termination criteria); array types are JAX
arrays rather than NumPy arrays.
"""

from __future__ import annotations

from typing import Any, Callable, Union

import jax

ArrayLike = Union[jax.Array, Any]
ScalarLike = Union[float, jax.Array]

#: Function taking a position array and returning a scalar (e.g. a negative
#: log density).
ScalarFunction = Callable[[ArrayLike], ScalarLike]

#: Function taking a position array and returning an array.
ArrayFunction = Callable[[ArrayLike], ArrayLike]

#: Function returning the gradient of a scalar function — either the
#: gradient array alone or a 2-tuple of (gradient, value).
GradientFunction = Callable[[ArrayLike], Union[ArrayLike, tuple]]

#: Function returning the Hessian of a scalar function — either the 2D
#: Hessian array alone or a 3-tuple of (Hessian, gradient, value).
HessianFunction = Callable[[ArrayLike], Union[ArrayLike, tuple]]

#: Function returning the Jacobian of a vector function — either the 2D
#: Jacobian array alone or a 2-tuple of (Jacobian, value).
JacobianFunction = Callable[[ArrayLike], Union[ArrayLike, tuple]]

#: Matrix-Hessian-product of a vector-valued function: function of a 2D
#: array m returning sum(m[:, :, None] * hess, axis=(0, 1)).
MatrixHessianProduct = Callable[[ArrayLike], ArrayLike]

#: Function returning a MatrixHessianProduct (optionally with Jacobian and
#: value) at a position.
MatrixHessianProductFunction = Callable[[ArrayLike], Union[
    MatrixHessianProduct, tuple]]

#: Matrix-Tressian-product of a scalar-valued function: function of a 2D
#: array m returning sum(m[:, :, None] * tress, axis=(0, 1)).
MatrixTressianProduct = Callable[[ArrayLike], ArrayLike]

#: Function returning a MatrixTressianProduct (optionally with Hessian,
#: gradient and value) at a position.
MatrixTressianProductFunction = Callable[[ArrayLike], Union[
    MatrixTressianProduct, tuple]]

#: Vector-Jacobian-product: function of an array v (same shape as function
#: output) returning sum(v[..., None] * jacob, axis=leading).
VectorJacobianProduct = Callable[[ArrayLike], ArrayLike]

#: Function returning a VectorJacobianProduct (optionally with value).
VectorJacobianProductFunction = Callable[[ArrayLike], Union[
    VectorJacobianProduct, tuple]]

#: Function of the chain state returning a dict of arrays to record.
TraceFunction = Callable[[Any], dict]

#: No-U-turn style termination criterion:
#: (system, state_1, state_2, sum_mom) -> bool.
TerminationCriterion = Callable[[Any, Any, Any, ArrayLike], ArrayLike]

#: Function reducing per-chain log step sizes to a single step size.
ReducerFunction = Callable[[ArrayLike], ScalarLike]

#: Function extracting the statistic controlled by step size adaptation.
AdaptationStatisticFunction = Callable[[dict], ScalarLike]

#: Adapter state pytree (dict of arrays).
AdapterState = dict

#: Dictionary of transition statistics.
TransitionStatistics = dict

#: Norm function for convergence checks.
NormFunction = Callable[[ArrayLike], ScalarLike]

#: Solver for fixed point equations func(x) = x returning (x, error_flag).
FixedPointSolver = Callable[..., tuple]

#: Solver projecting a state onto a constraint manifold.
ProjectionSolver = Callable[..., Any]

#: Matrix-like: structured matrix object or array.
MetricLike = Any
MatrixLike = Any
