"""Automatic differentiation operator vocabulary.

Reference: mici/autodiff/__init__.py:50-178.  The reference maintains a
registry of interchangeable AD backends (jax / jax_nojit / autograd /
symnum) because its execution model is NumPy-driven; here the execution
model *is* JAX, so the six differential operators
(``DIFF_OPS``, mici/autodiff/__init__.py:50-63) are implemented directly
with ``jax.grad`` / ``jax.vjp`` / ``jax.jacfwd`` compositions (cf.
mici/autodiff/jax_wrapper.py:99-223).  A backend registry is retained so
user-supplied derivative systems remain pluggable, but every built-in
backend name maps to these native implementations (``jax_nojit`` included —
under ``jit`` tracing the distinction disappears).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

#: Names of differential operators (mici/autodiff/__init__.py:50-63).
DIFF_OPS = (
    # vjp and value of function
    "vjp_and_value",
    # gradient and value of scalar-valued function
    "grad_and_value",
    # Hessian, gradient and value of scalar-valued function
    "hessian_grad_and_value",
    # matrix-Tressian-product, Hessian, gradient and value of scalar function
    "mtp_hessian_grad_and_value",
    # Jacobian and value of vector-valued function
    "jacobian_and_value",
    # matrix-Hessian-product, Jacobian and value of vector-valued function
    "mhp_jacobian_and_value",
)


def grad_and_value(func):
    """Makes function returning gradient and value of scalar function.

    Reference: mici/autodiff/jax_wrapper.py:99-106.
    """

    def wrapped(x):
        value, grad = jax.value_and_grad(func)(x)
        return grad, value

    return wrapped


def vjp_and_value(func):
    """Makes function returning VJP closure and value of function.

    Reference: mici/autodiff/jax_wrapper.py:122-141.  The returned VJP takes
    a cotangent of the same shape as ``func``'s output and returns the
    product summed over output indices.
    """

    def wrapped(x):
        value, vjp_fn = jax.vjp(func, x)

        def vjp(cotangent):
            return vjp_fn(jnp.asarray(cotangent))[0]

        return vjp, value

    return wrapped


def jacobian_and_value(func):
    """Makes function returning Jacobian and value of vector function.

    Reference: mici/autodiff/jax_wrapper.py:144-153.
    """

    def wrapped(x):
        jac = jax.jacfwd(func)(x)
        value = func(x)
        return jac, value

    return wrapped


def mhp_jacobian_and_value(func):
    """Makes function returning MHP, Jacobian and value of vector function.

    The matrix-Hessian-product (MHP) of a vector function ``c`` is
    ``mhp(m) = sum(m[:, :, None] * hess[:, :, :], axis=(0, 1))`` with
    ``hess[i, j, k] = d2 c[i] / (dq[j] dq[k])`` — i.e. the VJP of the
    Jacobian function.  Reference: mici/autodiff/jax_wrapper.py:156-177.
    """

    jac_func = jax.jacfwd(func)

    def wrapped(x):
        jac, mhp_vjp = jax.vjp(jac_func, x)

        def mhp(m):
            return mhp_vjp(jnp.asarray(m))[0]

        value = func(x)
        return mhp, jac, value

    return wrapped


def hessian_grad_and_value(func):
    """Makes function returning Hessian, gradient and value of scalar function.

    Reference: mici/autodiff/jax_wrapper.py:180-194.
    """

    grad_func = jax.grad(func)

    def wrapped(x):
        hess = jax.jacfwd(grad_func)(x)
        value, grad = jax.value_and_grad(func)(x)
        return hess, grad, value

    return wrapped


def mtp_hessian_grad_and_value(func):
    """Makes function returning MTP, Hessian, gradient and value.

    The matrix-Tressian-product (MTP) of a scalar function ``f`` is
    ``mtp(m) = sum(m[:, :, None] * tress[:, :, :], axis=(0, 1))`` with
    ``tress`` the 3D array of third derivatives — i.e. the VJP of the
    Hessian function.  Reference: mici/autodiff/jax_wrapper.py:197-223.
    """

    hess_func = jax.jacfwd(jax.grad(func))

    def wrapped(x):
        hess, mtp_vjp = jax.vjp(hess_func, x)

        def mtp(m):
            return mtp_vjp(jnp.asarray(m))[0]

        value, grad = jax.value_and_grad(func)(x)
        return mtp, hess, grad, value

    return wrapped


_JAX_BACKEND = {
    "grad_and_value": grad_and_value,
    "vjp_and_value": vjp_and_value,
    "jacobian_and_value": jacobian_and_value,
    "mhp_jacobian_and_value": mhp_jacobian_and_value,
    "hessian_grad_and_value": hessian_grad_and_value,
    "mtp_hessian_grad_and_value": mtp_hessian_grad_and_value,
}

#: Available backends (mici/autodiff/__init__.py:80-93).  The built-in
#: ``jax`` names resolve to the native JAX implementations; a ``torch``
#: backend (the analogue of the reference's ``autograd`` backend — an AD
#: library other than the execution framework) registers when PyTorch is
#: importable (see mici_tpu/autodiff/torch_wrapper.py).
BACKENDS = {
    None: _JAX_BACKEND,
    "jax": _JAX_BACKEND,
    "jax_nojit": _JAX_BACKEND,
}

try:
    import torch as _torch_mod  # noqa: F401

    from mici_tpu.autodiff import torch_wrapper as _torch_wrapper

    BACKENDS["torch"] = _torch_wrapper.TORCH_BACKEND
except ImportError:  # pragma: no cover - torch optional
    pass


def register_backend(name: str, ops: dict) -> None:
    """Register a custom AD backend mapping op names to factories."""
    missing = set(DIFF_OPS) - set(ops)
    if missing:
        msg = f"Backend {name} missing operators: {sorted(missing)}."
        raise ValueError(msg)
    BACKENDS[name] = ops


def wrap_function(function, backend=None):
    """Apply function wrappers for a backend.

    Reference: mici/autodiff/__init__.py:108-128.  The reference applies
    backend-specific wrappers (jit + array conversion); the native JAX
    backends need no wrapping, while foreign-framework backends (e.g.
    ``torch``) provide a ``__wrap_function__`` hook making the user
    function callable from compiled JAX code.  An unregistered backend
    name is an error as in the reference.
    """
    if backend not in BACKENDS:
        msg = (
            f"Automatic differentiation backend {backend!r} is not "
            f"registered (available: {sorted(k for k in BACKENDS if k)!r})."
        )
        raise ValueError(msg)
    wrapper = BACKENDS[backend].get("__wrap_function__")
    return wrapper(function) if wrapper is not None else function


def autodiff_fallback(diff_func, func, diff_op_name: str, name: str,
                      backend=None):
    """Select user-provided derivative function or AD fallback.

    Reference: mici/autodiff/__init__.py:131-178.

    Args:
        diff_func: Either a user-provided function to compute the derivative
            (used directly if not None) or None.
        func: Function to differentiate.
        diff_op_name: Name of the differential operator in DIFF_OPS.
        name: Human-readable name of derivative for error messages.
        backend: Name of AD backend to use.
    """
    if diff_func is not None:
        return diff_func
    if diff_op_name not in DIFF_OPS:
        msg = f"Differential operator {diff_op_name} is not defined."
        raise ValueError(msg)
    if backend not in BACKENDS:
        msg = (
            f"{name} is not specified and automatic differentiation backend "
            f"{backend!r} is not registered (available: "
            f"{sorted(k for k in BACKENDS if k)!r})."
        )
        raise ValueError(msg)
    return BACKENDS[backend][diff_op_name](func)
