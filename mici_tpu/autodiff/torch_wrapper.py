"""PyTorch automatic-differentiation backend.

Reference: mici/autodiff/autograd_wrapper.py — the reference registers an
``autograd`` backend so models written against a different array library
can still supply derivatives.  Here the second backend is **PyTorch** (the
analogous "not the execution framework" AD library available in this
environment): the user writes ``neg_log_dens`` / ``constr`` with
``torch`` ops, and the six differential operators are computed by
``torch.func`` on host, exposed to compiled JAX sampling code through
``jax.pure_callback``.

This keeps the whole sampling loop compiled on device with only the model
evaluations crossing to host — the same boundary the PyMC/Stan interop
bridges use (mici_tpu/interop.py).  Output shapes for the callbacks are
established by probing the torch function once per distinct input shape
at trace time.
"""

from __future__ import annotations

import functools

import numpy as np


def _torch():
    import torch

    return torch


def _canonical_dtype():
    import jax.numpy as jnp

    return np.dtype(jnp.result_type(float))


@functools.lru_cache(maxsize=None)
def _probe_output_shape(func, x_shape):
    """Evaluate ``func`` on a dummy input to learn its output shape."""
    torch = _torch()
    for make in (torch.ones, torch.zeros):
        try:
            out = func(make(x_shape, dtype=torch.float64))
            return tuple(out.shape)
        except Exception:  # noqa: BLE001 - fall through to next probe
            continue
    msg = (
        "Could not probe output shape of torch function (evaluation "
        "failed on ones and zeros inputs); wrap it to handle dummy inputs."
    )
    raise ValueError(msg)


def _callback(host_fn, result_shapes, *args):
    import jax

    dtype = _canonical_dtype()
    shapes = tuple(
        jax.ShapeDtypeStruct(shape, dtype) for shape in result_shapes
    )
    out = jax.pure_callback(
        host_fn, shapes if len(shapes) > 1 else shapes[0], *args,
        vmap_method="sequential",
    )
    return out


def _np(tensor, dtype):
    return np.asarray(tensor.detach().cpu().numpy(), dtype)


def _to_tensor(q):
    # copy: pure_callback may hand back non-writable numpy views, which
    # torch tensors cannot alias safely
    return _torch().as_tensor(np.array(q, np.float64, copy=True))


def wrap_function(func):
    """Make a torch scalar/array function callable from compiled JAX code."""
    def wrapped(x):
        torch = _torch()
        out_shape = _probe_output_shape(func, tuple(np.shape(x)))
        dtype = _canonical_dtype()

        def host(q):
            t = _to_tensor(q)
            return _np(func(t), dtype)

        return _callback(host, (out_shape,), x)

    return wrapped


def grad_and_value(func):
    """Reference semantics: mici/autodiff/autograd_wrapper.py grad op."""

    def wrapped(x):
        torch = _torch()
        dtype = _canonical_dtype()
        shape = tuple(np.shape(x))

        def host(q):
            t = _to_tensor(q)
            grad, val = torch.func.grad_and_value(func)(t)
            return _np(grad, dtype), _np(val, dtype)

        grad, val = _callback(host, (shape, ()), x)
        return grad, val

    return wrapped


def vjp_and_value(func):
    def wrapped(x):
        torch = _torch()
        dtype = _canonical_dtype()
        x_shape = tuple(np.shape(x))
        out_shape = _probe_output_shape(func, x_shape)

        def host_val(q):
            t = _to_tensor(q)
            return _np(func(t), dtype)

        value = _callback(host_val, (out_shape,), x)

        def vjp(cotangent):
            def host_vjp(q, ct):
                t = _to_tensor(q)
                _out, vjp_fn = torch.func.vjp(func, t)
                (tangent,) = vjp_fn(
                    _to_tensor(ct),
                )
                return _np(tangent, dtype)

            return _callback(host_vjp, (x_shape,), x, cotangent)

        return vjp, value

    return wrapped


def jacobian_and_value(func):
    def wrapped(x):
        torch = _torch()
        dtype = _canonical_dtype()
        x_shape = tuple(np.shape(x))
        out_shape = _probe_output_shape(func, x_shape)

        def host(q):
            t = _to_tensor(q)
            jac = torch.func.jacfwd(func)(t)
            return _np(jac, dtype), _np(func(t), dtype)

        jac, val = _callback(host, (out_shape + x_shape, out_shape), x)
        return jac, val

    return wrapped


def mhp_jacobian_and_value(func):
    def wrapped(x):
        torch = _torch()
        dtype = _canonical_dtype()
        x_shape = tuple(np.shape(x))
        out_shape = _probe_output_shape(func, x_shape)

        def host(q):
            t = _to_tensor(q)
            jac = torch.func.jacfwd(func)(t)
            return _np(jac, dtype), _np(func(t), dtype)

        jac, val = _callback(host, (out_shape + x_shape, out_shape), x)

        def mhp(m):
            def host_mhp(q, mm):
                t = _to_tensor(q)
                _jac, vjp_fn = torch.func.vjp(torch.func.jacfwd(func), t)
                (tangent,) = vjp_fn(
                    _to_tensor(mm),
                )
                return _np(tangent, dtype)

            return _callback(host_mhp, (x_shape,), x, m)

        return mhp, jac, val

    return wrapped


def hessian_grad_and_value(func):
    def wrapped(x):
        torch = _torch()
        dtype = _canonical_dtype()
        shape = tuple(np.shape(x))

        def host(q):
            t = _to_tensor(q)
            hess = torch.func.hessian(func)(t)
            grad, val = torch.func.grad_and_value(func)(t)
            return _np(hess, dtype), _np(grad, dtype), _np(val, dtype)

        hess, grad, val = _callback(
            host, (shape + shape, shape, ()), x,
        )
        return hess, grad, val

    return wrapped


def mtp_hessian_grad_and_value(func):
    def wrapped(x):
        torch = _torch()
        dtype = _canonical_dtype()
        shape = tuple(np.shape(x))

        def host(q):
            t = _to_tensor(q)
            hess = torch.func.hessian(func)(t)
            grad, val = torch.func.grad_and_value(func)(t)
            return _np(hess, dtype), _np(grad, dtype), _np(val, dtype)

        hess, grad, val = _callback(
            host, (shape + shape, shape, ()), x,
        )

        def mtp(m):
            def host_mtp(q, mm):
                t = _to_tensor(q)
                _h, vjp_fn = torch.func.vjp(torch.func.hessian(func), t)
                (tangent,) = vjp_fn(
                    _to_tensor(mm),
                )
                return _np(tangent, dtype)

            return _callback(host_mtp, (shape,), x, m)

        return mtp, hess, grad, val

    return wrapped


TORCH_BACKEND = {
    "grad_and_value": grad_and_value,
    "vjp_and_value": vjp_and_value,
    "jacobian_and_value": jacobian_and_value,
    "mhp_jacobian_and_value": mhp_jacobian_and_value,
    "hessian_grad_and_value": hessian_grad_and_value,
    "mtp_hessian_grad_and_value": mtp_hessian_grad_and_value,
    "__wrap_function__": wrap_function,
}
