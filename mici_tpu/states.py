"""Chain state pytree.

Reference: mici/states.py.  The reference ``ChainState`` is a mutable
container with a dependency-tracked memoization cache
(``cache_in_state`` / ``cache_in_state_with_aux``, mici/states.py:37-157):
writing ``state.pos`` invalidates cached values derived from the position.

The TPU-native design inverts this: ``ChainState`` is an **immutable pytree**
and the memoization cache disappears entirely — within a single ``jit``
trace XLA's common-subexpression elimination merges repeated evaluations of
the same pure function at the same position, and *across* integrator steps
values worth reusing (the gradient of the negative log density, the
Hamiltonian, solver by-products) are threaded explicitly through integrator
and transition carries.  A per-chain integer ``error`` bitmask replaces the
reference's exception-based failure propagation (mici/errors.py,
mici/transitions.py:33-43).
"""

from __future__ import annotations

import jax.numpy as jnp

from mici_tpu._pytree import register_pytree
from mici_tpu import errors


def cache_in_state(*depends_on):
    """Decorator marking a system method as a cached function of state.

    Reference: mici/states.py:37-75.  In the reference this memoizes the
    method value in the chain state's cache, invalidated when any of the
    ``depends_on`` variables is written.  Under ``jit`` tracing, repeated
    evaluations of the same pure method at the same state are merged by
    XLA common-subexpression elimination, so this decorator is a no-op
    kept for API compatibility with reference-style custom systems — the
    caching it expressed happens in the compiler.
    """

    def decorator(method):
        method._cache_depends_on = tuple(depends_on)
        return method

    return decorator


def cache_in_state_with_aux(depends_on, auxiliary_outputs):
    """Decorator for methods computing auxiliary outputs as a by-product.

    Reference: mici/states.py:78-157.  As :func:`cache_in_state`, this is
    a compatibility no-op: auxiliary-output reuse (e.g. the density value
    from a gradient forward pass) is expressed by the ``aux`` dict threaded
    through states and recovered by XLA CSE elsewhere.
    """
    if isinstance(depends_on, str):
        depends_on = (depends_on,)
    if isinstance(auxiliary_outputs, str):
        auxiliary_outputs = (auxiliary_outputs,)

    def decorator(method):
        method._cache_depends_on = tuple(depends_on)
        method._cache_auxiliary_outputs = tuple(auxiliary_outputs)
        return method

    return decorator


@register_pytree(data_fields=("pos", "mom", "dir", "error", "aux"))
class ChainState:
    """Immutable chain state: position, momentum, integration direction.

    Reference: mici/states.py:160-305.  Unlike the reference object this is
    an immutable pytree; use :meth:`replace` (or keyword-style ``copy``) to
    derive updated states.  ``error`` is an int32 bitmask of in-flight
    integrator error flags (see :mod:`mici_tpu.errors`).

    ``aux`` is a dict pytree of *position-dependent* derived quantities
    (negative log density value/gradient, metric operator, constraint
    Jacobian, ...) threaded through integrator steps — the explicit,
    compiler-friendly replacement for the reference's dependency-tracked
    memoization cache (mici/states.py:37-157).  It is managed by
    ``system.prepare_state`` and integrator steps; user code can ignore it.
    """

    def __init__(self, pos, mom=None, dir=1, error=None, aux=None,
                 _read_only=False):
        pos = jnp.asarray(pos)
        object.__setattr__(self, "pos", pos)
        object.__setattr__(
            self, "mom", None if mom is None else jnp.asarray(mom),
        )
        object.__setattr__(self, "dir", jnp.asarray(dir, dtype=jnp.int32))
        if error is None:
            error = jnp.zeros((), dtype=jnp.int32)
        object.__setattr__(self, "error", jnp.asarray(error, jnp.int32))
        object.__setattr__(self, "aux", {} if aux is None else aux)

    def __setattr__(self, name, value):
        msg = (
            "ChainState is immutable: use state.replace("
            f"{name}=...) to derive an updated state."
        )
        raise errors.ReadOnlyStateError(msg)

    def copy(self, *, read_only: bool = False):
        """Return state copy (a no-op alias kept for reference API parity)."""
        return self

    @property
    def has_error(self):
        """Boolean scalar: any integrator error bit set."""
        return self.error != 0

    def with_error_bit(self, bit, condition):
        """Return state with ``bit`` OR-ed into error where ``condition``."""
        new_error = jnp.where(
            condition, self.error | jnp.int32(bit), self.error,
        )
        return self.replace(error=new_error)

    def clear_error(self):
        return self.replace(error=jnp.zeros_like(self.error))

    def __repr__(self):
        return (
            f"ChainState(pos={self.pos!r}, mom={self.mom!r}, "
            f"dir={self.dir!r}, error={self.error!r})"
        )
