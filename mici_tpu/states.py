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

import jax
import jax.numpy as jnp
import numpy as np

from mici_tpu._pytree import register_pytree
from mici_tpu import errors


def _as_state_array(value, dtype=None):
    """Coerce to an array WITHOUT forcing a device transfer.

    Host inputs (lists, numpy arrays, scalars) stay numpy so that batched
    driver paths can stack hundreds of per-chain states on the host and
    upload the whole batch in one transfer at the jit boundary — per-chain
    ``jnp.asarray`` device puts cost one round trip each and dominated
    ``sample_chains`` startup at 1024 chains on remote backends.  Traced
    or on-device values pass through unchanged.
    """
    if value is None:
        return None
    if isinstance(value, (jax.Array, jax.core.Tracer)):
        return value if dtype is None else jnp.asarray(value, dtype)
    return np.asarray(value) if dtype is None else np.asarray(value, dtype)


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


#: Named fast-path state fields (always present as direct attributes).
_CORE_FIELDS = ("pos", "mom", "dir", "error", "aux")


@register_pytree(
    data_fields=("pos", "mom", "dir", "error", "aux", "variables"),
)
class ChainState:
    """Immutable chain state: named fast-path fields plus free variables.

    Reference: mici/states.py:160-305, where ``ChainState(**variables)``
    accepts an arbitrary set of state variables so that non-Hamiltonian
    transitions over any variable set can run through the same generic
    `MarkovChainMonteCarloMethod` driver.  This pytree keeps the
    Hamiltonian fast paths — ``pos`` / ``mom`` / ``dir`` as direct fields —
    and stores any further keyword variables in the ``variables`` dict
    pytree, exposed as attributes (``state.x`` for
    ``ChainState(x=...)``).  Unlike the reference object this is an
    immutable pytree; use :meth:`replace` to derive updated states.
    ``error`` is an int32 bitmask of in-flight integrator error flags (see
    :mod:`mici_tpu.errors`).

    ``aux`` is a dict pytree of *position-dependent* derived quantities
    (negative log density value/gradient, metric operator, constraint
    Jacobian, ...) threaded through integrator steps — the explicit,
    compiler-friendly replacement for the reference's dependency-tracked
    memoization cache (mici/states.py:37-157).  It is managed by
    ``system.prepare_state`` and integrator steps; user code can ignore it.
    """

    def __init__(self, pos=None, mom=None, dir=1, error=None, aux=None,
                 _read_only=False, **variables):
        object.__setattr__(self, "pos", _as_state_array(pos))
        object.__setattr__(self, "mom", _as_state_array(mom))
        object.__setattr__(
            self, "dir", _as_state_array(dir, dtype=jnp.int32),
        )
        if error is None:
            error = np.zeros((), dtype=np.int32)
        object.__setattr__(
            self, "error", _as_state_array(error, dtype=jnp.int32),
        )
        object.__setattr__(self, "aux", {} if aux is None else aux)
        for name in variables:
            if name.startswith("_") or name == "copy":
                msg = (
                    f"Invalid state variable name {name!r}: names must not "
                    "start with an underscore or shadow 'copy' "
                    "(reference: mici/states.py:186-198)."
                )
                raise ValueError(msg)
        object.__setattr__(self, "variables", dict(variables))

    def __getattr__(self, name):
        # Only reached when normal attribute lookup fails; expose free
        # state variables (reference: mici/states.py:240-246).
        if not name.startswith("_"):
            variables = self.__dict__.get("variables")
            if variables is not None and name in variables:
                return variables[name]
        msg = f"{type(self).__name__!s} has no attribute {name!r}."
        raise AttributeError(msg)

    def __setattr__(self, name, value):
        msg = (
            "ChainState is immutable: use state.replace("
            f"{name}=...) to derive an updated state."
        )
        raise errors.ReadOnlyStateError(msg)

    def replace(self, **updates):
        """Return a copy of the state with the given fields replaced.

        Accepts the named fast-path fields (``pos``/``mom``/``dir``/
        ``error``/``aux``), the ``variables`` dict as a whole, or any
        individual free variable name present on this state.
        """
        obj = object.__new__(ChainState)
        for name in _CORE_FIELDS:
            object.__setattr__(obj, name, getattr(self, name))
        variables = self.variables
        var_updates = {}
        for name, value in updates.items():
            if name in _CORE_FIELDS:
                object.__setattr__(obj, name, value)
            elif name == "variables":
                variables = value
            elif name in variables:
                var_updates[name] = value
            else:
                msg = f"Unknown field {name!r} for ChainState."
                raise ValueError(msg)
        if var_updates:
            variables = {**variables, **var_updates}
        object.__setattr__(obj, "variables", variables)
        return obj

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
        extra = "".join(
            f", {name}={value!r}" for name, value in self.variables.items()
        )
        return (
            f"ChainState(pos={self.pos!r}, mom={self.mom!r}, "
            f"dir={self.dir!r}, error={self.error!r}{extra})"
        )
