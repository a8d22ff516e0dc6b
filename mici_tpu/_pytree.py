"""Pytree registration helper for framework objects.

The reference library (mici) uses mutable Python objects; this framework is
built on immutable pytree objects so that systems, integrators, transitions
and linear operators can be passed straight through ``jax.jit`` / ``vmap`` /
``shard_map`` boundaries.  Unlike :func:`jax.tree_util.register_dataclass`
this helper keeps ordinary (coercing) ``__init__`` signatures — matching the
reference API — while unflattening bypasses ``__init__`` entirely so traced
leaves are never re-validated inside transforms.

Static fields holding plain Python functions (model densities, constraint
functions, metric factories, ...) are wrapped in :class:`ValueHashedCallable`
at flatten time so that *identically defined* functions compare equal in
jit cache keys: users (and benchmarks) recreating a model/sampler of the
same configuration hit the existing traced program instead of paying a
full retrace per fresh closure object (~1.4 s for a 1024-chain stage
program; the XLA executable cache already de-duplicated the compile).
"""

from __future__ import annotations

import numpy as np
from jax import tree_util


def _values_equal(a, b, depth=0, _seen=None):
    """Conservative structural equality for closure contents.

    Array-aware (compares by value), function-aware (compares code objects
    and recurses into closures), pytree-object-aware (compares statics +
    children structurally), cycle-tolerant (an object pair already under
    comparison higher in the recursion is treated as equal — coinductive
    equality, needed because pytree statics can hold bound methods of the
    object itself), bounded depth; anything uncertain compares unequal —
    the failure mode is a retrace, never a wrong cache hit on differing
    values."""
    if a is b:
        return True
    if depth > 10:
        return False
    if _seen is None:
        _seen = set()
    pair = (id(a), id(b))
    if pair in _seen:
        return True
    _seen = _seen | {pair}
    if callable(a) and hasattr(a, "__code__"):
        if not (callable(b) and hasattr(b, "__code__")):
            return False
        if a.__code__ is not b.__code__ and a.__code__ != b.__code__:
            return False
        # Bound methods: same code on different instances is NOT equal
        # unless the instances themselves compare equal.
        sa = getattr(a, "__self__", None)
        sb = getattr(b, "__self__", None)
        if (sa is not None or sb is not None) and not _values_equal(
            sa, sb, depth + 1, _seen,
        ):
            return False
        ca = a.__closure__ or ()
        cb = b.__closure__ or ()
        if len(ca) != len(cb):
            return False
        da = a.__defaults__ or ()
        db = b.__defaults__ or ()
        if len(da) != len(db):
            return False
        return all(
            _values_equal(x.cell_contents, y.cell_contents, depth + 1,
                          _seen)
            for x, y in zip(ca, cb)
        ) and all(
            _values_equal(x, y, depth + 1, _seen) for x, y in zip(da, db)
        )
    if hasattr(a, "shape") and hasattr(a, "dtype"):
        if not (hasattr(b, "shape") and hasattr(b, "dtype")):
            return False
        try:
            return bool(np.array_equal(np.asarray(a), np.asarray(b)))
        except Exception:
            return False
    if isinstance(a, ValueHashedCallable) or isinstance(
            b, ValueHashedCallable):
        fa = a.fn if isinstance(a, ValueHashedCallable) else a
        fb = b.fn if isinstance(b, ValueHashedCallable) else b
        return _values_equal(fa, fb, depth + 1, _seen)
    if type(a) is not type(b):
        return False
    if isinstance(a, (tuple, list)):
        return len(a) == len(b) and all(
            _values_equal(x, y, depth + 1, _seen) for x, y in zip(a, b)
        )
    if isinstance(a, dict):
        return a.keys() == b.keys() and all(
            _values_equal(v, b[k], depth + 1, _seen) for k, v in a.items()
        )
    if hasattr(type(a), "_pytree_static_fields"):
        # Framework pytree objects (systems, integrators, operators):
        # compare structurally — statics (value-hash-wrapped at flatten
        # time) and array children by value.  This is what makes *bound
        # methods* of identically configured objects compare equal (e.g.
        # SoftAbs systems expose their metric as the bound method
        # `system._hess_only`; without this, every freshly constructed
        # system missed the jit trace cache and re-paid a ~20 s
        # stage-program trace — measured, config 3).
        ca, xa = a.tree_flatten()
        cb, xb = b.tree_flatten()
        return _values_equal(xa, xb, depth + 1, _seen) and _values_equal(
            ca, cb, depth + 1, _seen,
        )
    try:
        return bool(a == b)
    except Exception:
        return False


class ValueHashedCallable:
    """Callable wrapper whose jit-cache identity is its *definition*.

    Hashes by the function's code object and compares closures/defaults
    by value (:func:`_values_equal`), so two closures produced by the
    same source with equal captured values are interchangeable static
    arguments."""

    __slots__ = ("fn",)

    def __init__(self, fn):
        self.fn = fn

    def __call__(self, *args, **kwargs):
        return self.fn(*args, **kwargs)

    def __getattr__(self, name):
        return getattr(self.fn, name)

    def __hash__(self):
        return hash(getattr(self.fn, "__code__", self.fn))

    def __eq__(self, other):
        if self is other:
            return True
        if not isinstance(other, ValueHashedCallable):
            return NotImplemented
        return _values_equal(self.fn, other.fn)

    def __repr__(self):
        return f"ValueHashedCallable({self.fn!r})"


def _hashable_static(value):
    """Wrap plain functions so equal definitions hash/compare equal."""
    if isinstance(value, ValueHashedCallable):
        return value
    if callable(value) and hasattr(value, "__code__"):
        try:
            cached = value.__dict__.get("_mici_tpu_value_hashed")
        except AttributeError:
            cached = None
        if cached is None:
            cached = ValueHashedCallable(value)
            try:
                value._mici_tpu_value_hashed = cached
            except (AttributeError, TypeError):
                pass
        return cached
    return value


def register_pytree(data_fields, static_fields=()):
    """Class decorator registering attribute-based pytree flattening.

    Args:
        data_fields: Attribute names holding array-like (traced) children.
        static_fields: Attribute names treated as static auxiliary data
            (hashable; participate in jit cache keys).
    """

    data_fields = tuple(data_fields)
    static_fields = tuple(static_fields)

    def wrap(cls):
        def tree_flatten(self):
            children = tuple(getattr(self, name) for name in data_fields)
            aux = tuple(
                _hashable_static(getattr(self, name))
                for name in static_fields
            )
            return children, aux

        def tree_flatten_with_keys(self):
            children = tuple(
                (tree_util.GetAttrKey(name), getattr(self, name))
                for name in data_fields
            )
            aux = tuple(
                _hashable_static(getattr(self, name))
                for name in static_fields
            )
            return children, aux

        @classmethod
        def tree_unflatten(cls_, aux, children):
            obj = object.__new__(cls_)
            for name, value in zip(data_fields, children):
                object.__setattr__(obj, name, value)
            for name, value in zip(static_fields, aux):
                object.__setattr__(obj, name, value)
            return obj

        def replace(self, **updates):
            """Return a copy of the object with the given fields replaced."""
            obj = object.__new__(type(self))
            for name in data_fields + static_fields:
                object.__setattr__(obj, name, getattr(self, name))
            for name, value in updates.items():
                if name not in data_fields and name not in static_fields:
                    msg = f"Unknown field {name!r} for {type(self).__name__}."
                    raise ValueError(msg)
                object.__setattr__(obj, name, value)
            return obj

        cls._pytree_data_fields = data_fields
        cls._pytree_static_fields = static_fields
        cls.tree_flatten = tree_flatten
        cls.tree_flatten_with_keys = tree_flatten_with_keys
        cls.tree_unflatten = tree_unflatten
        if not hasattr(cls, "replace"):
            cls.replace = replace
        tree_util.register_pytree_with_keys_class(cls)
        return cls

    return wrap
