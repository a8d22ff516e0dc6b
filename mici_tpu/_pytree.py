"""Pytree registration helper for framework objects.

The reference library (mici) uses mutable Python objects; this framework is
built on immutable pytree objects so that systems, integrators, transitions
and linear operators can be passed straight through ``jax.jit`` / ``vmap`` /
``shard_map`` boundaries.  Unlike :func:`jax.tree_util.register_dataclass`
this helper keeps ordinary (coercing) ``__init__`` signatures — matching the
reference API — while unflattening bypasses ``__init__`` entirely so traced
leaves are never re-validated inside transforms.
"""

from __future__ import annotations

from jax import tree_util


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
            aux = tuple(getattr(self, name) for name in static_fields)
            return children, aux

        def tree_flatten_with_keys(self):
            children = tuple(
                (tree_util.GetAttrKey(name), getattr(self, name))
                for name in data_fields
            )
            aux = tuple(getattr(self, name) for name in static_fields)
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
