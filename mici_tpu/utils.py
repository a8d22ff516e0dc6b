"""Utility functions and classes.

Reference: mici/utils.py.  The reference's ``LogRepFloat`` (a log-domain
positive scalar used for NUTS multinomial tree weights, mici/utils.py:85-200)
is unnecessary here: inside compiled code all tree weights are carried
directly in log space and combined with :func:`log_sum_exp` /
:func:`log_diff_exp`.  A host-side ``LogRepFloat`` shim lives in
:mod:`mici_tpu.compat` and is re-exported here for reference import parity
(``mici.utils.LogRepFloat``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def hash_array(array) -> int:
    """Compute hash of a NumPy array by hashing underlying data buffer.

    Reference: mici/utils.py:23-43 (the xxhash fast path is dropped — this is
    only used host-side for operator equality checks in tests).
    """
    array = np.ascontiguousarray(array)
    return hash(array.data.tobytes())


def log1p_exp(val):
    """Numerically stable implementation of ``log(1 + exp(val))``.

    Reference: mici/utils.py:49-60.
    """
    return jnp.logaddexp(0.0, val)


def log1m_exp(val):
    """Numerically stable implementation of ``log(1 - exp(val))`` for val < 0.

    Reference: mici/utils.py:63-69.
    """
    return jnp.where(
        val >= 0.0,
        jnp.nan,
        jnp.where(
            val > -0.693147180559945,  # log(2)
            jnp.log(-jnp.expm1(jnp.minimum(val, -jnp.finfo(
                jnp.result_type(val, float)).tiny))),
            jnp.log1p(-jnp.exp(val)),
        ),
    )


def log_sum_exp(val1, val2):
    """Numerically stable implementation of ``log(exp(val1) + exp(val2))``.

    Reference: mici/utils.py:72-76.
    """
    return jnp.logaddexp(val1, val2)


def log_diff_exp(val1, val2):
    """Numerically stable implementation of ``log(exp(val1) - exp(val2))``.

    Reference: mici/utils.py:79-82.  Returns NaN where ``val1 < val2``.
    """
    return val1 + log1m_exp(val2 - val1)


# Re-exported for reference import parity (mici/utils.py exports LogRepFloat).
from mici_tpu.compat import LogRepFloat  # noqa: E402

__all__ = [
    "hash_array", "log1p_exp", "log1m_exp", "log_sum_exp", "log_diff_exp",
    "LogRepFloat",
]
