"""Utility functions and classes.

Reference: mici/utils.py.  The reference's ``LogRepFloat`` (a log-domain
positive scalar used for NUTS multinomial tree weights, mici/utils.py:85-200)
is unnecessary here: inside compiled code all tree weights are carried
directly in log space and combined with :func:`log_sum_exp` /
:func:`log_diff_exp`.  A thin ``LogRepFloat`` shim is still exported for API
parity with host-side user code.
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


class LogRepFloat:
    """Positive scalar represented on a logarithmic scale (host-side shim).

    Reference: mici/utils.py:85-200.  In compiled sampling code log-space
    scalars are plain arrays; this class exists only so host-side user code
    written against the reference API keeps working.
    """

    def __init__(self, val=None, log_val=None):
        if log_val is None:
            if val is None:
                msg = "One of val or log_val must be specified."
                raise ValueError(msg)
            if val > 0:
                self.log_val = np.log(val)
            elif val == 0:
                self.log_val = -np.inf
            else:
                msg = "val must be non-negative."
                raise ValueError(msg)
        else:
            if val is not None:
                msg = "Specify only one of val and log_val."
                raise ValueError(msg)
            self.log_val = log_val

    @property
    def val(self):
        return np.exp(self.log_val)

    def __add__(self, other):
        if isinstance(other, LogRepFloat):
            return LogRepFloat(log_val=np.logaddexp(self.log_val, other.log_val))
        return self.val + other

    __radd__ = __add__

    def __sub__(self, other):
        if isinstance(other, LogRepFloat):
            if self.log_val >= other.log_val:
                with np.errstate(divide="ignore"):
                    return LogRepFloat(
                        log_val=float(
                            log_diff_exp(self.log_val, other.log_val)
                        ),
                    )
            msg = "Cannot subtract larger LogRepFloat from smaller."
            raise ValueError(msg)
        return self.val - other

    def __mul__(self, other):
        if isinstance(other, LogRepFloat):
            return LogRepFloat(log_val=self.log_val + other.log_val)
        return self.val * other

    __rmul__ = __mul__

    def __truediv__(self, other):
        if isinstance(other, LogRepFloat):
            return LogRepFloat(log_val=self.log_val - other.log_val)
        return self.val / other

    def __lt__(self, other):
        if isinstance(other, LogRepFloat):
            return self.log_val < other.log_val
        return self.val < other

    def __gt__(self, other):
        if isinstance(other, LogRepFloat):
            return self.log_val > other.log_val
        return self.val > other

    def __le__(self, other):
        if isinstance(other, LogRepFloat):
            return self.log_val <= other.log_val
        return self.val <= other

    def __ge__(self, other):
        if isinstance(other, LogRepFloat):
            return self.log_val >= other.log_val
        return self.val >= other

    def __eq__(self, other):
        if isinstance(other, LogRepFloat):
            return self.log_val == other.log_val
        return self.val == other

    def __hash__(self):
        return hash(self.log_val)

    def __repr__(self):
        return f"LogRepFloat(val={self.val})"
