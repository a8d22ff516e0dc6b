"""Host-side compatibility shims for reference-API user code.

Objects in this module are *not* used by the compiled sampling path — they
exist so host-side user code written against the reference API (mici)
keeps working unchanged.  Inside compiled code the equivalents are plain
log-space arrays combined with :func:`mici_tpu.utils.log_sum_exp` /
:func:`mici_tpu.utils.log_diff_exp`.
"""

from __future__ import annotations

import numpy as np


def _log_diff_exp(val1, val2):
    # Host-side (NumPy) scalar log(exp(val1) - exp(val2)) matching the
    # reference edge cases (mici/utils.py:74-82): -inf for equal values
    # (and for two -inf inputs), nan when val1 < val2.
    if val1 == -np.inf and val2 == -np.inf:
        return -np.inf
    if val1 < val2:
        return np.nan
    if val1 == val2:
        return -np.inf
    return val1 + np.log(
        -np.expm1(np.minimum(val2 - val1, -np.finfo(float).tiny)),
    )


class LogRepFloat:
    """Positive scalar represented on a logarithmic scale (host-side shim).

    Reference: mici/utils.py:85-200, where this class carries the NUTS
    multinomial tree weights through the recursive tree build.  The
    compiled NUTS transitions here carry weights directly in log space
    (mici_tpu/transitions.py), so this class is host-side compatibility
    only.
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
            return LogRepFloat(
                log_val=np.logaddexp(self.log_val, other.log_val),
            )
        return self.val + other

    __radd__ = __add__

    def __sub__(self, other):
        if isinstance(other, LogRepFloat):
            if self.log_val >= other.log_val:
                with np.errstate(divide="ignore"):
                    return LogRepFloat(
                        log_val=float(
                            _log_diff_exp(self.log_val, other.log_val)
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
