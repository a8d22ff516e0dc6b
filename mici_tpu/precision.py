"""Matmul-precision policy for the compiled sampling engine.

On TPU, JAX's default matmul precision computes f32 ``dot_general`` /
``matmul`` operands in bfloat16 on the MXU (~8 significand bits).  For
the iterative numerics at the heart of this framework — fixed-point
solves inside implicit integrators, constraint projections, metric
factorizations, momentum draws through a metric square root — that
silently caps attainable residuals near 1e-3 and breaks detailed
balance: measured on the SoftAbs RMHMC benchmark (BASELINE config 3),
default precision fails fixed-point convergence on 27% of transitions
(acceptance 0.67, visibly biased posterior moments) where ``highest``
precision matches the f64 reference exactly (acceptance 0.988, unbiased
moments; see docs/BENCHMARKS.md round-3 note).

Every compiled entry point of the framework therefore traces its
numerics under ``jax.default_matmul_precision(get_matmul_precision())``,
defaulting to ``"highest"`` (full-f32 multiply accumulation).  The HMC
hot path is dominated by small matrix-vector work and per-op overhead
rather than MXU throughput, so the measured steady-state cost is nil;
workloads dominated by genuinely large matmuls can opt back into the
hardware default with :func:`set_matmul_precision`.

The reference (CPU/NumPy, always f64) has no analogue; this is a
TPU-native correctness requirement (cf. the f32 tolerance policy in
mici_tpu/solvers.py:20-58).
"""

from __future__ import annotations

import contextlib

import jax

#: Module-level policy consumed (at trace time) by the engine entry
#: points.  One of "default", "float32"/"highest", "tensorfloat32",
#: "bfloat16" — the values `jax.default_matmul_precision` accepts.
_MATMUL_PRECISION = "highest"


def get_matmul_precision():
    """The matmul precision the compiled engine traces under."""
    return _MATMUL_PRECISION


def set_matmul_precision(precision):
    """Set the engine matmul precision (see module docstring).

    Takes effect for programs traced afterwards; already-compiled
    programs in jit caches keep the precision they were traced with.
    """
    global _MATMUL_PRECISION
    _MATMUL_PRECISION = precision


def matmul_precision_scope():
    """Context manager applying the engine matmul-precision policy.

    Used inside jitted entry-point bodies so every ``dot_general``
    traced within gets the policy's precision; a no-op scope when the
    policy is "default".
    """
    if _MATMUL_PRECISION == "default":
        return contextlib.nullcontext()
    return jax.default_matmul_precision(_MATMUL_PRECISION)
