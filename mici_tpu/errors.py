"""Exception types and in-graph error flags.

Reference: mici/errors.py:6-35.  The reference uses exceptions as per-step
control flow (an integrator failure propagates up and is caught by the
transition to mark a rejection).  Exceptions cannot cross a ``jax.jit``
boundary, so inside compiled code the same taxonomy is encoded as a per-chain
integer *error bitmask* threaded through the chain state
(:data:`DIVERGENCE_BIT` etc.); the exception classes below are retained for
host-side (Python level) validation errors and API parity.
"""

from __future__ import annotations

# In-graph error bits (carried in ``ChainState.error``, int32).
NO_ERROR = 0
#: Hamiltonian divergence (|delta_h| exceeded threshold); cf.
#: HamiltonianDivergenceError in the reference.
DIVERGENCE_BIT = 1
#: Iterative solver failed to converge; cf. ConvergenceError.
CONVERGENCE_BIT = 2
#: Reversibility check of implicit/constrained step failed; cf.
#: NonReversibleStepError.
NON_REVERSIBLE_BIT = 4
#: Numerical linear algebra failure (NaN in factorization output); cf.
#: LinAlgError.
LINALG_BIT = 8

INTEGRATOR_ERROR_BITS = (
    DIVERGENCE_BIT | CONVERGENCE_BIT | NON_REVERSIBLE_BIT | LINALG_BIT
)


class Error(RuntimeError):
    """Base class for errors."""


class IntegratorError(Error):
    """Error raised when integrator step fails."""


class NonReversibleStepError(IntegratorError):
    """Error raised when integrator step fails reversibility check."""


class ConvergenceError(IntegratorError):
    """Error raised when solver fails to converge within allowed iterations."""


class HamiltonianDivergenceError(IntegratorError):
    """Error raised when simulated Hamiltonian trajectory diverges."""


class AdaptationError(Error):
    """Error raised when adaptation of transition parameters fails."""


class ReadOnlyStateError(Error):
    """Error raised when writing to attributes of read-only chain state."""


class LinAlgError(Error):
    """Error raised when a matrix operation raises a linear algebra error."""
