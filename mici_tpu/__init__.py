"""mici_tpu: a TPU-native manifold MCMC framework.

A ground-up JAX/XLA re-design with the capabilities of the reference
``mici`` library (https://github.com/matt-graham/mici): Hamiltonian systems
on Euclidean, Riemannian and implicitly-constrained manifolds, symplectic
(explicit, implicit and constrained) integrators, static and dynamic
(NUTS-style) HMC samplers, warm-up adaptation, and massively parallel chain
execution via ``vmap`` within a chip and chain-axis sharding across a TPU
mesh.
"""

__version__ = "0.1.0"

from mici_tpu import (  # noqa: F401
    adapters,
    autodiff,
    checkpoint,
    diagnostics,
    errors,
    integrators,
    interop,
    matrices,
    ops,
    parallel,
    precision,
    profiling,
    progressbars,
    samplers,
    solvers,
    stagers,
    states,
    systems,
    transitions,
    types,
    utils,
)
from mici_tpu.interface import (  # noqa: F401
    sample_constrained_hmc_chains,
    sample_hmc_chains,
)

__all__ = ["sample_constrained_hmc_chains", "sample_hmc_chains"]
