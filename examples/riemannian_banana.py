"""SoftAbs Riemannian-metric HMC on a banana-shaped posterior.

The flagship Riemannian configuration (BASELINE config 3): dynamic
multinomial NUTS with the implicit generalized leapfrog integrator on the
SoftAbs (eigenvalue-regularized Hessian) metric.  The position-dependent
metric adapts step directions to the banana's curvature, letting a fixed
step size traverse both the flat bowl and the narrow curved valley.

Run: python examples/riemannian_banana.py
"""

import pathlib
import sys

# allow running from a source checkout without installing the package
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp
import numpy as np

from mici_tpu import integrators, samplers, systems
from mici_tpu.diagnostics import effective_sample_size, split_rhat


def neg_log_dens(q):
    """Banana: broad in q0, narrow curved ridge in q1 - q0^2 / 4."""
    return 0.5 * q[0] ** 2 / 8.0 + 0.5 * (q[1] - q[0] ** 2 / 4.0) ** 2


def main(n_chain=64, n_warm_up_iter=50, n_main_iter=600):
    system = systems.SoftAbsRiemannianMetricSystem(
        neg_log_dens, softabs_coeff=1.0,
    )
    integrator = integrators.ImplicitLeapfrogIntegrator(
        # reverse_check_tol must leave headroom over the fixed-point solve
        # tolerance: in float32 the default (2e-5, twice the solve tol)
        # flags ~25% of honest steps as non-reversible; 1e-3 (the BASELINE
        # benchmark setting) keeps the check meaningful without spurious
        # rejections
        system, step_size=0.2, reverse_check_tol=1e-3,
        fixed_point_solver_kwargs={"convergence_tol": 1e-4, "max_iters": 50},
    )
    sampler = samplers.DynamicMultinomialHMC(
        system, integrator, rng=20260816, max_tree_depth=5,
    )
    rng = np.random.default_rng(0)
    init_states = list(rng.standard_normal((n_chain, 2)) * 0.5)
    final_states, traces, stats = sampler.sample_chains(
        n_warm_up_iter, n_main_iter, init_states,
        adapters=None,  # fixed step size: the metric does the adaptation
        display_progress=False,
    )
    pos = np.asarray(traces["pos"])
    print(f"accept = {np.nanmean(stats['accept_stat']):.3f}, "
          f"mean tree depth = {np.mean(stats['tree_depth']):.2f}, "
          f"conv err = {np.mean(stats['convergence_error']):.3f}, "
          f"non-rev = {np.mean(stats['non_reversible_step']):.3f}")
    # Note: in float32 on TPU the implicit solves genuinely diverge in the
    # far tails where the SoftAbs metric is extreme (rejected safely, shown
    # in the error fractions above), which slows tail mixing — expect
    # mildly over-dispersed marginal estimates at these short run lengths.
    # The float64 statistical validation of this configuration against
    # quadrature oracles lives in tests/test_statistical.py.
    for d, name in enumerate(["q0", "q1"]):
        x = pos[:, :, d]
        print(f"{name}: mean={x.mean():+.3f} sd={x.std():.3f} "
              f"ESS={effective_sample_size(x):.0f} "
              f"R-hat={split_rhat(x):.3f}")
    return traces


if __name__ == "__main__":
    main()
