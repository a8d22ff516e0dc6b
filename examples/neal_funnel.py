"""NUTS on Neal's funnel with exact online depth-tail tuning.

Neal's funnel — ``v ~ N(0, 3^2)``, ``x_i | v ~ N(0, e^v)`` — has
position-dependent curvature: chains in the wide mouth U-turn late
(deep NUTS trees), chains in the narrow neck U-turn early.  Under
vmapped lockstep execution every iteration pays the batch-max tree
depth, so the deep-tree tail taxes the whole batch; truncating
``max_tree_depth`` recovers the wall time but costs orders of magnitude
of per-iteration ESS exactly here (measured study: docs/BENCHMARKS.md
round-3).

This example shows the framework's exact answer: depth-tail
*re-batching*.  ``TreeDepthCapAdapter(mode="rebatch")`` estimates the
natural U-turn depth from the warm-up depth histogram and sets the
transition's ``rebatch_depth`` boundary — the bulk of chains run
full-width to that depth, only the deep tail continues in narrow
fixed-slot rounds, and every per-chain decision is bit-identical to
plain (untuned) execution.  No hand-chosen depth anywhere, no
statistical cost anywhere.

(The funnel's ``v`` coordinate mixes slowly under *any*
Euclidean-metric HMC — the split-Rhat printed below is honest about
that; position-dependent metrics are the statistical remedy, and this
framework ships those too (``examples/riemannian_banana.py``).  This
example is about the execution model: deep trees no longer tax the
batch, and nothing is truncated.)

Run: python examples/neal_funnel.py
"""

import pathlib
import sys

# allow running from a source checkout without installing the package
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp
import numpy as np

from mici_tpu import adapters, integrators, samplers, systems
from mici_tpu.diagnostics import effective_sample_size, split_rhat

DIM = 10
SCALE = 3.0


def neg_log_dens(q):
    """10-D Neal's funnel (v = q[0] is the log-scale of the others)."""
    v, x = q[0], q[1:]
    return (0.5 * v**2 / SCALE**2
            + 0.5 * jnp.sum(x**2) * jnp.exp(-v)
            + 0.5 * (DIM - 1) * v)


def exact_sample(n_chain, seed=1):
    """The funnel factorizes, so exact draws are available — handy both
    as a stationary init and as an oracle for the moments below."""
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(n_chain) * SCALE
    x = rng.standard_normal((n_chain, DIM - 1)) * np.exp(v[:, None] / 2.0)
    return np.concatenate([v[:, None], x], axis=1)


def main(n_chain=256, n_warm_up_iter=64, n_main_iter=1024):
    system = systems.EuclideanMetricSystem(neg_log_dens)
    integrator = integrators.LeapfrogIntegrator(system, step_size=0.2)
    sampler = samplers.DynamicMultinomialHMC(
        system, integrator, 1234,
        max_tree_depth=10,  # the reference default — never truncated
    )

    out = sampler.sample_chains(
        n_warm_up_iter, n_main_iter,
        list(exact_sample(n_chain)),
        adapters=[adapters.TreeDepthCapAdapter(mode="rebatch")],
        display_progress=False,
    )

    transition = sampler.transitions["integration_transition"]
    traces = np.stack([np.asarray(t) for t in out.traces["pos"]])
    v = traces[:, :, 0]
    ess = effective_sample_size(v)
    print(f"chains: {n_chain}, main iterations: {n_main_iter}")
    print(f"tuned re-batching boundary: depth "
          f"{transition.rebatch_depth} (max_tree_depth stays "
          f"{transition.max_tree_depth})")
    print(f"v = q[0]: mean {v.mean():+.3f} (exact 0), "
          f"std {v.std():.3f} (exact {SCALE}), "
          f"ESS {ess:.0f}, split-Rhat {split_rhat(v):.4f}")
    mean_depth = float(np.asarray(out.statistics["tree_depth"]).mean())
    print(f"mean realized tree depth {mean_depth:.2f}, accept "
          f"{float(np.nanmean(np.asarray(out.statistics['accept_stat']))):.3f}")


if __name__ == "__main__":
    main()
