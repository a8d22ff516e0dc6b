"""Neal's-funnel benchmark: depth-tail re-batching vs static depth caps.

The one execution-model gap the vmapped lockstep NUTS had against the
reference's per-chain doubling loop (mici/transitions.py:708-770, which
pays only each chain's actual tree depth) was the *depth tail*: a small
subset of chains genuinely needing deep trees taxes the whole batch.  On
the BASELINE configs a measured static ``max_tree_depth`` cap is
ESS-neutral (docs/BENCHMARKS.md sweeps), but on funnel-like geometry a
static cap either truncates the deep-tree chains (losing per-iteration
ESS) or pays batch-max lockstep cost every iteration.

This benchmark runs 10-D Neal's funnel —

    v ~ N(0, 3^2),   x_i | v ~ N(0, e^v)  (i = 1..9)

— where the tree-depth *distribution* is heavy-tailed across chains
(position-dependent curvature: wide-mouth chains U-turn late, neck
chains early), and compares ESS/sec of

- plain vmapped NUTS at static caps (including the reference-default
  ``max_tree_depth=10``), and
- depth-tail re-batching (``rebatch_depth=d``, ``rebatch_slots=k``):
  bulk phase to depth ``d`` under full-batch vmap, then fixed-slot
  continuation rounds gathering only the unfinished chains to depth 10.

Re-batched runs make bit-identical per-chain decisions to the plain
depth-10 run (tests/test_nuts_equivalence.py), so their per-iteration
ESS is equal *by construction* and the comparison is pure wall time;
truncating static caps must additionally pay their measured per-iteration
ESS loss.

Usage: python -m benchmarks.funnel [--n-chain N] [--n-main N]
Prints one JSON row per variant; record results in docs/BENCHMARKS.md.
Note: each variant runs its full workload twice — once untimed to
compile the exact programs of the timed shape (the stage iteration
count is compiled-in), once timed — so total chip time is ~2x the sum
of the reported ``wall_s`` values.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from mici_tpu import integrators, samplers, systems
from mici_tpu.diagnostics import effective_sample_size

FUNNEL_DIM = 10
FUNNEL_SCALE = 3.0


def make_funnel_neg_log_dens(dim=FUNNEL_DIM):
    import jax.numpy as jnp

    def funnel_neg_log_dens(q):
        v, x = q[0], q[1:]
        return (
            0.5 * v**2 / FUNNEL_SCALE**2
            + 0.5 * jnp.sum(x**2) * jnp.exp(-v)
            + 0.5 * (dim - 1) * v
        )

    return funnel_neg_log_dens


funnel_neg_log_dens = make_funnel_neg_log_dens()


def funnel_exact_sample(n_chain, seed=1, dim=FUNNEL_DIM):
    """Exact draws (the funnel factorizes): stationary init on both ends
    of the depth spectrum, so ESS measures stationary mixing."""
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(n_chain) * FUNNEL_SCALE
    x = rng.standard_normal((n_chain, dim - 1)) * np.exp(
        v[:, None] / 2.0)
    return np.concatenate([v[:, None], x], axis=1)


def make_funnel_sampler(seed=0, step_size=0.2, max_tree_depth=10,
                        dim=FUNNEL_DIM, **transition_kwargs):
    system = systems.EuclideanMetricSystem(make_funnel_neg_log_dens(dim))
    integrator = integrators.LeapfrogIntegrator(system, step_size=step_size)
    return samplers.DynamicMultinomialHMC(
        system, integrator, seed, max_tree_depth=max_tree_depth,
        **transition_kwargs,
    )


def run_variant(label, n_chain, n_main, warm_compile=True, dim=FUNNEL_DIM,
                n_warm=0, adapters_factory=None, **kwargs):
    init = list(funnel_exact_sample(n_chain, dim=dim))
    run_kwargs = {"display_progress": False}
    if warm_compile:
        # The stage program's iteration count is a static (compiled-in)
        # parameter (sample_chains runs each stage as one chunk by
        # default), so the warm run must use the *same* (n_warm, n_main)
        # as the timed run — a shorter warm run would compile a
        # different program and leave the real compile inside the timed
        # region, biasing exactly the rebatch-vs-static comparison this
        # benchmark records (rebatch programs compile slower).
        # Same init as the timed run: for adaptive variants the warm
        # pass then tunes the *same* static parameters (deterministic),
        # so the timed pass hits the identical compiled programs.
        make_funnel_sampler(dim=dim, **kwargs).sample_chains(
            n_warm, n_main, init,
            adapters=(None if adapters_factory is None
                      else adapters_factory()),
            **run_kwargs,
        )
    sampler = make_funnel_sampler(dim=dim, **kwargs)
    t0 = time.perf_counter()
    out = sampler.sample_chains(
        n_warm, n_main, init,
        adapters=None if adapters_factory is None else adapters_factory(),
        **run_kwargs,
    )
    elapsed = time.perf_counter() - t0
    traces = np.stack([np.asarray(t) for t in out.traces["pos"]])
    ess = np.array([
        effective_sample_size(traces[:, :, d])
        for d in range(traces.shape[-1])
    ])
    n_step = np.asarray(out.statistics["n_step"])
    return {
        "variant": label,
        "n_chain": n_chain,
        "n_warm": n_warm,
        "n_main": n_main,
        "tuned_rebatch_depth": getattr(
            sampler.transitions["integration_transition"],
            "rebatch_depth", None),
        "wall_s": round(elapsed, 2),
        "chain_iters_per_sec": round(n_chain * n_main / elapsed, 1),
        "mean_ess": round(float(ess.mean()), 1),
        "ess_per_chain_iter": round(
            float(ess.mean()) / (n_chain * n_main), 5),
        "ess_per_sec": round(float(ess.mean()) / elapsed, 2),
        "mean_accept": round(
            float(np.asarray(out.statistics["accept_stat"]).mean()), 3),
        "mean_n_step": round(float(n_step.mean()), 1),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n-chain", type=int, default=256)
    parser.add_argument("--n-main", type=int, default=128)
    parser.add_argument("--dim", type=int, default=FUNNEL_DIM)
    parser.add_argument("--step-size", type=float, default=0.2)
    parser.add_argument("--static-caps", type=int, nargs="*",
                        default=[6, 8, 10])
    parser.add_argument("--rebatch-depths", type=int, nargs="*",
                        default=[5, 6])
    parser.add_argument("--rebatch-slots", type=int, default=32)
    parser.add_argument("--auto-warm", type=int, default=32,
                        help="warm-up iterations for the auto_rebatch "
                             "variant (0 disables it)")
    args = parser.parse_args()

    rows = []
    for cap in args.static_caps:
        rows.append(run_variant(
            f"static_cap_{cap}", args.n_chain, args.n_main,
            max_tree_depth=cap, dim=args.dim, step_size=args.step_size,
        ))
        print(json.dumps(rows[-1]), flush=True)
    for depth in args.rebatch_depths:
        rows.append(run_variant(
            f"rebatch_{depth}_slots{args.rebatch_slots}", args.n_chain,
            args.n_main, max_tree_depth=10, rebatch_depth=depth,
            rebatch_slots=args.rebatch_slots, dim=args.dim,
            step_size=args.step_size,
        ))
        print(json.dumps(rows[-1]), flush=True)
    n_fixed = len(args.static_caps) + len(args.rebatch_depths)
    if args.auto_warm:
        # Fully closed loop: TreeDepthCapAdapter(mode="rebatch") tunes
        # the re-batching boundary from the warm-up depth histogram —
        # exact traces, no hand-chosen depth anywhere.  Wall time
        # includes the warm-up (the price of the tuning).
        from mici_tpu.adapters import TreeDepthCapAdapter

        rows.append(run_variant(
            "auto_rebatch", args.n_chain, args.n_main,
            n_warm=args.auto_warm, max_tree_depth=10,
            rebatch_slots=args.rebatch_slots, dim=args.dim,
            step_size=args.step_size,
            adapters_factory=lambda: [TreeDepthCapAdapter(mode="rebatch")],
        ))
        print(json.dumps(rows[-1]), flush=True)

    static_rows = rows[:len(args.static_caps)]
    rebatch_rows = rows[len(args.static_caps):n_fixed]
    if static_rows and rebatch_rows:
        best_static = max(static_rows, key=lambda r: r["ess_per_sec"])
        best_rebatch = max(rebatch_rows, key=lambda r: r["ess_per_sec"])
        print(json.dumps({
            "summary": "rebatch_vs_best_static",
            "best_static": best_static["variant"],
            "best_static_ess_per_sec": best_static["ess_per_sec"],
            "best_rebatch": best_rebatch["variant"],
            "best_rebatch_ess_per_sec": best_rebatch["ess_per_sec"],
            "speedup": round(
                best_rebatch["ess_per_sec"] / best_static["ess_per_sec"],
                2),
        }))


if __name__ == "__main__":
    main()
