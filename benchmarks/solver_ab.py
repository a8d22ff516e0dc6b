"""Fixed-point-solver A/B on the headline config (ROADMAP #3).

The SoftAbs RMHMC implicit-leapfrog kernel (BASELINE config 3) spends
its per-leaf budget in the two fixed-point solves.  All solvers find the
same fixed points (to tolerance), so the stationary distribution and
per-iteration ESS are unchanged — a solver swap is a pure wall-time
trade between per-iteration cost (function evaluations, linear algebra)
and lockstep rounds saved.  This probe measures steady-state throughput
of the config-3 kernel under each shipped fixed-point solver
(mici_tpu/solvers.py: direct, Steffensen, Newton, Anderson) at the
headline batch size, plus convergence-failure rates so a "faster" solver
that silently trades failures for speed is visible.

The kernel construction and timing loop are the *shared* headline
harness (benchmarks/headline.py) — the probe measures exactly the kernel
``bench.py`` reports, with only the solver swapped.

Measured result (on-chip 2026-08-18, recorded in docs/BENCHMARKS.md):
the shipped direct solver wins — Steffensen within noise, Newton 8x and
Anderson 21x slower at identical acceptance and per-iteration ESS.

Usage: python -m benchmarks.solver_ab [--n-chain N] [--n-main N]
Prints one JSON row per solver; record results in docs/BENCHMARKS.md.
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from benchmarks.headline import run_headline_kernel
from mici_tpu import solvers

SOLVERS = {
    "direct": solvers.solve_fixed_point_direct,
    "steffensen": solvers.solve_fixed_point_steffensen,
    "newton": solvers.solve_fixed_point_newton,
    "anderson": solvers.solve_fixed_point_anderson,
}


def run_solver_variant(label, solver, n_chain=1024, n_main=192):
    metrics, _ = run_headline_kernel(
        n_chain=n_chain, n_main=n_main, fixed_point_solver=solver,
        extra_stats=("accept_stat", "convergence_error"),
    )
    stats = metrics["stats"]
    return {
        "solver": label,
        "n_chain": n_chain,
        "n_main": metrics["n_main"],
        "wall_s": round(metrics["elapsed"], 2),
        "chain_iters_per_sec": round(metrics["chain_iters_per_sec"], 1),
        "ess_per_sec": round(metrics["ess_per_sec"], 2),
        "ess_per_chain_iter": round(metrics["ess_per_chain_iter"], 5),
        "mean_accept": round(float(np.mean(stats["accept_stat"])), 4),
        "convergence_failure_rate": round(
            float(np.mean(stats["convergence_error"])), 5),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n-chain", type=int, default=1024)
    parser.add_argument("--n-main", type=int, default=192)
    parser.add_argument("--solvers", nargs="*", default=list(SOLVERS))
    args = parser.parse_args()

    rows = []
    for label in args.solvers:
        row = run_solver_variant(
            label, SOLVERS[label], n_chain=args.n_chain, n_main=args.n_main)
        rows.append(row)
        print(json.dumps(row), flush=True)

    best = max(rows, key=lambda r: r["ess_per_sec"])
    base = next((r for r in rows if r["solver"] == "direct"), rows[0])
    print(json.dumps({
        "summary": "best_vs_direct",
        "best": best["solver"],
        "speedup": round(
            best["ess_per_sec"] / base["ess_per_sec"], 3),
    }))


if __name__ == "__main__":
    main()
