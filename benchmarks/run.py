"""Run BASELINE.json benchmark configurations and report throughput/ESS.

Usage: python -m benchmarks.run [config_number ...] [--n-warm N] [--n-main N]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from benchmarks import configs
from mici_tpu.diagnostics import effective_sample_size_per_dim


CONFIGS = {
    1: ("static_hmc_100d_gaussian", configs.config_1_static_hmc),
    2: ("nuts_adaptive_hierarchical_logistic",
        configs.config_2_nuts_adaptive),
    3: ("softabs_rmhmc_banana", configs.config_3_riemannian),
    4: ("constrained_torus", configs.config_4_constrained_torus),
    5: ("massively_parallel_4096_nuts",
        configs.config_5_massively_parallel),
}


def run_config(number, n_warm=50, n_main=100):
    name, make = CONFIGS[number]
    sampler, init_states, kwargs = make()
    t0 = time.perf_counter()
    out = sampler.sample_chains(
        n_warm, n_main, init_states, display_progress=False, **kwargs,
    )
    elapsed = time.perf_counter() - t0
    traces = np.asarray(out.traces["pos"])
    ess = effective_sample_size_per_dim(traces)
    n_chain = traces.shape[0]
    result = {
        "config": number,
        "name": name,
        "n_chain": n_chain,
        "n_main": n_main,
        "wall_time_s": round(elapsed, 3),
        "chain_iters_per_sec": round(n_chain * n_main / elapsed, 1),
        "mean_ess": round(float(ess.mean()), 1),
        "ess_per_sec": round(float(ess.mean()) / elapsed, 2),
        "mean_accept": round(
            float(np.nanmean(out.statistics["accept_stat"])), 3),
    }
    if "n_step" in out.statistics:
        result["leapfrog_steps_per_sec"] = round(
            float(np.sum(out.statistics["n_step"], where=np.asarray(
                out.statistics["n_step"]) > 0)) / elapsed, 1)
    return result


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("configs", nargs="*", type=int,
                        default=[1, 2, 3, 4, 5])
    parser.add_argument("--n-warm", type=int, default=50)
    parser.add_argument("--n-main", type=int, default=100)
    args = parser.parse_args()
    for number in args.configs or [1, 2, 3, 4, 5]:
        result = run_config(number, args.n_warm, args.n_main)
        print(json.dumps(result))


if __name__ == "__main__":
    main()
