"""On-chip A/B: blocked block-Jacobi eigh vs XLA eigh (ROADMAP round-5 #2).

XLA's QDWH ``eigh`` parallelizes within one matrix; on big batches of
mid-sized symmetric matrices — the dense-SoftAbs metric regime
(reference kernel: mici/matrices.py:1631-1685) — it was measured at
469 ms for (B=256, N=256) in round 4, ~40x the blocked Cholesky on the
same shape.  :func:`mici_tpu.ops.blocked_eigh` replaces it with parallel
round-robin block Jacobi: 32x32 pivot subproblems on the lane-kernel
:func:`batched_eigh`, rotations applied as batched MXU matmuls.

This script times both paths (median of repeats, after warm-up) across a
(B, N) grid, checks the decomposition error on-chip, and prints one JSON
line per row.  It also verifies the lane-kernel eigh itself compiles on
the current toolchain (the arctan2 Mosaic-lowering fix).

Run: python -m benchmarks.eigh_ab [--quick]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from mici_tpu import precision
from mici_tpu.ops import batched_linalg as bl


def _median_time(fn, arg, repeats=5):
    out = fn(arg)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(arg)
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), out


def _recon_err(mats, w, v):
    rec = jnp.einsum("bij,bj,bkj->bik", v, w, v)
    scale = jnp.max(jnp.abs(w))
    return float(jnp.max(jnp.abs(rec - mats)) / scale)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    parser.add_argument("--repeats", type=int, default=5)
    args = parser.parse_args()

    grid = [(1024, 32), (256, 64), (256, 128), (256, 256), (64, 512)]
    if args.quick:
        grid = [(256, 128), (256, 256)]

    rng = np.random.default_rng(0)
    for b, n in grid:
        a = rng.standard_normal((b, n, n)).astype(np.float32)
        mats = jnp.asarray((a + a.transpose(0, 2, 1)) / 2)

        @jax.jit
        def run_xla(m):
            with precision.matmul_precision_scope():
                return jnp.linalg.eigh(m)

        if n <= 32:
            @jax.jit
            def run_new(m):
                with precision.matmul_precision_scope():
                    return bl.batched_eigh(m)
            label = "lane_kernel"
        else:
            @jax.jit
            def run_new(m):
                with precision.matmul_precision_scope():
                    return bl.blocked_eigh(m)
            label = "blocked"

        row = {"b": b, "n": n, "impl": label}
        try:
            t_new, (w, v) = _median_time(run_new, mats, args.repeats)
            row["new_s"] = round(t_new, 5)
            row["new_recon_err"] = _recon_err(mats, w, v)
        except Exception as exc:  # noqa: BLE001 - report and continue
            row["new_error"] = f"{type(exc).__name__}: {exc}"[:200]
        t_xla, (w_x, v_x) = _median_time(run_xla, mats, args.repeats)
        row["xla_s"] = round(t_xla, 5)
        row["xla_recon_err"] = _recon_err(mats, w_x, v_x)
        if "new_s" in row:
            row["speedup_vs_xla"] = round(row["xla_s"] / row["new_s"], 2)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
