"""Smoke tests for the BASELINE benchmark configurations (tiny sizes)."""

import numpy as np
import pytest

from benchmarks import configs


@pytest.mark.parametrize("make,n_kwargs", [
    (configs.config_1_static_hmc, {"n_chain": 2, "dim": 10}),
    (configs.config_2_nuts_adaptive, {"n_chain": 2}),
    (configs.config_3_riemannian, {"n_chain": 2}),
    (configs.config_4_constrained_torus, {"n_chain": 2}),
    (configs.config_5_massively_parallel, {"n_chain": 8, "dim": 10}),
])
def test_config_runs(make, n_kwargs):
    sampler, init_states, kwargs = make(**n_kwargs)
    out = sampler.sample_chains(
        4, 6, init_states, display_progress=False, **kwargs,
    )
    traces = np.asarray(out.traces["pos"])
    assert traces.shape[:2] == (len(init_states), 6)
    assert np.all(np.isfinite(traces))


def test_torus_constraint_preserved():
    sampler, init_states, kwargs = configs.config_4_constrained_torus(
        n_chain=2)
    out = sampler.sample_chains(
        2, 8, init_states, display_progress=False, **kwargs,
    )
    pos = np.asarray(out.traces["pos"]).reshape(-1, 3)
    x, y, z = pos[:, 0], pos[:, 1], pos[:, 2]
    c = (np.sqrt(x**2 + y**2) - 1.0) ** 2 + z**2 - 0.25
    np.testing.assert_allclose(c, 0.0, atol=1e-5)


def test_headline_harness_smoke():
    """The shared config-3 headline harness (benchmarks/headline.py,
    consumed by bench.py and benchmarks/solver_ab.py) runs end-to-end
    and returns consistent metrics + traces."""
    from benchmarks.headline import run_headline_kernel

    metrics, traces = run_headline_kernel(
        n_chain=4, n_warm=2, n_main=4, chunk=2, max_tree_depth=2,
        extra_stats=("accept_stat", "convergence_error"),
    )
    assert traces.shape == (4, 4, 2)
    assert np.all(np.isfinite(traces))
    assert metrics["ess_total_mean_dim"] > 0
    assert metrics["stats"]["accept_stat"].shape == (4, 4)
    assert 0.0 <= float(np.mean(metrics["stats"]["accept_stat"])) <= 1.0


def test_softabs_row_subprocess_protocol(monkeypatch):
    """bench.run_softabs_row_isolated parses the two-line streaming
    protocol (SOFTABS_ROW then SOFTABS_AB) and keeps the gated auto row
    through arm timeouts / faults (round 5: a TPU worker fault in this
    row killed the whole artifact before isolation landed)."""
    import json
    import subprocess

    import bench

    row = {"config": "softabs_eigh_dim64", "chain_iters_per_sec": 10.0}
    ab = {"ab_n_warm": 2, "xla_wall_time_s": 1.0}

    class Proc:
        returncode = 0
        stderr = ""
        stdout = (
            "noise\n"
            f"SOFTABS_ROW {json.dumps(row)}\n"
            f"SOFTABS_AB {json.dumps(ab)}\n"
        )

    monkeypatch.setattr(bench.subprocess, "run", lambda *a, **k: Proc())
    merged = bench.run_softabs_row_isolated(None, None)
    assert merged["config"] == "softabs_eigh_dim64"
    assert merged["xla_wall_time_s"] == 1.0

    # Timeout mid-arms: partial stdout keeps the auto row, flags arms.
    def raise_timeout(*a, **k):
        raise subprocess.TimeoutExpired(
            cmd="x", timeout=1,
            output=f"SOFTABS_ROW {json.dumps(row)}\n".encode(),
        )

    monkeypatch.setattr(bench.subprocess, "run", raise_timeout)
    partial = bench.run_softabs_row_isolated(None, None, timeout=1)
    assert partial["chain_iters_per_sec"] == 10.0
    assert "ab_error" in partial

    # Timeout before any line: a single error row, never an exception.
    def raise_bare_timeout(*a, **k):
        raise subprocess.TimeoutExpired(cmd="x", timeout=1)

    monkeypatch.setattr(bench.subprocess, "run", raise_bare_timeout)
    dead = bench.run_softabs_row_isolated(None, None, timeout=1)
    assert "error" in dead and "TimeoutExpired" in dead["error"]

    # Crash with no protocol lines: error row with the stderr tail.
    class Crash:
        returncode = 137
        stdout = ""
        stderr = "boom\nworker crashed"

    monkeypatch.setattr(bench.subprocess, "run", lambda *a, **k: Crash())
    crashed = bench.run_softabs_row_isolated(None, None)
    assert "worker crashed" in crashed["error"]
