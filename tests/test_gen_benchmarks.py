"""docs/BENCHMARKS.md generated tables must match BENCH_FULL.json.

VERDICT round-4 weak #6: the doc's results table and the shipping
artifact were separately hand-maintained and disagreed 1.5-2x per row.
The generated region (docs/gen_benchmarks.py) removes that divergence
class; this test makes drift a CI failure and pins the renderer's
behavior on a synthetic artifact.
"""

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "docs"))

import gen_benchmarks  # noqa: E402


def test_doc_tables_match_artifact():
    artifact = json.loads(gen_benchmarks.ARTIFACT.read_text())
    doc_text = gen_benchmarks.DOC.read_text()
    assert gen_benchmarks.BEGIN in doc_text, "generated region missing"
    assert gen_benchmarks.apply(
        doc_text, gen_benchmarks.render(artifact),
    ) == doc_text, (
        "docs/BENCHMARKS.md is stale — run python docs/gen_benchmarks.py"
    )


def test_render_synthetic_artifact():
    artifact = {
        "metric": "m", "value": 12.3, "vs_baseline": 45.6,
        "ref_ess_method": "direct",
        "chip_probe_steps_per_sec": {
            "start": 100.0, "end": 90.0, "precision": "engine",
        },
        "configs": [
            {"config": 1, "n_chain": 8, "chain_iters_per_sec": 1000.0,
             "summary_only_chain_iters_per_sec": 2000.0,
             "ess_per_sec": 10.0, "ref_ess_per_sec": 1.0,
             "vs_reference_ess": 10.0, "regime": "latency_bound"},
            {"config": 2, "error": "Boom"},
        ],
        "roofline": [
            {"dim": 256, "n_chain": 64, "chain_iters_per_sec": 5.0,
             "achieved_tflops": 0.5, "probe_peak_tflops": 1.0,
             "frac_of_probe_peak": 0.5},
        ],
        "softabs_eigh_row": {
            "dim": 64, "n_chain": 64, "eigh_auto_path": "parallel",
            "chain_iters_per_sec": 7.0, "mean_accept": 0.9,
            "ess_per_sec": 3.0, "wall_time_s": 2.0,
            "xla_wall_time_s": 4.0, "auto_over_xla_speedup": 2.0,
            "blocked_error": "Timeout",
            "moment_gate": {"ok": True},
        },
        "moment_validation": {"g1": {"ok": True}, "g2": {"ok": False}},
        "compile_telemetry": {
            "n_compiles": 3, "compile_seconds_total": 9.0,
            "compile_seconds_max": 5.0, "n_traces": 7,
            "top_programs_by_compile_seconds": [
                {"fun_name": "jit(step)", "n_compiles": 1, "seconds": 5.0},
            ],
        },
        "persistent_compilation_cache": {
            "dir": "/tmp/c",
            "cold_warm_demo": {
                "cold": {"compile_seconds_total": 10.0},
                "warm": {"compile_seconds_total": 1.0},
                "cold_over_warm_compile_seconds": 10.0,
            },
        },
    }
    region = gen_benchmarks.render(artifact)
    assert region.startswith(gen_benchmarks.BEGIN)
    assert region.endswith(gen_benchmarks.END)
    assert "**10.0×**" in region        # config ratio
    assert "2,000" in region            # summary-only rate
    assert "error: Boom" in region      # error row survives
    assert "0.500" in region            # roofline fraction
    assert "`parallel`" in region       # softabs eigh auto path
    assert "2.00×" in region            # A/B speedup rendered
    assert "Forced-`blocked` arm errored" in region
    assert "❌ FAIL" in region          # failing gate visible
    assert "jit(step)" in region        # compile attribution
    assert "10.0× cut" in region.replace("\n", " ")  # cache demo

    # apply() is idempotent: render -> apply -> apply is a fixed point.
    doc = "# Title\n\nbody\n"
    once = gen_benchmarks.apply(doc, region)
    assert gen_benchmarks.apply(once, region) == once
