"""Benchmark: 1024-chain SoftAbs Riemannian-metric HMC ESS/sec on TPU.

BASELINE.json north star: >=100x single-core reference-Mici ESS/sec on a
1024-chain Riemannian HMC benchmark (SoftAbs metric, banana-shaped
posterior, implicit generalized leapfrog — config 3).  The reference
publishes no numbers (BASELINE.md), so every denominator is *measured*
here: reference Mici (NumPy backend, analytic derivative functions,
single core, CPU) runs the identical configuration and its ESS/sec is
computed **directly from its own traces** (benchmarks/reference.py:
measure_reference_ess — no derived/modeled quantities).

Beyond the headline, the artifact is self-contained (VERDICT round-2
item 2): the JSON line carries

- ``configs``: all five BASELINE configs through the generic
  ``sample_chains`` driver, each with TPU ESS/sec (median-of-N walls
  with a chip-probe reading per row), directly measured reference
  ESS/sec, and the ratio — all under default settings.
- ``moment_validation``: on-chip f32 statistical validation on the same
  runs the perf numbers come from, for *every* config — exact Gaussian
  moments (1/5), reference-trace z-scores (2), dense quadrature (3/4)
  (benchmarks/oracles.py).
- ``roofline``: a compute-bound dense-Riemannian row with achieved
  FLOP/s and fraction of the chip-probe matmul peak
  (benchmarks/roofline.py).
- ``compile_telemetry``: XLA compile counts/seconds over the whole run
  (mici_tpu.profiling.compile_telemetry), so retrace regressions are
  visible in the artifact diff.

Prints exactly one compact JSON summary as the FINAL stdout line (always
within the driver's bounded capture) and writes the full detail to
``BENCH_FULL.json`` next to this file.
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

# Headline constants + kernel harness live in benchmarks/headline.py (one
# construction site shared with benchmarks/solver_ab.py so the A/B probe
# measures exactly the kernel reported here).
from benchmarks.headline import (  # noqa: F401  (re-exported constants)
    CHUNK,
    FP_MAX_ITERS,
    FP_TOL,
    MAX_TREE_DEPTH,
    N_CHAIN,
    N_MAIN,
    N_WARM,
    REV_TOL,
    SOFTABS_COEFF,
    STEP_SIZE,
    run_headline_kernel,
)

# Fallback single-core reference throughput (NUTS iterations/sec) in case
# the subprocess measurement fails; measured 2026-08-16 on this host.
FALLBACK_REF_ITER_PER_SEC = 25.0

_MICI_BASELINE_SCRIPT = r"""
import sys, time
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/reference/src")
import mici

def np_nld(q):
    return 0.5 * q[0] ** 2 / 8.0 + 0.5 * (q[1] - q[0] ** 2 / 4.0) ** 2

def np_grad(q):
    r = q[1] - q[0] ** 2 / 4.0
    return np.array([q[0] / 8.0 - r * q[0] / 2.0, r])

def np_hess(q):
    h00 = 1.0 / 8.0 + 3.0 * q[0] ** 2 / 8.0 - q[1] / 2.0
    h01 = -q[0] / 2.0
    return np.array([[h00, h01], [h01, 1.0]])

def np_mtp(q):
    def mtp(m):
        m = np.asarray(m)
        return np.array([
            m[0, 0] * 3.0 * q[0] / 4.0 - (m[0, 1] + m[1, 0]) / 2.0,
            -m[0, 0] / 2.0,
        ])
    return mtp

system = mici.systems.SoftAbsRiemannianMetricSystem(
    np_nld, grad_neg_log_dens=np_grad, hess_neg_log_dens=np_hess,
    mtp_neg_log_dens=np_mtp, softabs_coeff=%(softabs)r)
integrator = mici.integrators.ImplicitLeapfrogIntegrator(
    system, step_size=%(step)r,
    fixed_point_solver_kwargs={"max_iters": %(fp_iters)d})
sampler = mici.samplers.DynamicMultinomialHMC(
    system, integrator, np.random.default_rng(1234),
    max_tree_depth=%(depth)d)
rng = np.random.default_rng(0)
init = [rng.standard_normal(2) * 0.5]
# short warm-less run with fixed step size, single chain, single core
n_iter = %(n_iter)d
t0 = time.perf_counter()
out = sampler.sample_chains(
    0, n_iter, init, adapters=None, display_progress=False)
dt = time.perf_counter() - t0
print("ITER_PER_SEC", n_iter / dt)
"""


def _measure_reference_once(n_iter, timeout):
    script = _MICI_BASELINE_SCRIPT % {
        "softabs": SOFTABS_COEFF, "step": STEP_SIZE,
        "fp_iters": FP_MAX_ITERS, "depth": MAX_TREE_DEPTH,
        "n_iter": n_iter,
    }
    env = dict(os.environ)
    try:
        result = subprocess.run(
            [sys.executable, "-c", script], capture_output=True,
            text=True, timeout=timeout, env=env,
        )
        for line in result.stdout.splitlines():
            if line.startswith("ITER_PER_SEC"):
                return float(line.split()[1])
    except (subprocess.TimeoutExpired, OSError):
        pass
    return None


def measure_reference_baseline(n_iter=150, timeout=240, n_repeat=3):
    """Measure reference Mici single-core NUTS iterations/sec.

    Takes the median over ``n_repeat`` subprocess runs: single-core CPU
    throughput on this host varies ~30% run to run, and the baseline is
    the denominator of the headline ratio.
    """
    rates = []
    for _ in range(n_repeat):
        rate = _measure_reference_once(n_iter, timeout)
        if rate is not None:
            rates.append(rate)
    if rates:
        return float(np.median(rates)), True
    return FALLBACK_REF_ITER_PER_SEC, False


def run_tpu_benchmark():
    """Headline measurement: the shared config-3 kernel harness at the
    headline constants (benchmarks/headline.py)."""
    metrics, pos_trace = run_headline_kernel()
    metrics.pop("stats", None)
    return metrics, pos_trace


def _log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def measure_chip_probe(n_iter=400, size=256, batch=1024,
                       precision="engine"):
    """Fixed-kernel chip-state probe (ROADMAP round-4 #3).

    The shared dev chip's effective throughput swings 2-3x across
    windows (identical compiled programs measured 3.0 s vs 10.5 s an
    hour apart), so the artifact records a standard kernel's rate at
    the start and end of the run: a scan of ``n_iter`` batched
    (batch x size) @ (size x size) matmul+tanh steps.  Ratios can then
    be read against the window the measurement landed in.

    ``precision="engine"`` (default) traces the probe matmul under the
    engine's matmul-precision policy (mici_tpu.precision — "highest",
    i.e. full-f32 accumulation), the same precision every engine
    program runs at, so roofline fractions compare like with like
    (VERDICT round-4 weak #5: the old default-precision probe ran the
    MXU in bf16 passes the engine never uses).  ``precision="default"``
    keeps JAX's hardware default for cross-round continuity readings.
    """
    import jax
    import jax.numpy as jnp

    from mici_tpu.precision import matmul_precision_scope

    w = jax.random.normal(jax.random.PRNGKey(0), (size, size),
                          jnp.float32) / np.sqrt(size)
    # The probe body runs at a *fixed* precision per reading; a distinct
    # closure constant per mode keeps the two modes' jit caches apart.
    engine = precision == "engine"

    @jax.jit
    def probe(x):
        def body(c, _):
            return jnp.tanh(c @ w), None

        if engine:
            with matmul_precision_scope():
                return jax.lax.scan(body, x, None, length=n_iter)[0]
        return jax.lax.scan(body, x, None, length=n_iter)[0]

    x = jnp.ones((batch, size), jnp.float32)
    np.asarray(probe(x)[:1, :1])  # compile + execute once
    t0 = time.perf_counter()
    np.asarray(probe(x)[:1, :1])
    dt = time.perf_counter() - t0
    return round(n_iter / dt, 1)


def run_config_rows(traces_out, ref_traces_out):
    """All five BASELINE configs through the generic driver + measured
    reference denominators (VERDICT round-2 item 2).

    Each row: TPU ESS/sec under default settings (median-of-N walls with
    a chip-probe reading attached), single-core reference ESS/sec
    computed directly from reference traces, and the ratio.  A failing
    config yields an ``error`` row rather than killing the artifact.
    Every config's TPU traces land in ``traces_out[number]`` (and the
    reference's own traces in ``ref_traces_out``) for the per-config
    moment validation.
    """
    from benchmarks.run import BENCH_ROW_SETTINGS, compare_config

    rows = []
    for number in (1, 2, 3, 4, 5):
        t0 = time.perf_counter()
        probe = measure_chip_probe()
        try:
            row, traces, ref_traces = compare_config(
                number, return_traces=True, return_ref_traces=True,
                **BENCH_ROW_SETTINGS[number],
            )
            traces_out[number] = traces
            if ref_traces is not None:
                ref_traces_out[number] = ref_traces
        except Exception as exc:  # pragma: no cover - robustness guard
            row = {"config": number, "error": f"{type(exc).__name__}: {exc}"}
        # All five BASELINE configs are dim <= 100: per-iteration math is
        # far below the chip's matmul roofline, so these rows measure
        # driver + kernel latency, not peak compute (the compute-bound
        # regime is the separate `roofline` row).
        row["regime"] = "latency_bound"
        row["chip_probe_steps_per_sec"] = probe
        row["bench_wall_s"] = round(time.perf_counter() - t0, 1)
        _log(f"config {number}: {json.dumps(row)}")
        rows.append(row)
    return rows


_CACHE_DEMO_SCRIPT = r"""
import json, sys
from mici_tpu import profiling
profiling.enable_persistent_compilation_cache(
    sys.argv[1], min_compile_time_secs=0.0)
with profiling.compile_telemetry() as t:
    from benchmarks.configs import config_1_static_hmc
    sampler, init, kwargs = config_1_static_hmc(n_chain=32)
    kwargs = {**kwargs, "adapters": None,
              "trace_funcs": [lambda s: {"pos": s.pos[:4]}]}
    sampler.sample_chains(2, 2, init, display_progress=False, **kwargs)
summary = t.summary()
summary.pop("top_programs_by_compile_seconds", None)
print("CACHE_DEMO " + json.dumps(summary))
"""


def measure_persistent_cache_effect(timeout=420):
    """Cold-vs-warm XLA persistent-cache measurement (VERDICT r4 #3).

    Runs the same small sampling program in two fresh subprocesses
    sharing one *fresh* compilation-cache directory: the first pays the
    real backend compiles and populates the disk cache, the second hits
    it.  Records both compile telemetries so the artifact carries a
    direct measurement of what enabling the cache saves (round 4 paid
    ~504 s of compiles from scratch every run with no cache configured).
    """
    import tempfile

    results = {}
    with tempfile.TemporaryDirectory(prefix="xla_cache_demo_") as cache_dir:
        for label in ("cold", "warm"):
            try:
                proc = subprocess.run(
                    [sys.executable, "-c", _CACHE_DEMO_SCRIPT, cache_dir],
                    capture_output=True, text=True, timeout=timeout,
                )
                for line in proc.stdout.splitlines():
                    if line.startswith("CACHE_DEMO "):
                        results[label] = json.loads(line[len("CACHE_DEMO "):])
            except (subprocess.TimeoutExpired, OSError) as exc:
                results[label] = {"error": f"{type(exc).__name__}"}
    cold = results.get("cold", {}).get("compile_seconds_total")
    warm = results.get("warm", {}).get("compile_seconds_total")
    if cold and warm:
        results["cold_over_warm_compile_seconds"] = round(cold / warm, 1)
    return results


_HEALTH_SCRIPT = (
    "import jax, jax.numpy as jnp\n"
    "x = jnp.ones((256, 256))\n"
    "print('HEALTHY', float((x @ x).sum()))\n"
)


def wait_for_chip(max_wait=1800, probe_timeout=180):
    """Block until the TPU answers a trivial matmul, probing from
    killable subprocesses.

    Round 5: when the shared TPU worker restarts, in-flight *and new*
    device ops from already-connected processes can HANG indefinitely
    rather than error — a bench that starts in that window burns its
    whole budget stuck on the first chip probe.  Subprocess probes are
    killable, so this converts the hang into a bounded wait, and a
    never-recovering chip into a recorded error artifact instead of a
    silent stall.  Returns a JSON-ready health record either way.
    """
    t0 = time.time()
    attempt = 0
    while True:
        attempt += 1
        try:
            proc = subprocess.run(
                [sys.executable, "-c", _HEALTH_SCRIPT],
                capture_output=True, text=True, timeout=probe_timeout,
            )
            if "HEALTHY" in (proc.stdout or ""):
                return {"ok": True, "attempts": attempt,
                        "waited_s": round(time.time() - t0, 1)}
        except (subprocess.TimeoutExpired, OSError):
            pass
        if time.time() - t0 >= max_wait:
            return {"ok": False, "attempts": attempt,
                    "waited_s": round(time.time() - t0, 1)}
        _log(f"chip not answering (attempt {attempt}); retrying...")
        time.sleep(20)


def run_softabs_row_isolated(probe_rate, cache_dir, timeout=2400):
    """Run the SoftAbs dispatched-eigh row in an isolated subprocess.

    Round 5 observed this row faulting the shared TPU worker ("TPU
    worker process crashed or restarted" — long device executions trip
    the worker's execution deadline), which poisons every later JAX
    call in the launching process — in the first round-5 bench run
    that turned one bad row into a dead artifact.  Isolation bounds the
    blast radius: a fault or hang costs exactly one ``error`` row, and
    this row runs *last* so a dead worker cannot take other sections
    with it.  The subprocess re-uses the persistent XLA cache via
    ``MICI_TPU_XLA_CACHE`` and streams two result lines — the gated
    auto row first, then the (slower) forced-mode A/B arms — so even a
    timeout keeps the production row (partial stdout is parsed).
    """
    env = dict(os.environ)
    if cache_dir:
        env["MICI_TPU_XLA_CACHE"] = str(cache_dir)
    cmd = [sys.executable, "-m", "benchmarks.softabs_row", "--subprocess"]
    if probe_rate:
        cmd += ["--probe-rate", str(probe_rate)]
    timed_out = False
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout, env=env,
            cwd=str(Path(__file__).parent),
        )
        stdout, stderr, rc = proc.stdout, proc.stderr, proc.returncode
    except subprocess.TimeoutExpired as exc:
        timed_out = True
        stdout = (exc.stdout or b"")
        stderr = (exc.stderr or b"")
        if isinstance(stdout, bytes):
            stdout = stdout.decode(errors="replace")
        if isinstance(stderr, bytes):
            stderr = stderr.decode(errors="replace")
        rc = None
    except OSError as exc:  # pragma: no cover - robustness
        return {"config": "softabs_eigh_row",
                "error": f"{type(exc).__name__}: {exc}"}
    row = None
    for line in (stdout or "").splitlines():
        if line.startswith("SOFTABS_ROW "):
            row = json.loads(line[len("SOFTABS_ROW "):])
        elif line.startswith("SOFTABS_AB ") and row is not None:
            row.update(json.loads(line[len("SOFTABS_AB "):]))
    if row is not None:
        if timed_out and "ab_n_warm" not in row:
            row["ab_error"] = f"TimeoutExpired: arms cut at {timeout}s"
        return row
    if timed_out:
        return {"config": "softabs_eigh_row",
                "error": f"TimeoutExpired: >{timeout}s in subprocess"}
    tail = (stderr or stdout or "").strip().splitlines()
    return {"config": "softabs_eigh_row",
            "error": f"subprocess rc={rc}: " + " | ".join(tail[-3:])}


def run_moment_validation(banana_traces, config_traces, ref_traces):
    """On-chip f32 posterior-moment checks on the same runs the perf
    numbers come from (VERDICT round-2 item 4; extended to every config
    per round-3 item 1).

    Oracles per config: 1/5 exact Gaussian moments (the target covariance
    is known in closed form); 2 the reference implementation's own
    long-run traces (ESS-aware z-score comparison); 3 banana dense
    quadrature; 4 torus angle quadrature.  Quadrature tolerances are ~4
    Monte-Carlo standard errors at the realized ESS of the headline runs,
    so a genuine f32 bias beyond sampling noise fails the check (the
    round-3 bf16 episode is exactly what this gate exists to catch).
    """
    from benchmarks.oracles import (
        banana_moments,
        check_moments,
        check_moments_vs_reference,
        gaussian_moments,
        torus_moments,
    )

    validation = {}
    b_mean, b_var = banana_moments()
    validation["banana_config3"] = check_moments(
        banana_traces, b_mean, b_var, mean_atol=0.2, var_rtol=0.15,
    )
    g_mean, g_var = gaussian_moments()
    for number, label in ((1, "gaussian_config1"), (5, "gaussian_config5")):
        if number in config_traces:
            # Exact oracle; tolerances at ~4-5 MC standard errors for the
            # row's realized total ESS (>=20k per dim at 4096 chains).
            validation[label] = check_moments(
                config_traces[number], g_mean, g_var,
                mean_atol=0.1, var_rtol=0.1,
            )
    if 2 in config_traces and 2 in ref_traces:
        validation["logistic_config2"] = check_moments_vs_reference(
            config_traces[2], ref_traces[2],
        )
    if 4 in config_traces:
        t_mean, t_var = torus_moments()
        validation["torus_config4"] = check_moments(
            config_traces[4], t_mean, t_var, mean_atol=0.08, var_rtol=0.2,
        )
    return validation


def main():
    from mici_tpu.profiling import (
        compile_telemetry,
        enable_persistent_compilation_cache,
    )

    # Persistent XLA compilation cache (VERDICT r4 #3): repo-local so
    # repeated bench/CI runs on this checkout re-use executables instead
    # of re-paying every backend compile (round 4: 504 s per run).
    cache_dir = enable_persistent_compilation_cache(
        str(Path(__file__).parent / ".xla_cache"),
    )
    cache_entries_before = len(os.listdir(cache_dir))
    _log(f"persistent compilation cache: {cache_dir} "
         f"({cache_entries_before} entries)")

    chip_health = wait_for_chip()
    if not chip_health["ok"]:
        # Emit a parseable artifact rather than hanging on a dead chip.
        _log(f"chip never recovered: {json.dumps(chip_health)}")
        print(json.dumps({
            "metric": "softabs_rmhmc_banana_ess_per_sec_1024_chains",
            "value": None,
            "unit": "ESS/s (mean over dims, 1024 chains, TPU chip)",
            "vs_baseline": None,
            "error": "TPU chip unavailable for the whole health-wait "
                     "window",
            "chip_health": chip_health,
        }))
        return
    _log(f"chip health: {json.dumps(chip_health)}")

    headline_only = os.environ.get("BENCH_HEADLINE_ONLY") == "1"
    with compile_telemetry() as telemetry:
        probe_start = measure_chip_probe()
        probe_start_default_precision = measure_chip_probe(
            precision="default",
        )
        _log(f"chip probe (start): {probe_start} matmul-steps/s engine "
             f"precision; {probe_start_default_precision} default "
             f"precision")
        tpu, banana_traces = run_tpu_benchmark()
        _log(
            f"tpu headline: {tpu['chain_iters_per_sec']:.0f} chain-iters/s, "
            f"{tpu['leapfrog_steps_per_sec']:.0f} leapfrog-steps/s, "
            f"ESS/s {tpu['ess_per_sec']:.1f}"
        )

        configs_rows = []
        config_traces, ref_traces = {}, {}
        if not headline_only:
            configs_rows = run_config_rows(config_traces, ref_traces)

        # Headline denominator: reference ESS/sec measured directly from
        # reference traces on the identical config-3 setup.  Reuse the
        # config-3 row's measurement when available; otherwise measure
        # here, falling back to derived iterations/sec only if the direct
        # subprocess measurement fails entirely.
        ref_ess_per_sec = None
        method = "direct"
        row3 = next((r for r in configs_rows if r.get("config") == 3), {})
        if row3.get("ref_ess_method") == "direct":
            ref_ess_per_sec = row3["ref_ess_per_sec"]
        else:
            from benchmarks.reference import measure_reference_ess
            from benchmarks.run import REF_ESS_SETTINGS

            _, ref_ess_per_sec, measured = measure_reference_ess(
                3, **REF_ESS_SETTINGS[3],
            )
            if not measured:
                ref_iter_per_sec, _ = measure_reference_baseline()
                ref_ess_per_sec = (
                    ref_iter_per_sec * tpu["ess_per_chain_iter"]
                )
                method = "derived"
        vs_baseline = tpu["ess_per_sec"] / ref_ess_per_sec
        _log(
            f"reference config-3 ESS/s {ref_ess_per_sec:.3f} ({method}); "
            f"headline ratio {vs_baseline:.0f}x"
        )

        moment_validation = run_moment_validation(
            banana_traces, config_traces, ref_traces,
        )
        roofline_rows = []
        softabs_row = {}
        if not headline_only:
            # Same-precision roofline sweep (VERDICT r4 #4): each row's
            # utilization denominator is an engine-precision probe taken
            # next to that row's measurement.  n_chain per dim is
            # HBM-bounded inside run_roofline_row (the O(n_chain*dim^2)
            # metric/factor/AD buffers: 256 chains at dim 512 crashed
            # the worker in round 4), recorded in the row itself.
            from benchmarks.roofline import run_roofline_row

            for dim in (256, 512, 1024):
                try:
                    row_probe = measure_chip_probe()
                    row = run_roofline_row(row_probe, dim=dim)
                    row["probe_precision"] = "engine"
                except Exception as exc:  # pragma: no cover - robustness
                    row = {"config": "roofline_dense_riemannian",
                           "dim": dim,
                           "error": f"{type(exc).__name__}: {exc}"}
                _log(f"roofline dim {dim}: {json.dumps(row)}")
                roofline_rows.append(row)
        # End probe BEFORE the softabs row: the row runs in an isolated
        # subprocess *last* because a TPU worker fault inside it (seen
        # round 5) poisons every later JAX call in this process.
        try:
            probe_end = measure_chip_probe()
        except Exception as exc:  # pragma: no cover - robustness
            probe_end = None
            _log(f"chip probe (end) failed: {type(exc).__name__}: {exc}")
        _log(f"chip probe (end): {probe_end} matmul-steps/s")

    cache_effect = {}
    if not headline_only:
        cache_effect = measure_persistent_cache_effect()
        _log(f"persistent-cache cold/warm: {json.dumps(cache_effect)}")
        # Dispatched-eigh end-to-end row (VERDICT r4 #2): SoftAbs RMHMC
        # at dim 64 through the generic driver, auto-dispatched to the
        # parallel-Jacobi eigh, exact-moment gated, with same-shape A/B
        # arms vs forced XLA / blocked modes.  Runs in a subprocess as
        # the final TPU-touching section (see run_softabs_row_isolated).
        softabs_row = run_softabs_row_isolated(probe_end, cache_dir)
        _log(f"softabs eigh row: {json.dumps(softabs_row)}")
        if softabs_row.get("moment_gate") is not None:
            moment_validation[softabs_row.get(
                "config", "softabs_eigh_row")] = softabs_row["moment_gate"]

    # Full machine-readable detail to a file; the final stdout line is a
    # compact summary the driver's bounded capture can always parse
    # (VERDICT round-3 weak #1: the r03 artifact's tail truncation).
    full = {
        "metric": "softabs_rmhmc_banana_ess_per_sec_1024_chains",
        "value": round(tpu["ess_per_sec"], 2),
        "unit": "ESS/s (mean over dims, 1024 chains, TPU chip)",
        "vs_baseline": round(vs_baseline, 1),
        "ref_ess_method": method,
        "chip_health_wait": chip_health,
        "chip_probe_steps_per_sec": {
            "start": probe_start, "end": probe_end,
            "start_default_precision": probe_start_default_precision,
            "precision": "engine (matmul_precision_scope) unless noted",
        },
        "configs": configs_rows,
        "roofline": roofline_rows,
        "softabs_eigh_row": softabs_row,
        "moment_validation": moment_validation,
        "compile_telemetry": telemetry.summary(),
        "persistent_compilation_cache": {
            "dir": cache_dir,
            "entries_before": cache_entries_before,
            "entries_after": len(os.listdir(cache_dir)),
            "cold_warm_demo": cache_effect,
        },
    }
    full_path = Path(__file__).parent / "BENCH_FULL.json"
    full_path.write_text(json.dumps(full, indent=1))
    _log(f"full artifact: {full_path}")

    ratios = {
        str(r["config"]): r.get("vs_reference_ess")
        for r in configs_rows if "config" in r
    }
    moment_ok = {
        key: val.get("ok") for key, val in moment_validation.items()
    }
    telemetry_summary = dict(full["compile_telemetry"])
    telemetry_summary["top_programs_by_compile_seconds"] = (
        telemetry_summary.get("top_programs_by_compile_seconds", [])[:3]
    )
    print(json.dumps({
        "metric": full["metric"],
        "value": full["value"],
        "unit": full["unit"],
        "vs_baseline": full["vs_baseline"],
        "ratios_vs_reference_ess": ratios,
        "moment_ok": moment_ok,
        "roofline": [
            {k: row.get(k)
             for k in ("dim", "achieved_tflops", "frac_of_probe_peak",
                       "error")
             if k in row}
            for row in roofline_rows
        ],
        "softabs_eigh": {
            k: softabs_row.get(k)
            for k in ("dim", "eigh_auto_path", "chain_iters_per_sec",
                      "auto_over_xla_speedup", "auto_over_blocked_speedup",
                      "auto_over_parallel_speedup",
                      "mean_accept", "error")
            if k in softabs_row
        },
        "chip_probe_steps_per_sec": full["chip_probe_steps_per_sec"],
        "compile_telemetry": telemetry_summary,
        "persistent_cache_cold_over_warm": cache_effect.get(
            "cold_over_warm_compile_seconds",
        ),
        "wall_convention": "median_of_repeats",
        "detail": "BENCH_FULL.json",
    }))


if __name__ == "__main__":
    main()
