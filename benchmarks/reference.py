"""Measure single-core reference-Mici throughput for the BASELINE configs.

The reference publishes no benchmark numbers (SURVEY.md §6), so each
comparison denominator is *measured*: the identical sampler configuration
(same system, integrator, transition settings and analytic derivative
functions) is run with reference Mici (NumPy/SciPy backend, single chain,
single CPU core) in a subprocess, and iterations/sec recorded.

Two reference ESS/sec estimators exist:

- ``measure_reference_ess`` (preferred; used for every config in
  bench.py): ESS is computed **directly from the reference run's own
  traces** — the reference subprocess saves its position traces to a
  temporary ``.npy`` and the parent computes ESS/sec from them.  This
  makes no distributional assumption and is valid for adaptive
  configurations whose two implementations adapt under different PRNG
  streams (VERDICT round-2 weak #1 / item 2).
- ``measure_reference`` (iterations/sec only): for fixed-parameter
  configs the denominator may instead be derived as ``iterations/sec x
  ESS-per-chain-iteration`` with the per-iteration statistical
  efficiency measured from the TPU run of the identical kernel (both
  samplers make the same per-iteration moves in distribution).  Kept as
  a cross-check and for quick runs.
"""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np

_PROLOGUE = r"""
import sys, time
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/reference/src")
import mici
"""

_EPILOGUE = r"""
t0 = time.perf_counter()
out = sampler.sample_chains(
    N_WARM, N_MAIN, init, display_progress=False, **kwargs)
dt = time.perf_counter() - t0
print("ITER_PER_SEC", len(init) * (N_WARM + N_MAIN) / dt)
"""

# Variant that also saves the main-stage position traces (the default
# reference trace function records ``pos``) so the parent can compute the
# reference's own ESS directly.
_EPILOGUE_TRACES = r"""
t0 = time.perf_counter()
out = sampler.sample_chains(
    N_WARM, N_MAIN, init, display_progress=False, **kwargs)
dt = time.perf_counter() - t0
traces = np.stack([np.asarray(t) for t in out.traces["pos"]])
np.save(TRACE_PATH, traces[:, :, :TRACE_DIM_CAP])
print("ITER_PER_SEC", len(init) * (N_WARM + N_MAIN) / dt)
print("WALL_SECONDS", dt)
"""

#: Per-config reference scripts.  Each must define ``sampler``, ``init``,
#: ``kwargs``, ``N_WARM`` and ``N_MAIN`` before the epilogue runs.  Config 3
#: (SoftAbs RMHMC banana) lives in bench.py (the headline benchmark).
REFERENCE_SCRIPTS = {
    1: r"""
# Config 1: static HMC, 100-D correlated Gaussian, fixed step size.
# Mirrors benchmarks/configs.py:config_1_static_hmc (same PRNG-derived
# precision matrix).
rng = np.random.default_rng(0)
dim = 100
a = rng.standard_normal((dim, dim)) / np.sqrt(dim)
cov = a @ a.T + np.eye(dim)
prec = np.linalg.inv(cov)

def nld(q):
    return 0.5 * q @ (prec @ q)

def grad(q):
    return prec @ q

system = mici.systems.EuclideanMetricSystem(nld, grad_neg_log_dens=grad)
integrator = mici.integrators.LeapfrogIntegrator(system, step_size=0.2)
sampler = mici.samplers.StaticMetropolisHMC(
    system, integrator, np.random.default_rng(1234), n_step=10)
init = list(np.random.default_rng(1).standard_normal((N_CHAIN, dim)))
kwargs = {"adapters": None}
# Warm-up burns in the non-stationary init (traces cover main only, so
# the measured ESS is a stationary quantity, mirroring the TPU rows).
N_WARM, N_MAIN = %(n_warm)d, %(n_iter)d
""",
    2: r"""
# Config 2: adaptive NUTS (dual averaging + windowed diagonal metric) on
# the hierarchical logistic-regression posterior.  Mirrors
# benchmarks/configs.py:hierarchical_logistic_regression (same data).
rng = np.random.default_rng(0)
n_data, n_feature = 256, 8
x = rng.standard_normal((n_data, n_feature))
true_beta = rng.standard_normal(n_feature)
logits_true = x @ true_beta
y = (rng.uniform(size=n_data) < 1 / (1 + np.exp(-logits_true))).astype(
    np.float64)

def nld(q):
    log_tau, beta = q[0], q[1:]
    logits = x @ beta
    loglik = np.sum(y * logits - np.logaddexp(0.0, logits))
    log_prior = (-0.5 * log_tau**2
                 - 0.5 * np.sum(beta**2) * np.exp(-2 * log_tau)
                 - n_feature * log_tau)
    return -(loglik + log_prior)

def grad(q):
    log_tau, beta = q[0], q[1:]
    logits = x @ beta
    sig = 1 / (1 + np.exp(-logits))
    dloglik_dbeta = x.T @ (y - sig)
    dlogprior_dlt = (-log_tau + np.sum(beta**2) * np.exp(-2 * log_tau)
                     - n_feature)
    dlogprior_dbeta = -beta * np.exp(-2 * log_tau)
    return -np.concatenate([[dlogprior_dlt], dloglik_dbeta
                            + dlogprior_dbeta])

system = mici.systems.EuclideanMetricSystem(nld, grad_neg_log_dens=grad)
integrator = mici.integrators.LeapfrogIntegrator(system)
sampler = mici.samplers.DynamicMultinomialHMC(
    system, integrator, np.random.default_rng(1234), max_tree_depth=3)
init = list(np.random.default_rng(1).standard_normal((N_CHAIN, n_feature + 1)) * 0.5)
kwargs = {"adapters": [
    mici.adapters.DualAveragingStepSizeAdapter(),
    mici.adapters.OnlineVarianceMetricAdapter(),
]}
N_WARM, N_MAIN = %(n_warm)d, %(n_iter)d
""",
    3: r"""
# Config 3: SoftAbs RMHMC (implicit generalized leapfrog + fixed-point
# solves) on the banana posterior with analytic derivative functions.
# Mirrors benchmarks/configs.py:config_3_riemannian and bench.py (same
# step size / solver iterations / depth cap / softabs coefficient).
def nld(q):
    return 0.5 * q[0] ** 2 / 8.0 + 0.5 * (q[1] - q[0] ** 2 / 4.0) ** 2

def grad(q):
    r = q[1] - q[0] ** 2 / 4.0
    return np.array([q[0] / 8.0 - r * q[0] / 2.0, r])

def hess(q):
    h00 = 1.0 / 8.0 + 3.0 * q[0] ** 2 / 8.0 - q[1] / 2.0
    h01 = -q[0] / 2.0
    return np.array([[h00, h01], [h01, 1.0]])

def mtp(q):
    def _mtp(m):
        m = np.asarray(m)
        return np.array([
            m[0, 0] * 3.0 * q[0] / 4.0 - (m[0, 1] + m[1, 0]) / 2.0,
            -m[0, 0] / 2.0,
        ])
    return _mtp

system = mici.systems.SoftAbsRiemannianMetricSystem(
    nld, grad_neg_log_dens=grad, hess_neg_log_dens=hess,
    mtp_neg_log_dens=mtp, softabs_coeff=1.0)
integrator = mici.integrators.ImplicitLeapfrogIntegrator(
    system, step_size=0.2, fixed_point_solver_kwargs={"max_iters": 30})
sampler = mici.samplers.DynamicMultinomialHMC(
    system, integrator, np.random.default_rng(1234), max_tree_depth=4)
# Exact stationary init (mirrors benchmarks/configs.py:banana_exact_sample,
# same seed): ESS is then measured at stationarity on both sides.
_rng = np.random.default_rng(1)
_q0 = _rng.standard_normal(N_CHAIN) * np.sqrt(8.0)
_q1 = _q0**2 / 4.0 + _rng.standard_normal(N_CHAIN)
init = list(np.stack([_q0, _q1], axis=1))
kwargs = {"adapters": None}
N_WARM, N_MAIN = 0, %(n_iter)d
""",
    4: r"""
# Config 4: constrained HMC on the torus manifold (reference README
# worked example).  Mirrors benchmarks/configs.py:config_4.
r_major, r_minor = 1.0, 0.5

def constr(q):
    x, y, z = q[0], q[1], q[2]
    return np.array([
        ((x**2 + y**2) ** 0.5 - r_major) ** 2 + z**2 - r_minor**2])

def jacob_constr(q):
    x, y, z = q[0], q[1], q[2]
    s = (x**2 + y**2) ** 0.5
    f = 2.0 * (s - r_major) / s
    return np.array([[f * x, f * y, 2.0 * z]])

def nld(q):
    x, y, z = q[0], q[1], q[2]
    return 0.5 * ((x - 1.0) ** 2 + y**2 + 2.0 * z**2)

def grad(q):
    x, y, z = q[0], q[1], q[2]
    return np.array([x - 1.0, y, 2.0 * z])

system = mici.systems.DenseConstrainedEuclideanMetricSystem(
    nld, constr, grad_neg_log_dens=grad, jacob_constr=jacob_constr,
    dens_wrt_hausdorff=True)
integrator = mici.integrators.ConstrainedLeapfrogIntegrator(
    system, step_size=0.15, n_inner_step=2)
sampler = mici.samplers.DynamicMultinomialHMC(
    system, integrator, np.random.default_rng(1234), max_tree_depth=5)
thetas = np.random.default_rng(1).uniform(0, 2 * np.pi, (N_CHAIN, 2))
init = list(np.stack([
    (r_major + r_minor * np.cos(thetas[:, 0])) * np.cos(thetas[:, 1]),
    (r_major + r_minor * np.cos(thetas[:, 0])) * np.sin(thetas[:, 1]),
    r_minor * np.sin(thetas[:, 0])], axis=1))
kwargs = {"adapters": None}
# Warm-up burns in the uniform-angle init (the target density is not
# uniform in the angles), mirroring the TPU rows' discarded warm-up.
N_WARM, N_MAIN = %(n_warm)d, %(n_iter)d
""",
    5: r"""
# Config 5: NUTS depth 7 with dual averaging on the 100-D correlated
# Gaussian (the massively-parallel config, single-chain single-core
# denominator).  Mirrors benchmarks/configs.py:config_5.
rng = np.random.default_rng(0)
dim = 100
a = rng.standard_normal((dim, dim)) / np.sqrt(dim)
cov = a @ a.T + np.eye(dim)
prec = np.linalg.inv(cov)

def nld(q):
    return 0.5 * q @ (prec @ q)

def grad(q):
    return prec @ q

system = mici.systems.EuclideanMetricSystem(nld, grad_neg_log_dens=grad)
integrator = mici.integrators.LeapfrogIntegrator(system)
sampler = mici.samplers.DynamicMultinomialHMC(
    system, integrator, np.random.default_rng(1234), max_tree_depth=4)
init = list(np.random.default_rng(1).standard_normal((N_CHAIN, dim)))
kwargs = {"adapters": [mici.adapters.DualAveragingStepSizeAdapter()]}
N_WARM, N_MAIN = %(n_warm)d, %(n_iter)d
""",
}


def measure_reference_ess(config, n_iter=400, n_warm=50, timeout=900,
                          n_repeat=2, trace_dim_cap=8, n_chain=4,
                          return_traces=False):
    """Directly measured reference ESS/sec from the reference's traces.

    Runs the reference configuration in a subprocess with its position
    traces saved to a temporary file, then computes mean-over-dims total
    ESS (same estimator as the TPU side, mici_tpu.diagnostics) divided by
    the reference's wall time (warm-up included, mirroring how the TPU
    wall time is measured in benchmarks/run.py).

    Returns ``(iters_per_sec, ess_per_sec, measured)`` — medians over
    ``n_repeat`` runs, or ``(None, None, False)`` if every run failed.
    With ``return_traces=True`` a fourth element carries the reference
    position traces, shape ``(n_chain, n_iter, trace_dim_cap)`` (repeats
    run identical seeds, so any repeat's traces serve) — the
    statistical oracle for adaptive configs with no closed-form moments
    (benchmarks/oracles.py:check_moments_vs_reference).
    """
    import tempfile

    from mici_tpu.diagnostics import effective_sample_size

    script_body = (REFERENCE_SCRIPTS[config]
                   % {"n_iter": n_iter, "n_warm": n_warm})
    rates, ess_rates = [], []
    saved_traces = None
    for _ in range(n_repeat):
        with tempfile.NamedTemporaryFile(suffix=".npy") as tmp:
            header = (f"TRACE_PATH = {tmp.name!r}\n"
                      f"TRACE_DIM_CAP = {trace_dim_cap}\n"
                      f"N_CHAIN = {n_chain}\n")
            script = _PROLOGUE + header + script_body + _EPILOGUE_TRACES
            try:
                result = subprocess.run(
                    [sys.executable, "-c", script], capture_output=True,
                    text=True, timeout=timeout, env=dict(os.environ),
                )
                wall = rate = None
                for line in result.stdout.splitlines():
                    if line.startswith("ITER_PER_SEC"):
                        rate = float(line.split()[1])
                    elif line.startswith("WALL_SECONDS"):
                        wall = float(line.split()[1])
                if rate is None or wall is None:
                    sys.stderr.write(result.stderr[-2000:] + "\n")
                    continue
                traces = np.load(tmp.name)  # (n_chain, n_main, dim_cap)
                ess = np.array([
                    effective_sample_size(traces[:, :, d])
                    for d in range(traces.shape[-1])
                ])
                rates.append(rate)
                ess_rates.append(float(ess.mean()) / wall)
                saved_traces = traces
            except (subprocess.TimeoutExpired, OSError):
                pass
    if rates:
        out = (float(np.median(rates)), float(np.median(ess_rates)), True)
    else:
        out = (None, None, False)
    return (*out, saved_traces) if return_traces else out


def measure_reference(config, n_iter=100, n_warm=50, timeout=600,
                      n_repeat=3):
    """Median single-core reference iterations/sec for a config.

    Returns ``(iters_per_sec, measured)`` with ``measured=False`` when
    every subprocess run failed (``iters_per_sec`` is then None).
    """
    script = (_PROLOGUE
              + "N_CHAIN = 1\n"
              + REFERENCE_SCRIPTS[config] % {"n_iter": n_iter,
                                             "n_warm": n_warm}
              + _EPILOGUE)
    rates = []
    for _ in range(n_repeat):
        try:
            result = subprocess.run(
                [sys.executable, "-c", script], capture_output=True,
                text=True, timeout=timeout, env=dict(os.environ),
            )
            for line in result.stdout.splitlines():
                if line.startswith("ITER_PER_SEC"):
                    rates.append(float(line.split()[1]))
                    break
            else:
                sys.stderr.write(result.stderr[-2000:] + "\n")
        except (subprocess.TimeoutExpired, OSError):
            pass
    if rates:
        return float(np.median(rates)), True
    return None, False


if __name__ == "__main__":
    import json

    for config in (int(c) for c in (sys.argv[1:] or ["1", "2", "4", "5"])):
        rate, measured = measure_reference(config)
        print(json.dumps({
            "config": config,
            "ref_iters_per_sec": None if rate is None else round(rate, 2),
            "measured": measured,
        }))
