"""Measure single-core reference-Mici throughput for the BASELINE configs.

The reference publishes no benchmark numbers (SURVEY.md §6), so each
comparison denominator is *measured*: the identical sampler configuration
(same system, integrator, transition settings and analytic derivative
functions) is run with reference Mici (NumPy/SciPy backend, single chain,
single CPU core) in a subprocess, and iterations/sec recorded.

Reference ESS/sec is then derived as ``iterations/sec x ESS-per-chain-
iteration`` with the per-iteration statistical efficiency measured from
the TPU run of the identical kernel (both samplers make the same
per-iteration moves in distribution, so per-iteration ESS matches; see
docs/BENCHMARKS.md methodology note).
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
print("ITER_PER_SEC", (N_WARM + N_MAIN) / dt)
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
init = [np.random.default_rng(1).standard_normal(dim)]
kwargs = {"adapters": None}
N_WARM, N_MAIN = 0, %(n_iter)d
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
init = [np.random.default_rng(1).standard_normal(n_feature + 1) * 0.5]
kwargs = {"adapters": [
    mici.adapters.DualAveragingStepSizeAdapter(),
    mici.adapters.OnlineVarianceMetricAdapter(),
]}
N_WARM, N_MAIN = %(n_warm)d, %(n_iter)d
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
    system, integrator, np.random.default_rng(1234), max_tree_depth=4)
theta = np.random.default_rng(1).uniform(0, 2 * np.pi, 2)
init = [np.array([
    (r_major + r_minor * np.cos(theta[0])) * np.cos(theta[1]),
    (r_major + r_minor * np.cos(theta[0])) * np.sin(theta[1]),
    r_minor * np.sin(theta[0])])]
kwargs = {"adapters": None}
N_WARM, N_MAIN = 0, %(n_iter)d
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
init = [np.random.default_rng(1).standard_normal(dim)]
kwargs = {"adapters": [mici.adapters.DualAveragingStepSizeAdapter()]}
N_WARM, N_MAIN = %(n_warm)d, %(n_iter)d
""",
}


def measure_reference(config, n_iter=100, n_warm=50, timeout=600,
                      n_repeat=3):
    """Median single-core reference iterations/sec for a config.

    Returns ``(iters_per_sec, measured)`` with ``measured=False`` when
    every subprocess run failed (``iters_per_sec`` is then None).
    """
    script = (_PROLOGUE
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
