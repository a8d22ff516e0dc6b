"""Quadrature moment oracles for on-device statistical validation.

The driver-run benchmark (bench.py) executes BASELINE configs 3 (banana,
SoftAbs RMHMC) and 4 (torus, constrained HMC) on the TPU chip in f32 and
checks the posterior moments of the resulting traces against the dense
quadrature oracles below — the same oracle style as
tests/test_statistical.py, but evaluated on the *same runs* the recorded
performance numbers come from (VERDICT round-2 item 4: on-chip f32
statistical validation, previously only indirect via x64 CPU tests).

Reference for the target definitions: banana density as in
benchmarks/configs.py:banana_neg_log_dens; torus constraint/density as in
benchmarks/configs.py:config_4_constrained_torus (which mirrors the
reference README worked example, /root/reference/README.md:292-406).
"""

from __future__ import annotations

import numpy as np


def banana_moments():
    """Mean/variance of the 2D banana density by dense quadrature."""
    q0 = np.linspace(-12, 12, 481)
    q1 = np.linspace(-6, 40, 481)
    g0, g1 = np.meshgrid(q0, q1, indexing="ij")
    nld = 0.5 * g0**2 / 8.0 + 0.5 * (g1 - g0**2 / 4.0) ** 2
    dens = np.exp(-nld)
    z = dens.sum()
    mean = np.array([(g0 * dens).sum(), (g1 * dens).sum()]) / z
    var = np.array([
        ((g0 - mean[0]) ** 2 * dens).sum(),
        ((g1 - mean[1]) ** 2 * dens).sum(),
    ]) / z
    return mean, var


def torus_moments(r_major=1.0, r_minor=0.5, n_grid=720):
    """Mean/variance of the torus-constrained density by angle quadrature.

    The torus is parameterized by (theta, phi) with
        x = (R + r cos theta) cos phi,
        y = (R + r cos theta) sin phi,
        z = r sin theta,
    and surface (Hausdorff) measure dA = r (R + r cos theta) dtheta dphi.
    The config-4 density is exp(-nld(x, y, z)) *with respect to the
    Hausdorff measure* (``dens_wrt_hausdorff=True``), so quadrature
    weights are exp(-nld) (R + r cos theta) on a uniform angle grid.
    """
    theta = np.linspace(0.0, 2 * np.pi, n_grid, endpoint=False)
    phi = np.linspace(0.0, 2 * np.pi, n_grid, endpoint=False)
    gt, gp = np.meshgrid(theta, phi, indexing="ij")
    ring = r_major + r_minor * np.cos(gt)
    x = ring * np.cos(gp)
    y = ring * np.sin(gp)
    z = r_minor * np.sin(gt)
    nld = 0.5 * ((x - 1.0) ** 2 + y**2 + 2.0 * z**2)
    w = np.exp(-nld) * ring
    zsum = w.sum()
    coords = np.stack([x, y, z])
    mean = (coords * w).sum(axis=(1, 2)) / zsum
    var = ((coords - mean[:, None, None]) ** 2 * w).sum(axis=(1, 2)) / zsum
    return mean, var


def gaussian_moments(dim_cap=8, dim=100, seed=0):
    """Exact moments of the correlated-Gaussian target (configs 1 and 5).

    The target is the zero-mean Gaussian with covariance built by
    benchmarks/configs.py:correlated_gaussian (same PRNG-derived matrix),
    so the exact mean is zero and the exact per-dim variance is the
    covariance diagonal.  Only the first ``dim_cap`` dimensions are
    traced by the benchmark rows, so only those moments are returned.
    """
    from benchmarks.configs import correlated_gaussian

    _, cov = correlated_gaussian(dim, seed)
    return np.zeros(dim_cap), np.diag(cov)[:dim_cap].copy()


def check_moments_vs_reference(tpu_traces, ref_traces, z_max=5.0,
                               var_z_max=5.0):
    """Validate TPU trace moments against the reference run's own traces.

    For adaptive configs with no closed-form moments (config 2's
    hierarchical logistic regression) the oracle is the reference
    implementation's long-run trace: both estimates target the same
    posterior, so their means should agree within Monte-Carlo error.
    Tolerances are ESS-aware: the reference side dominates the standard
    error (its total ESS is far smaller than the 1024-chain TPU run's),
    so per-dim z-scores use SE = sqrt(var_ref / ess_ref + var_tpu /
    ess_tpu) for means and the asymptotic sqrt(2/ess) relative SE for
    variances.  Returns a JSON-ready dict with an ``ok`` flag.
    """
    from mici_tpu.diagnostics import effective_sample_size

    def flat_moments(traces):
        traces = np.asarray(traces)
        dim = traces.shape[-1]
        ess = np.array([
            max(effective_sample_size(traces[:, :, d]), 4.0)
            for d in range(dim)
        ])
        flat = traces.reshape(-1, dim)
        return flat.mean(axis=0), flat.var(axis=0), ess

    mean_t, var_t, ess_t = flat_moments(tpu_traces)
    dim = min(len(mean_t), np.asarray(ref_traces).shape[-1])
    ref_traces = np.asarray(ref_traces)[:, :, :dim]
    mean_r, var_r, ess_r = flat_moments(ref_traces)
    mean_t, var_t, ess_t = mean_t[:dim], var_t[:dim], ess_t[:dim]
    se_mean = np.sqrt(var_r / ess_r + var_t / ess_t)
    z_mean = np.abs(mean_t - mean_r) / se_mean
    se_log_var = np.sqrt(2.0 / ess_r + 2.0 / ess_t)
    z_var = np.abs(np.log(var_t / var_r)) / se_log_var
    return {
        "mean_z_max": round(float(z_mean.max()), 2),
        "var_z_max": round(float(z_var.max()), 2),
        "ref_ess_min": round(float(ess_r.min()), 1),
        "z_tol": z_max,
        "ok": bool(z_mean.max() < z_max and z_var.max() < var_z_max),
    }


def check_moments(traces, mean_oracle, var_oracle, mean_atol, var_rtol,
                  discard_frac=0.0):
    """Compare empirical trace moments against oracle moments.

    ``traces`` has shape (n_chain, n_iter, dim).  Returns a JSON-ready
    dict with the maximum absolute mean error, the maximum relative
    variance error and an overall ``ok`` flag.
    """
    traces = np.asarray(traces)
    if discard_frac:
        traces = traces[:, int(traces.shape[1] * discard_frac):]
    flat = traces.reshape(-1, traces.shape[-1])
    mean_est = flat.mean(axis=0)
    var_est = flat.var(axis=0)
    mean_err = np.abs(mean_est - mean_oracle).max()
    var_err = np.abs(var_est / var_oracle - 1.0).max()
    return {
        "mean_abs_err_max": round(float(mean_err), 4),
        "var_rel_err_max": round(float(var_err), 4),
        "mean_atol": mean_atol,
        "var_rtol": var_rtol,
        "ok": bool(mean_err < mean_atol and var_err < var_rtol),
    }
