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
