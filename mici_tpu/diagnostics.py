"""Convergence diagnostics: effective sample size and R-hat.

The reference delegates diagnostics to ArviZ (mici/interop.py); a native
implementation is provided here so benchmark and production code has no
external dependency.  Formulas follow Vehtari et al. (2021) / the Stan
reference manual: multi-chain autocovariance combination and Geyer's
initial monotone positive sequence truncation.
"""

from __future__ import annotations

import numpy as np


def _autocovariance_fft(x):
    """Per-chain autocovariance via FFT.  x: (n_chain, n_iter)."""
    n = x.shape[1]
    x = x - x.mean(axis=1, keepdims=True)
    n_fft = int(2 ** np.ceil(np.log2(2 * n)))
    f = np.fft.rfft(x, n=n_fft, axis=1)
    acov = np.fft.irfft(f * np.conj(f), n=n_fft, axis=1)[:, :n].real
    return acov / n


def effective_sample_size(x):
    """Multi-chain effective sample size of scalar chain values.

    Args:
        x: Array of shape (n_chain, n_iter) of per-chain draws of a scalar
            quantity (pass each dimension separately for vector states).

    Returns:
        Estimated total effective sample size across all chains.
    """
    x = np.asarray(x, dtype=np.float64)
    if x.ndim == 1:
        x = x[None, :]
    m, n = x.shape
    if n < 4:
        return float(m * n)
    acov = _autocovariance_fft(x)
    chain_means = x.mean(axis=1)
    chain_vars = acov[:, 0] * n / (n - 1)
    w = chain_vars.mean()
    var_plus = w * (n - 1) / n
    if m > 1:
        var_plus += chain_means.var(ddof=1)
    if var_plus == 0 or not np.isfinite(var_plus):
        return float(m * n)
    rho = 1.0 - (w - acov.mean(axis=0)) / var_plus
    rho[0] = 1.0
    # Geyer initial positive sequence: truncate at the first non-positive
    # paired autocorrelation sum P_k = rho[2k] + rho[2k+1], then enforce
    # monotone decrease; tau = -1 + 2 * sum(P_k).
    n_pair = n // 2
    pair_sums = rho[0:2 * n_pair:2] + rho[1:2 * n_pair:2]
    positive = pair_sums > 0
    k = int(np.argmin(positive)) if not positive.all() else n_pair
    k = max(k, 1)
    kept = np.minimum.accumulate(pair_sums[:k])
    tau = max(-1.0 + 2.0 * kept.sum(), 1.0 / np.log10(max(n, 10)))
    ess = m * n / tau
    return float(min(ess, m * n * np.log10(max(n, 10))))


def effective_sample_size_per_dim(traces):
    """ESS for each state dimension.  traces: (n_chain, n_iter, dim)."""
    traces = np.asarray(traces)
    return np.array([
        effective_sample_size(traces[:, :, d])
        for d in range(traces.shape[2])
    ])


def summary(traces, var_names=None):
    """Summary statistics and diagnostics table for chain traces.

    The native replacement for the reference workflow's ``arviz.summary``
    (cf. /root/reference/README.md:385).

    Args:
        traces: Dict of trace arrays of shape (n_chain, n_iter, ...) (as
            returned by ``sample_chains``), or a single such array.
        var_names: Optional iterable restricting which keys to summarize.

    Returns:
        Dict mapping flattened variable name (e.g. ``"pos[3]"``) to a dict
        with keys ``mean``, ``sd``, ``median``, ``q5``, ``q95``, ``ess``
        and ``rhat``.
    """
    if not isinstance(traces, dict):
        traces = {"var": traces}
    rows = {}
    for key, arr in traces.items():
        if var_names is not None and key not in var_names:
            continue
        arr = np.asarray(arr)
        if arr.ndim == 1:
            arr = arr[None, :]
        if arr.ndim == 2:
            arr = arr[:, :, None]
            names = [key]
        else:
            flat_dims = int(np.prod(arr.shape[2:]))
            arr = arr.reshape(arr.shape[0], arr.shape[1], flat_dims)
            names = (
                [key] if flat_dims == 1
                else [f"{key}[{i}]" for i in range(flat_dims)]
            )
        for d, name in enumerate(names):
            x = arr[:, :, d]
            flat = x.reshape(-1)
            rows[name] = {
                "mean": float(flat.mean()),
                "sd": float(flat.std(ddof=1)) if flat.size > 1 else 0.0,
                "median": float(np.median(flat)),
                "q5": float(np.quantile(flat, 0.05)),
                "q95": float(np.quantile(flat, 0.95)),
                "ess": effective_sample_size(x),
                "rhat": split_rhat(x),
            }
    return rows


def format_summary(rows):
    """Render a :func:`summary` result as an aligned text table."""
    header = ["variable", "mean", "sd", "median", "q5", "q95", "ess",
              "rhat"]
    lines = ["  ".join(f"{h:>10}" for h in header)]
    for name, stats in rows.items():
        lines.append("  ".join([f"{name:>10}"] + [
            f"{stats[k]:>10.3f}" for k in header[1:]
        ]))
    return "\n".join(lines)


def split_rhat(x):
    """Split-chain potential scale reduction factor (R-hat).

    Args:
        x: Array of shape (n_chain, n_iter).

    Returns:
        Split-R-hat estimate (values near 1 indicate convergence).
    """
    x = np.asarray(x, dtype=np.float64)
    if x.ndim == 1:
        x = x[None, :]
    m, n = x.shape
    half = n // 2
    halves = np.concatenate([x[:, :half], x[:, half:2 * half]], axis=0)
    mh, nh = halves.shape
    chain_means = halves.mean(axis=1)
    chain_vars = halves.var(axis=1, ddof=1)
    w = chain_vars.mean()
    b = nh * chain_means.var(ddof=1)
    var_plus = (nh - 1) / nh * w + b / nh
    if w == 0:
        return 1.0
    return float(np.sqrt(var_plus / w))
