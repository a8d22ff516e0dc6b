"""Streaming quantile sketches (P-square algorithm), batched for device use.

Complements the running-moment trace summaries
(``sample_chains(trace_summary=...)``): the P² algorithm (Jain &
Chlamtac 1985) tracks an arbitrary set of quantiles of a stream in O(1)
memory per quantile — five marker heights whose positions are nudged
toward their desired ranks with parabolic (piecewise-quadratic)
interpolation.  All update logic is branch-free (``jnp.where`` masks)
so a sketch state batched over (chains, trace dims, quantiles) updates
in a handful of fused kernels per iteration inside the compiled
sampling programs.

No reference counterpart (mici stores full traces only); the closest
analogue is the accumulator design of ``mici_tpu.samplers``'s Welford
summaries.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

#: Number of P² markers per tracked quantile.
N_MARKERS = 5


def p2_init(batch_shape, quantiles, dtype):
    """Zero state for P² sketches of ``quantiles`` over ``batch_shape``.

    Returns a dict pytree with leaves shaped
    ``batch_shape + (len(quantiles), 5)`` (markers) plus a shared
    ``count`` of shape ``batch_shape``.  Host (numpy) arrays so driver
    init batches upload in one transfer.
    """
    q = len(quantiles)
    marker_shape = tuple(batch_shape) + (q, N_MARKERS)
    return {
        # first five observations are collected (sorted) in `heights`
        "heights": np.full(marker_shape, np.inf, dtype),
        "pos": np.zeros(marker_shape, np.int32),
        "des": np.zeros(marker_shape, dtype),
        "count": np.zeros(tuple(batch_shape), np.int32),
    }


def _desired_increments(quantiles, dtype):
    p = jnp.asarray(quantiles, dtype)
    return jnp.stack([
        jnp.zeros_like(p), p / 2, p, (1 + p) / 2, jnp.ones_like(p),
    ], axis=-1)                                     # (Q, 5)


def _desired_init(quantiles, dtype):
    p = jnp.asarray(quantiles, dtype)
    return jnp.stack([
        jnp.zeros_like(p), 2 * p, 4 * p, 2 + 2 * p,
        jnp.full_like(p, 4.0),
    ], axis=-1)                                     # (Q, 5)


def _safe_div(num, den):
    den_safe = jnp.where(den == 0, 1.0, den)
    return num / den_safe


def p2_update(state, x, quantiles):
    """One P² step for observation ``x`` (shape = batch_shape).

    ``quantiles`` must be the static tuple used at init.  Handles the
    five-observation warm-up phase with masked sorting so the update is
    a single branch-free program.
    """
    heights = state["heights"]                      # (..., Q, 5)
    pos = state["pos"]
    des = state["des"]
    count = state["count"]                          # (...,)
    dtype = heights.dtype
    xq = x[..., None, None].astype(dtype)           # (..., 1, 1)
    warm = (count < N_MARKERS)[..., None, None]     # (..., 1, 1)
    cnt_b = count[..., None, None]

    # --- warm-up phase: insert into the (inf-padded) sorted buffer ----
    idx = jnp.arange(N_MARKERS, dtype=jnp.int32)
    inserted = jnp.where(idx == cnt_b, xq, heights)
    warm_heights = jnp.sort(inserted, axis=-1)
    # when the fifth observation lands, markers initialize
    becomes_ready = (count == N_MARKERS - 1)[..., None, None]
    warm_pos = jnp.where(
        becomes_ready, jnp.broadcast_to(idx, heights.shape), pos,
    )
    warm_des = jnp.where(
        becomes_ready, _desired_init(quantiles, dtype), des,
    )

    # --- steady phase: the P² marker update ---------------------------
    q0 = heights[..., 0:1]
    q4 = heights[..., 4:5]
    low = xq < q0
    high = xq >= q4
    heights_s = jnp.concatenate([
        jnp.where(low, xq, q0), heights[..., 1:4], jnp.where(
            high, xq, q4),
    ], axis=-1)
    # cell index k in 0..3 with q_k <= x < q_{k+1} (after end-clamping)
    k = jnp.clip(
        jnp.sum((heights_s[..., :4] <= xq).astype(jnp.int32), axis=-1,
                keepdims=True) - 1,
        0, 3,
    )                                               # (..., Q, 1)
    pos_s = pos + (idx > k).astype(jnp.int32)
    des_s = des + _desired_increments(quantiles, dtype)

    # adjust the three interior markers in sequence
    for i in (1, 2, 3):
        qm = heights_s[..., i - 1]
        qi = heights_s[..., i]
        qp_ = heights_s[..., i + 1]
        nm = pos_s[..., i - 1].astype(dtype)
        ni = pos_s[..., i].astype(dtype)
        np_ = pos_s[..., i + 1].astype(dtype)
        d = des_s[..., i] - ni
        move = ((d >= 1) & (np_ - ni > 1)) | ((d <= -1) & (nm - ni < -1))
        ds = jnp.where(d >= 0, 1.0, -1.0).astype(dtype)
        parab = qi + _safe_div(ds, np_ - nm) * (
            (ni - nm + ds) * _safe_div(qp_ - qi, np_ - ni)
            + (np_ - ni - ds) * _safe_div(qi - qm, ni - nm)
        )
        parab_ok = (qm < parab) & (parab < qp_)
        q_nbr = jnp.where(ds > 0, qp_, qm)
        n_nbr = jnp.where(ds > 0, np_, nm)
        linear = qi + ds * _safe_div(q_nbr - qi, n_nbr - ni)
        new_qi = jnp.where(move, jnp.where(parab_ok, parab, linear), qi)
        new_ni = pos_s[..., i] + jnp.where(
            move, ds.astype(jnp.int32), 0,
        )
        heights_s = jnp.concatenate([
            heights_s[..., :i], new_qi[..., None],
            heights_s[..., i + 1:],
        ], axis=-1)
        pos_s = jnp.concatenate([
            pos_s[..., :i], new_ni[..., None], pos_s[..., i + 1:],
        ], axis=-1)

    return {
        "heights": jnp.where(warm, warm_heights, heights_s),
        "pos": jnp.where(warm, warm_pos, pos_s),
        "des": jnp.where(warm, warm_des, des_s),
        "count": count + 1,
    }


def p2_estimate(state, quantiles):
    """Quantile estimates from a (fetched, numpy) P² sketch state.

    Steady-phase sketches report the middle marker height; warm-phase
    sketches (< 5 observations) fall back to exact quantiles of the
    buffered values.  Shape: ``batch_shape + (len(quantiles),)``.
    """
    heights = np.asarray(state["heights"])
    count = np.asarray(state["count"])
    est = heights[..., 2].copy()                    # (..., Q)
    warm = count < N_MARKERS
    if np.any(warm):
        qs = np.asarray(quantiles)
        for index in np.argwhere(warm):
            index = tuple(index)
            n = int(count[index])
            if n == 0:
                est[index] = np.nan
                continue
            # all Q rows share the same sorted warm-up buffer
            vals = np.sort(heights[index][0])[:n]
            est[index] = np.quantile(vals, qs)
    return est
