"""Adaptive tuning of transition parameters during warm-up.

Reference: mici/adapters.py (644 LoC).  Adapters here are *functional*: the
adapter state is a pytree threaded through the compiled per-iteration scan,
``update`` returns a new adapter state plus a params dict (currently the
per-chain ``step_size``) the sampler injects into the transition pytree,
and ``finalize`` reduces the *batched* (chain-leading-axis) adapter states
into new transition parameters — the reference's cross-chain queue+finalize
combination (mici/adapters.py:486-505, :616-635) becomes a plain reduction
over the chain axis, which XLA lowers to ICI collectives when the chain
axis is sharded over a mesh.
"""

from __future__ import annotations

import abc

import jax
import jax.numpy as jnp
from jax import lax

from mici_tpu import matrices
from mici_tpu.errors import AdaptationError


class Adapter(abc.ABC):
    """Abstract adapter for schemes to adapt transition parameters.

    Reference: mici/adapters.py:32-123.  All methods are pure; ``initialize``
    and ``update`` run per chain (vmapped inside the sampling scan),
    ``finalize`` receives chain-stacked adapter states.
    """

    @abc.abstractmethod
    def initialize(self, chain_state, transition):
        """Initialize adapter state prior to starting adaptive transitions.

        Returns:
            Tuple of (adapter state pytree, params dict) where the params
            dict contains any per-chain transition parameter overrides
            (e.g. ``{"step_size": ...}``).
        """

    @abc.abstractmethod
    def update(self, adapt_state, chain_state, trans_stats, params):
        """Update adapter state after a transition.

        Returns:
            Tuple of (new adapter state, new params dict).
        """

    @abc.abstractmethod
    def finalize(self, adapt_states, chain_states, transition, rng):
        """Reduce chain-stacked adapter states into transition parameters.

        Returns:
            Tuple of (new transition pytree, new chain-stacked states).
        """

    @property
    @abc.abstractmethod
    def is_fast(self):
        """Whether the adapter is 'fast' (local info only) or 'slow'."""

    # Adapters enter the compiled stage programs as *static* jit
    # arguments; hashing by configuration (rather than object identity)
    # means two identically-configured adapter instances hit the same
    # compiled executable — users recreating adapters per run do not pay
    # recompilations.
    def _static_key(self):
        return (type(self), tuple(sorted(vars(self).items())))

    def __hash__(self):
        try:
            return hash(self._static_key())
        except TypeError:  # unhashable attribute: fall back to identity
            return object.__hash__(self)

    def __eq__(self, other):
        if type(other) is not type(self):
            return NotImplemented
        return vars(self) == vars(other)


def arithmetic_mean_log_step_size_reducer(log_step_sizes):
    """Arithmetic mean of step sizes from their logs.

    Reference: mici/adapters.py:126-135.
    """
    return jnp.mean(jnp.exp(log_step_sizes))


def geometric_mean_log_step_size_reducer(log_step_sizes):
    """Geometric mean of step sizes from their logs.

    Reference: mici/adapters.py:138-147.
    """
    return jnp.exp(jnp.mean(log_step_sizes))


def min_log_step_size_reducer(log_step_sizes):
    """Minimum of step sizes from their logs.

    Reference: mici/adapters.py:150-159.
    """
    return jnp.exp(jnp.min(log_step_sizes))


def default_adapt_stat_func(stats):
    """Extract default statistic used for step-size adaptation.

    Reference: mici/adapters.py:162-171.
    """
    return stats["accept_stat"]


class DualAveragingStepSizeAdapter(Adapter):
    """Dual averaging integrator step size adapter (Hoffman & Gelman 2014).

    Reference: mici/adapters.py:174-389.  The coarse initial step size
    search (mici/adapters.py:285-350) is a bounded masked ``while_loop``
    run independently per chain; search failure yields a NaN step size
    which the sampler surfaces as an :class:`AdaptationError` at the next
    host synchronization point.
    """

    is_fast = True

    def __init__(self, adapt_stat_target=0.8, adapt_stat_func=None,
                 log_step_size_reg_target=None,
                 log_step_size_reg_coefficient=0.05, iter_decay_coeff=0.75,
                 iter_offset=10, max_init_step_size_iters=100,
                 log_step_size_reducer=None):
        self.adapt_stat_target = adapt_stat_target
        self.adapt_stat_func = (default_adapt_stat_func
                                if adapt_stat_func is None
                                else adapt_stat_func)
        self.log_step_size_reg_target = log_step_size_reg_target
        self.log_step_size_reg_coefficient = log_step_size_reg_coefficient
        self.iter_decay_coeff = iter_decay_coeff
        self.iter_offset = iter_offset
        self.max_init_step_size_iters = max_init_step_size_iters
        self.log_step_size_reducer = (
            arithmetic_mean_log_step_size_reducer
            if log_step_size_reducer is None else log_step_size_reducer)

    def initialize(self, chain_state, transition):
        init_step_size = self._find_init_step_size(chain_state, transition)
        dtype = chain_state.pos.dtype
        if self.log_step_size_reg_target is None:
            reg_target = jnp.log(10.0 * init_step_size)
        else:
            reg_target = jnp.asarray(
                self.log_step_size_reg_target, dtype)
        adapt_state = {
            "iter": jnp.int32(0),
            "smoothed_log_step_size": jnp.zeros((), dtype),
            "adapt_stat_error": jnp.zeros((), dtype),
            "log_step_size_reg_target": reg_target,
        }
        return adapt_state, {"step_size": init_step_size}

    def _find_init_step_size(self, state, transition):
        """Coarse doubling/halving search for a reasonable init step size.

        Adaptation of Algorithm 4 in Hoffman and Gelman (2014) following
        mici/adapters.py:285-350: |delta_h| vs log(2) decides direction and
        integrator failures always halve.
        """
        system = transition.system
        integrator = transition.integrator
        h_init = system.h(state)
        dtype = state.pos.dtype
        threshold = jnp.asarray(jnp.log(2.0), dtype)

        def cond(carry):
            s, _step, _too_big, found = carry
            return (s < self.max_init_step_size_iters) & ~found

        def body(carry):
            s, step, too_big, _ = carry
            trial = integrator.replace(step_size=step).step(
                state.clear_error(),
            )
            failed = trial.error != 0
            h_trial = system.h(trial)
            delta_h = jnp.abs(h_init - h_trial)
            nan_delta = jnp.isnan(delta_h)
            # Non-failure branch: set too_big on first iteration or NaN.
            too_big_nf = jnp.where(
                (s == 0) | nan_delta, nan_delta | (delta_h > threshold),
                too_big,
            )
            found_nf = (too_big_nf & (delta_h <= threshold)) | (
                ~too_big_nf & (delta_h > threshold))
            step_nf = jnp.where(
                found_nf, step,
                jnp.where(too_big_nf, step / 2.0, step * 2.0))
            # Failure branch: too big, halve, not found.
            new_too_big = jnp.where(failed, True, too_big_nf)
            new_found = jnp.where(failed, False, found_nf)
            new_step = jnp.where(failed, step / 2.0, step_nf)
            return (s + 1, new_step, new_too_big, new_found)

        _, step, _, found = lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.ones((), dtype), jnp.bool_(False),
             jnp.bool_(False)),
        )
        # NaN marks failure (initial-state NaN Hamiltonian or search
        # exhaustion); surfaced as AdaptationError by the sampler.
        bad = ~found | jnp.isnan(h_init)
        return jnp.where(bad, jnp.nan, step)

    def update(self, adapt_state, chain_state, trans_stats, params):
        # Reference: mici/adapters.py:352-373.
        it = adapt_state["iter"] + 1
        error_weight = 1.0 / (self.iter_offset + it)
        adapt_stat_error = (
            adapt_state["adapt_stat_error"] * (1.0 - error_weight)
            + error_weight * (
                self.adapt_stat_target - self.adapt_stat_func(trans_stats)
            )
        )
        smoothing_weight = (1.0 / it) ** self.iter_decay_coeff
        log_step_size = adapt_state["log_step_size_reg_target"] - (
            adapt_stat_error * jnp.sqrt(it.astype(adapt_stat_error.dtype))
            / self.log_step_size_reg_coefficient
        )
        smoothed = (
            adapt_state["smoothed_log_step_size"] * (1.0 - smoothing_weight)
            + smoothing_weight * log_step_size
        )
        new_adapt_state = {
            "iter": it,
            "smoothed_log_step_size": smoothed,
            "adapt_stat_error": adapt_stat_error,
            "log_step_size_reg_target":
                adapt_state["log_step_size_reg_target"],
        }
        new_params = dict(params)
        new_params["step_size"] = jnp.exp(log_step_size)
        return new_adapt_state, new_params

    def finalize(self, adapt_states, chain_states, transition, rng):
        # Reference: mici/adapters.py:375-389.
        log_step_sizes = adapt_states["smoothed_log_step_size"]
        step_size = self.log_step_size_reducer(jnp.atleast_1d(
            log_step_sizes,
        ))
        transition = _set_step_size(transition, step_size)
        return transition, chain_states


def _set_step_size(transition, step_size):
    return transition.replace(
        integrator=transition.integrator.replace(step_size=step_size),
    )


def _set_metric(transition, metric, chain_states, rng):
    """Install a new metric and resample momenta (mici/adapters.py:511-514)."""
    system = transition.system.replace(metric=metric)
    transition = transition.replace(
        system=system,
        integrator=transition.integrator.replace(system=system),
    )
    n_chain = chain_states.pos.shape[0]
    keys = jax.random.split(rng, n_chain)
    new_states = jax.vmap(
        lambda s, k: s.replace(mom=system.sample_momentum(s, k)),
    )(chain_states, keys)
    return transition, new_states


class OnlineVarianceMetricAdapter(Adapter):
    """Diagonal metric adapter using Welford online variance estimates.

    Reference: mici/adapters.py:392-514 (Welford 1962; Chan et al. 1979
    parallel combination; Stan-style regularization).
    """

    is_fast = False

    def __init__(self, reg_iter_offset=5, reg_scale=1e-3):
        self.reg_iter_offset = reg_iter_offset
        self.reg_scale = reg_scale

    def initialize(self, chain_state, transition):
        adapt_state = {
            "iter": jnp.int32(0),
            "mean": jnp.zeros_like(chain_state.pos),
            "sum_diff_sq": jnp.zeros_like(chain_state.pos),
        }
        return adapt_state, {}

    def update(self, adapt_state, chain_state, trans_stats, params):
        # Welford (1962) incremental update (mici/adapters.py:444-460).
        it = adapt_state["iter"] + 1
        pos_minus_mean = chain_state.pos - adapt_state["mean"]
        mean = adapt_state["mean"] + pos_minus_mean / it
        sum_diff_sq = adapt_state["sum_diff_sq"] + pos_minus_mean * (
            chain_state.pos - mean
        )
        return {"iter": it, "mean": mean, "sum_diff_sq": sum_diff_sq}, params

    def _regularize(self, var_est, n_iter):
        # Reference: mici/adapters.py:462-471.
        if self.reg_iter_offset is not None and self.reg_iter_offset != 0:
            weight = n_iter / (self.reg_iter_offset + n_iter)
            var_est = var_est * weight + self.reg_scale * (1.0 - weight)
        return var_est

    def _combine(self, adapt_states):
        """Chan et al. (1979) combination over the chain axis.

        Reference: mici/adapters.py:486-505.
        """
        ns = adapt_states["iter"].astype(adapt_states["mean"].dtype)
        n_total = jnp.sum(ns)
        mean = jnp.sum(
            ns[:, None] * adapt_states["mean"], axis=0,
        ) / n_total
        var_sum = jnp.sum(adapt_states["sum_diff_sq"], axis=0) + jnp.sum(
            ns[:, None] * (adapt_states["mean"] - mean[None, :]) ** 2,
            axis=0,
        )
        return n_total, var_sum

    def finalize(self, adapt_states, chain_states, transition, rng):
        n_total, var_sum = self._combine(adapt_states)
        var_est = var_sum / (n_total - 1)
        var_est = self._regularize(var_est, n_total)
        metric = matrices.PositiveDiagonalMatrix(var_est).inv
        return _set_metric(transition, metric, chain_states, rng)


class OnlineCovarianceMetricAdapter(OnlineVarianceMetricAdapter):
    """Dense metric adapter using Welford online covariance estimates.

    Reference: mici/adapters.py:517-644 (Schubert & Gertz 2018 parallel
    combination).
    """

    is_fast = False

    def initialize(self, chain_state, transition):
        dim = chain_state.pos.shape[0]
        dtype = chain_state.pos.dtype
        adapt_state = {
            "iter": jnp.int32(0),
            "mean": jnp.zeros((dim,), dtype),
            "sum_diff_outer": jnp.zeros((dim, dim), dtype),
        }
        return adapt_state, {}

    def update(self, adapt_state, chain_state, trans_stats, params):
        # Reference: mici/adapters.py:574-590.
        it = adapt_state["iter"] + 1
        pos_minus_mean = chain_state.pos - adapt_state["mean"]
        mean = adapt_state["mean"] + pos_minus_mean / it
        sum_diff_outer = adapt_state["sum_diff_outer"] + jnp.outer(
            pos_minus_mean, chain_state.pos - mean,
        )
        return (
            {"iter": it, "mean": mean, "sum_diff_outer": sum_diff_outer},
            params,
        )

    def _regularize(self, covar_est, n_iter):
        # Reference: mici/adapters.py:592-601 (regularize towards scaled
        # identity).
        weight = n_iter / (self.reg_iter_offset + n_iter)
        covar_est = covar_est * weight
        diag_add = self.reg_scale * (1.0 - weight)
        return covar_est + diag_add * jnp.eye(
            covar_est.shape[0], dtype=covar_est.dtype,
        )

    def finalize(self, adapt_states, chain_states, transition, rng):
        ns = adapt_states["iter"].astype(adapt_states["mean"].dtype)
        n_total = jnp.sum(ns)
        mean = jnp.sum(
            ns[:, None] * adapt_states["mean"], axis=0,
        ) / n_total
        mean_diffs = adapt_states["mean"] - mean[None, :]
        covar_sum = jnp.sum(adapt_states["sum_diff_outer"], axis=0) + (
            jnp.einsum("c,ci,cj->ij", ns, mean_diffs, mean_diffs)
        )
        covar_est = covar_sum / (n_total - 1)
        covar_est = self._regularize(covar_est, n_total)
        metric = matrices.DensePositiveDefiniteMatrix(covar_est).inv
        return _set_metric(transition, metric, chain_states, rng)


class TreeDepthCapAdapter(Adapter):
    """Warm-up adapter tuning the NUTS depth-tail handling online.

    TPU-native addition (no reference counterpart — the reference's
    per-chain doubling loop, mici/transitions.py:708-770, pays only each
    chain's actual tree depth, so it never needs a cap).  Under vmapped
    lockstep execution the tree-depth *tail* is a first-order throughput
    knob: a NUTS iteration pays the batch-realized-max depth, so a few
    deep-tree chains tax the whole batch.  This adapter measures the
    kernel's natural U-turn depth during warm-up instead of requiring a
    hand-tuned sweep: it histograms the realized ``tree_depth``
    statistic per chain and, at stage finalization, re-tunes the
    transition from the ``quantile`` depth (+1 doubling, + ``margin``).
    Two modes:

    - ``mode="cap"`` (default): re-caps ``max_tree_depth`` at the tuned
      depth.  Maximum throughput; statistically safe when the depth
      distribution is narrow (measured sweeps in docs/BENCHMARKS.md show
      per-iteration ESS unchanged at the natural-depth cap on every
      BASELINE config), but on funnel-like geometry truncation costs
      per-iteration ESS.
    - ``mode="rebatch"``: leaves ``max_tree_depth`` unchanged and
      instead sets the transition's ``rebatch_depth`` (depth-tail
      re-batching boundary) at the tuned depth, so the bulk of chains
      run full-width to the natural depth and only the deep tail
      continues in narrow fixed-slot rounds — per-chain decisions stay
      bit-identical to plain execution (exact at any geometry; measured
      1.8-2.5x over plain uncapped lockstep on the funnel study,
      docs/BENCHMARKS.md round-3).  Requires ``loop_mode="fused"`` (the
      default).

    Because ``max_tree_depth`` / ``rebatch_depth`` are static
    (compiled-in) parameters, each re-tune triggers one recompilation of
    the following stage's program; with the default single warm-up stage
    that is one extra compile for the main stage.  With a multi-window
    stager the depth is recomputed at every window boundary from that
    window's histogram; since a window sampled under a *cap* cannot
    observe deeper trees, pass ``grow_back_max`` (normally the
    originally configured ``max_tree_depth``) to let a cap whose depth
    distribution is censored at it grow back one notch per window
    instead of locking in a noisy early guess (``mode="rebatch"`` never
    censors, so it needs no grow-back).
    """

    is_fast = True

    def __init__(self, quantile=0.98, margin=0, grow_back_max=None,
                 mode="cap"):
        if not 0.0 < quantile <= 1.0:
            msg = "quantile must be in (0, 1]."
            raise ValueError(msg)
        if margin < 0:
            msg = "margin must be non-negative."
            raise ValueError(msg)
        if mode not in ("cap", "rebatch"):
            msg = "mode must be 'cap' or 'rebatch'."
            raise ValueError(msg)
        if mode == "rebatch" and grow_back_max is not None:
            msg = ("grow_back_max only applies to mode='cap' "
                   "(re-batching never censors the depth histogram).")
            raise ValueError(msg)
        self.quantile = quantile
        self.margin = margin
        self.grow_back_max = grow_back_max
        self.mode = mode

    def initialize(self, chain_state, transition):
        max_depth = getattr(transition, "max_tree_depth", None)
        if max_depth is None:
            msg = (
                "TreeDepthCapAdapter requires a dynamic (NUTS) integration "
                "transition with a max_tree_depth parameter."
            )
            raise ValueError(msg)
        if (self.mode == "rebatch"
                and getattr(transition, "loop_mode", None) != "fused"):
            msg = (
                "TreeDepthCapAdapter(mode='rebatch') requires the "
                "transition's loop_mode='fused' (depth-tail re-batching "
                "is only implemented for the fused leaf loop)."
            )
            raise ValueError(msg)
        adapt_state = {
            # histogram of realized tree_depth statistics, 0..max_depth
            "depth_counts": jnp.zeros(max_depth + 1, jnp.int32),
        }
        return adapt_state, {}

    def update(self, adapt_state, chain_state, trans_stats, params):
        depth = jnp.clip(
            trans_stats["tree_depth"], 0,
            adapt_state["depth_counts"].shape[0] - 1,
        )
        return {
            "depth_counts": adapt_state["depth_counts"].at[depth].add(1),
        }, params

    def finalize(self, adapt_states, chain_states, transition, rng):
        import numpy as np

        counts = np.asarray(adapt_states["depth_counts"]).sum(axis=0)
        stage_max = counts.shape[0] - 1  # cap the stage was sampled under
        total = counts.sum()
        if total == 0:
            return transition, chain_states
        # Smallest depth d with P(tree_depth <= d) >= quantile: trees at
        # the natural U-turn depth reach tree_depth = d, so capping one
        # doubling above leaves the bulk of trajectories untruncated.
        cum = np.cumsum(counts) / total
        d_q = int(np.argmax(cum >= self.quantile))
        wanted = d_q + 1 + self.margin
        if self.mode == "rebatch":
            # Exact depth-tail handling: keep max_tree_depth (no
            # truncation) and set the re-batching boundary at the tuned
            # depth — the bulk of chains finish full-width by then and
            # only the deep tail continues in narrow fixed-slot rounds.
            # A boundary at/above max_tree_depth has no tail to split:
            # fall back to the plain path (rebatch_depth=None).
            boundary = wanted if wanted < transition.max_tree_depth else None
            if boundary == transition.rebatch_depth:
                return transition, chain_states
            return (
                transition.replace(rebatch_depth=boundary),
                chain_states,
            )
        if d_q >= stage_max and self.grow_back_max is not None:
            # The quantile depth sits in the cap bucket itself: trees
            # recorded at ``stage_max`` are exactly the (possibly)
            # truncated ones — a tree that U-turns naturally below the
            # cap records its natural depth, so quantile mass *at* the
            # cap is the only evidence of censoring.  Grow back one
            # notch (a capped window cannot observe deeper trees, so
            # growth must be incremental).  The test deliberately
            # excludes ``margin`` (user headroom, not truncation
            # evidence) and quantile depths *below* the cap (nothing
            # was truncated if no quantile mass reached the cap) —
            # either would oscillate the cap, and recompile the stage
            # program, every window.
            new_cap = min(self.grow_back_max, stage_max + 1)
        else:
            new_cap = min(stage_max, wanted)
        if new_cap == transition.max_tree_depth:
            return transition, chain_states
        return transition.replace(max_tree_depth=new_cap), chain_states


def check_init_step_size(step_size):
    """Raise AdaptationError if the initial step size search failed."""
    import numpy as np

    if np.any(np.isnan(np.asarray(step_size))):
        msg = (
            "Could not find reasonable initial step size in maximum number "
            "of iterations (or Hamiltonian evaluated to NaN at an initial "
            "state). A very large final step size may indicate that the "
            "target distribution is improper such that the negative log "
            "density is flat in one or more directions while a very small "
            "final step size may indicate that the density function is "
            "insufficiently smooth at the point initialized at."
        )
        raise AdaptationError(msg)
