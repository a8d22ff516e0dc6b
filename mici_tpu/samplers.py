"""Monte Carlo sampler classes for peforming inference.

Reference: mici/samplers.py (1791 LoC).  The execution model is inverted
relative to the reference (see SURVEY.md §7):

* The reference's per-chain Python loop (``_sample_chain``,
  mici/samplers.py:370-526) becomes a compiled ``lax.scan`` whose body runs
  every transition and adapter update for one iteration; chains are batched
  with ``vmap`` (one TPU chip) and, optionally, sharded over a device mesh
  (see :mod:`mici_tpu.parallel`) — replacing the reference's process pools
  and queues (mici/samplers.py:668-772).
* Long runs are executed in *chunks*: each chunk is one device program and
  its traces/statistics are streamed to preallocated host buffers
  (optionally ``numpy.memmap`` files, mirroring mici/samplers.py:87-367) so
  device memory stays bounded — the TPU equivalent of the reference's
  memory-mapped trace storage.
* Cross-chain adapter finalization (mici/samplers.py:651-665) is a
  reduction over the chain axis executed between stages.
* Per-chain RNG streams come from ``jax.random.split`` of a base key
  (replacing ``Generator.jumped`` / ``SeedSequence.spawn``,
  mici/samplers.py:546-565).
"""

from __future__ import annotations

import functools
import logging
import math
import time
import warnings
from pathlib import Path


import jax
import jax.numpy as jnp
import numpy as np

#: Module logger (reference: mici/samplers.py:84).
logger = logging.getLogger(__name__)

from mici_tpu.adapters import DualAveragingStepSizeAdapter
from mici_tpu.errors import AdaptationError
from mici_tpu.progressbars import (
    DummyProgressBar,
    LabelledSequenceProgressBar,
    SequenceProgressBar,
)
from mici_tpu import checkpoint as checkpoint_mod
from mici_tpu import precision, sketches
from mici_tpu.stagers import WarmUpStager, WindowedWarmUpStager
from mici_tpu.states import ChainState
from mici_tpu.transitions import (
    IndependentMomentumTransition,
    MetropolisRandomIntegrationTransition,
    MetropolisStaticIntegrationTransition,
    MultinomialDynamicIntegrationTransition,
    SliceDynamicIntegrationTransition,
    euclidean_no_u_turn_criterion,
    riemannian_no_u_turn_criterion,
)


def _as_key(rng):
    """Coerce seed / numpy Generator / JAX key to a JAX PRNG key."""
    if isinstance(rng, (int, np.integer)):
        return jax.random.PRNGKey(int(rng))
    if isinstance(rng, np.random.Generator):
        return jax.random.PRNGKey(int(rng.integers(2**31 - 1)))
    return rng


def _stack_states(states):
    """Stack per-chain states along a new leading chain axis.

    Host-resident (numpy) leaves are stacked with numpy so the whole
    chain batch reaches the device as one transfer at the next jit
    boundary; leaves already on device (or traced) use ``jnp.stack``.
    """

    def stack(*xs):
        if any(isinstance(x, jax.Array) for x in xs):
            return jnp.stack(xs)
        return np.stack(xs)

    return jax.tree_util.tree_map(stack, *states)


def _index_states(batched, index):
    return jax.tree_util.tree_map(lambda x: x[index], batched)


def _unstack_states(batched, n_chain):
    return [_index_states(batched, i) for i in range(n_chain)]


class SystemTraceFunc:
    """Marker wrapping a trace function that depends on the system.

    A plain trace function must be a pure function of the chain state: if it
    closes over a system object the adapter-tuned metric would be baked into
    the compiled stage as a stale constant.  Wrapping the function in this
    class makes the sampler call it as ``func(state, system)`` with the
    *current* system routed through the traced argument path.
    """

    def __init__(self, func):
        self.func = func

    def __call__(self, state, system):
        return self.func(state, system)


#: Default traced variables (reference: mici/samplers.py:1263-1269).
default_hamiltonian_trace_func = SystemTraceFunc(
    lambda state, system: {"pos": state.pos, "hamiltonian": system.h(state)},
)


def _init_trace_summary(example, n_chain, quantiles=(), ess_batch=0):
    """Host-side zero state for per-chain running trace summaries.

    One Welford accumulator (count/mean/M2) plus running min/max per
    trace key and chain — and, when ``quantiles`` is non-empty, a P²
    streaming quantile sketch per (chain, trace element, quantile) —
    uploaded to device once and threaded through the compiled stage
    chunks (ROADMAP: on-device running-moment trace summaries — the
    complement of ``trace_thin`` for runs where even thinned traces
    exceed host budgets).  With ``ess_batch > 0`` the state additionally
    carries streaming batch-means accumulators (current-batch sum +
    Welford over completed batch means) for on-device effective sample
    size estimation with zero trace storage.
    """
    summary = {}
    for key, val in example.items():
        val = np.asarray(val)
        fdtype = (val.dtype if np.issubdtype(val.dtype, np.floating)
                  else np.float32)
        shape = (n_chain, *val.shape)
        summary[key] = {
            "count": np.zeros(n_chain, np.int32),
            "mean": np.zeros(shape, fdtype),
            "m2": np.zeros(shape, fdtype),
            "min": np.full(shape, np.inf, fdtype),
            "max": np.full(shape, -np.inf, fdtype),
        }
        if quantiles:
            summary[key]["p2"] = sketches.p2_init(shape, quantiles, fdtype)
        if ess_batch:
            summary[key]["bm_sum"] = np.zeros(shape, fdtype)
            summary[key]["bm_count"] = np.zeros(n_chain, np.int32)
            summary[key]["bm_mean"] = np.zeros(shape, fdtype)
            summary[key]["bm_m2"] = np.zeros(shape, fdtype)
    return summary


def _update_trace_summary(summary, traces, quantiles=(), ess_batch=0):
    """One Welford + extrema (+ P² sketch, + batch-means) step per trace
    key (inside the scan body)."""
    new = {}
    for key, s in summary.items():
        x = traces[key].astype(s["mean"].dtype)
        cnt = s["count"] + 1
        delta = x - s["mean"]
        mean = s["mean"] + delta / cnt.astype(s["mean"].dtype)
        new[key] = {
            "count": cnt,
            "mean": mean,
            "m2": s["m2"] + delta * (x - mean),
            "min": jnp.minimum(s["min"], x),
            "max": jnp.maximum(s["max"], x),
        }
        if quantiles:
            new[key]["p2"] = sketches.p2_update(s["p2"], x, quantiles)
        if ess_batch:
            # Streaming batch means: accumulate the current length-M
            # batch; at each batch boundary fold its mean into a second
            # Welford accumulator and reset.  Branch-free (the boundary
            # predicate is a per-chain scalar select).
            fdtype = s["mean"].dtype
            bm_sum = s["bm_sum"] + x
            boundary = (cnt % ess_batch) == 0
            bmean = bm_sum / jnp.asarray(ess_batch, fdtype)
            bcnt = s["bm_count"] + boundary.astype(s["bm_count"].dtype)
            bdelta = bmean - s["bm_mean"]
            bmean_new = s["bm_mean"] + bdelta / jnp.maximum(
                bcnt, 1).astype(fdtype)
            bm2_new = s["bm_m2"] + bdelta * (bmean - bmean_new)
            new[key]["bm_sum"] = jnp.where(
                boundary, jnp.zeros_like(bm_sum), bm_sum)
            new[key]["bm_count"] = bcnt
            new[key]["bm_mean"] = jnp.where(
                boundary, bmean_new, s["bm_mean"])
            new[key]["bm_m2"] = jnp.where(boundary, bm2_new, s["bm_m2"])
    return new


def _finalize_trace_summary(summary, quantiles=(), ess_batch=0):
    """Fetch and convert device summary state to {mean, var, min, max,
    count[, quantiles][, ess]} numpy dicts (variance NaN where fewer
    than 2 samples; quantile estimates are P² approximations; ESS is
    the batch-means estimator ``n_used / (M var_bm / var_x)``, NaN
    where fewer than 2 completed batches)."""
    summary = jax.device_get(summary)
    out = {}
    for key, s in summary.items():
        count = s["count"]
        cnt = count.reshape(count.shape + (1,) * (s["mean"].ndim - 1))
        with np.errstate(divide="ignore", invalid="ignore"):
            var = np.where(cnt > 1, s["m2"] / np.maximum(cnt - 1, 1),
                           np.nan)
        out[key] = {
            "count": count,
            "mean": s["mean"],
            "var": var,
            "min": s["min"],
            "max": s["max"],
        }
        if quantiles:
            out[key]["quantile_levels"] = np.asarray(quantiles)
            out[key]["quantiles"] = sketches.p2_estimate(
                s["p2"], quantiles,
            )
        if ess_batch:
            n_b = s["bm_count"]
            nb = n_b.reshape(n_b.shape + (1,) * (s["bm_m2"].ndim - 1))
            with np.errstate(divide="ignore", invalid="ignore"):
                var_bm = np.where(
                    nb > 1, s["bm_m2"] / np.maximum(nb - 1, 1), np.nan,
                )
                # Integrated autocorrelation time ~ M var_bm / var_x;
                # ESS over the iterations covered by completed batches.
                tau = ess_batch * var_bm / var
                ess = np.where(
                    (nb > 1) & (var > 0) & (tau > 0),
                    (nb * ess_batch) / tau, np.nan,
                )
            out[key]["ess"] = ess
            out[key]["ess_batch_len"] = ess_batch
    return out


def _engine_precision(fn):
    """Trace a compiled-engine body under the matmul-precision policy.

    Applied *inside* ``jax.jit`` so every ``dot_general`` traced by the
    engine gets :func:`mici_tpu.precision.get_matmul_precision` (TPU
    correctness requirement — see mici_tpu/precision.py).
    """
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with precision.matmul_precision_scope():
            return fn(*args, **kwargs)
    return wrapper


@jax.jit
@_engine_precision
def _prepare_states_batch(system, states):
    """Populate aux entries for a whole chain batch in one program."""
    return jax.vmap(system.prepare_state)(states)


@jax.jit
@_engine_precision
def _sample_momenta_batch(system, states, keys):
    """Sample momenta for a whole chain batch in one program."""
    return jax.vmap(system.sample_momentum)(states, keys)


def _propagate_system(transitions, system):
    """Rebuild all transitions around an updated (shared) system pytree."""
    new = {}
    for key, transition in transitions.items():
        updates = {"system": system}
        if hasattr(transition, "integrator"):
            updates["integrator"] = transition.integrator.replace(
                system=system,
            )
        new[key] = transition.replace(**updates)
    return new


# ---------------------------------------------------------------------------
# Compiled stage engine
# ---------------------------------------------------------------------------


#: Minimum auto-picked group chunk length: below this the per-chunk host
#: round trips and remainder-length compiles outweigh the reuse benefit
#: (ADVICE round-3: n_warm_up_iter=60 gives fast stages {9, 6} -> chunk 6).
_MIN_AUTO_CHUNK = 8

#: Auto-chunking bound on the per-chunk device trace/statistic buffer.
#: A whole-stage chunk holds its full trace block on device (n_chain x
#: n_iter x trace width) and transfers it to host in one drain; capping
#: the block keeps device memory bounded for long full-trace runs (a
#: 4096-chain dim-100 f32 run is ~1.6 MB/iteration — a 1200-iteration
#: whole-stage chunk would hold ~2 GB of HBM) and lets the driver's
#: double-buffered drain overlap device->host transfer with the next
#: chunk's compute instead of serializing one giant copy after all
#: compute.  Measured on-chip A/B at the config-1 bench shape
#: (4096 chains, 8-dim traces + stats, same window): 256 MB -> 35.1 s,
#: 64 MB -> 24.5 s, 32 MB -> 30.4 s — 64 MB balances overlap
#: granularity against per-chunk dispatch/fetch round trips.
_MAX_CHUNK_BUFFER_BYTES = 64 * 1024 * 1024


#: First-chunk length (in iterations) for time-capped chunking: the
#: probe must be long enough to average out per-dispatch overhead but
#: short enough that even a pathologically slow model's first execution
#: stays far below any per-execution deadline.
_ADAPT_PROBE_ITERS = 2


class _ChunkTimeAdapter:
    """Measured-time chunk-length controller (``max_chunk_seconds``).

    A chunk is ONE device execution.  Two situations need executions
    bounded in *time*, which static chunk lengths cannot guarantee:

    * execution deadlines — the shared dev TPU worker behind this repo's
      bench kills long device executions (measured round 5: a plain
      matmul scan executing ~20 s survives; the same scan sized to
      ~150 s crashes the worker process with "TPU worker process
      crashed or restarted", no mici_tpu code involved) — and
    * very slow per-iteration models, where a whole-stage chunk would
      also hold progress reporting, checkpointing and interrupts hostage
      for the full stage.

    Strategy (ROADMAP round-5 #4): start from a tiny probe chunk;
    measure each chunk's wall from dispatch to a host-fetch sync,
    subtracting the backend-compile seconds recorded in the same window
    (first executions pay tens of seconds of one-off XLA compile that
    say nothing about steady-state execution); keep a slow-biased
    per-iteration estimate; size the next chunk to fit the target.
    Lengths are quantized to ``probe * 2^k`` so distinct compiled
    programs stay bounded by ``log2(base / probe)``.  Chunked scans are
    bit-exact under any length split, so adaptation never changes
    results; while active the driver syncs on every chunk (no
    double-buffered drain overlap) — the price of bounded executions.
    """

    def __init__(self, target_seconds, base, thin=1, start_at_base=False):
        self.target = float(target_seconds)
        self.base = max(1, int(base))
        thin = max(1, int(thin))
        probe = max(_ADAPT_PROBE_ITERS, thin)
        probe = (probe // thin) * thin
        self.probe = min(probe, self.base)
        # Guard mode (an explicit chunk_size combined with
        # max_chunk_seconds): the caller's static length is trusted as
        # the starting point and only *shrunk* on measured evidence —
        # no probe chunk, so the adapted-length compile ladder is only
        # paid when the backend actually degrades.
        self.start_at_base = bool(start_at_base)
        self.per_iter = None
        self._t0 = None
        self._compile_idx = None

    def first_chunk(self):
        return self.base if self.start_at_base else self.probe

    def begin(self):
        """Call immediately before dispatching a chunk."""
        from mici_tpu import profiling

        self._compile_idx = profiling.compile_events_snapshot()
        self._t0 = time.perf_counter()

    def observe(self, n_iter, outputs):
        """Sync on ``outputs``, record the chunk's wall, return next length.

        The sync is a small host fetch of one output leaf (a plain
        ``block_until_ready`` can return early through remote-backend
        tunnels); all outputs of one execution materialize together, so
        fetching any leaf bounds the whole chunk.
        """
        from mici_tpu import profiling

        leaves = jax.tree_util.tree_leaves(outputs)
        if leaves:
            np.asarray(leaves[0])
        wall = time.perf_counter() - self._t0
        wall -= profiling.compile_seconds_since(self._compile_idx)
        return self._update(n_iter, wall)

    def _update(self, n_iter, wall_seconds):
        rate = max(wall_seconds, 1e-6) / max(1, int(n_iter))
        if self.per_iter is None:
            self.per_iter = rate
        else:
            # Slow-biased: a slowdown (shared-chip window change) takes
            # effect immediately; old highs decay over a few chunks so a
            # transient slow window does not pin chunks tiny forever.
            self.per_iter = max(rate, 0.5 * self.per_iter)
        return self.next_chunk()

    def next_chunk(self):
        if self.per_iter is None:
            return self.first_chunk()
        fit = int(self.target / self.per_iter)
        if fit >= self.base:
            return self.base
        if fit <= self.probe:
            return self.probe
        quantized = self.probe
        while quantized * 2 <= fit:
            quantized *= 2
        return min(quantized, self.base)


def _auto_stage_chunks(sampling_stages, trace_thin=1):
    """Pick per-stage chunk lengths that maximize compiled-program reuse.

    ``_run_stage_chunk`` specializes on the static chunk length
    (``n_iter``), so a windowed warm up (Stan-style stage lengths
    25/50/100/200/... , mici/stagers.py:237-255) would otherwise compile
    one stage program per window even though every slow window shares the
    same transitions, adapters and trace functions — at real-hardware
    compile times that multiplies warm-up latency by the window count.

    Stages are grouped by their compile signature (the adapter and
    trace-function statics); within a group holding more than one
    distinct length, every stage runs in chunks of the group gcd (or of
    the shortest stage length when the gcd is degenerate, leaving at most
    one short remainder chunk per stage), collapsing the group to one or
    two compiled programs.  Chunking a scan is bit-exact: the chunked
    chunks thread the identical carry through the identical iteration
    body.  Single-stage groups (e.g. the main stage) keep whole-stage
    chunks, adding no host round trips on the hot path.

    With ``trace_thin > 1`` the driver later aligns chunks down to
    thin-block multiples, so the group chunk is picked from the
    thin-aligned stage lengths (their gcd is itself a thin multiple) —
    otherwise the alignment would re-fragment the group into several
    compiled lengths.  Groups whose best chunk falls below
    ``_MIN_AUTO_CHUNK`` are left unchunked (whole-stage programs): tiny
    chunks add host round trips for little reuse.

    Returns a dict mapping stage label to its chunk length; stages absent
    from the dict run as a single chunk.
    """
    groups = {}
    for label, stage in sampling_stages.items():
        adapters_key = tuple(
            (k, tuple(v)) for k, v in (stage.adapters or {}).items() if v
        )
        trace_key = (
            None if stage.trace_funcs is None else tuple(stage.trace_funcs)
        )
        try:
            groups.setdefault(
                (adapters_key, trace_key, bool(stage.record_stats)), [],
            ).append((label, stage.n_iter))
        except TypeError:  # unhashable user adapter/trace func: no grouping
            return {}
    chunks = {}
    for members in groups.values():
        lengths = sorted({n for _, n in members if n > 0})
        if trace_thin > 1:
            # Chunks will be aligned down to thin-block multiples by the
            # driver; picking from the aligned lengths keeps the aligned
            # chunk uniform across the group (a gcd of thin multiples is
            # a thin multiple).
            lengths = sorted({
                (n // trace_thin) * trace_thin
                for n in lengths if n >= trace_thin
            })
        if len(lengths) < 2:
            continue
        divisor = math.gcd(*lengths)
        shortest = lengths[0]
        # Use the gcd when it keeps dispatch count within ~4x of chunking
        # by the shortest stage; otherwise chunk by the shortest stage and
        # let the existing remainder handling compile the (few, short)
        # leftover chunk lengths.
        chunk = (
            divisor if divisor >= 4 and 4 * divisor >= shortest else shortest
        )
        if chunk < _MIN_AUTO_CHUNK:
            continue
        for label, _ in members:
            chunks[label] = chunk
    return chunks


@functools.partial(
    jax.jit,
    static_argnames=(
        "trans_keys", "adapters", "trace_funcs", "n_iter", "trace_thin",
        "summarize", "summary_quantiles", "summary_ess",
    ),
)
@_engine_precision
def _run_stage_chunk(transitions, states, keys, params, adapt_states,
                     summary=None, *, trans_keys, adapters, trace_funcs,
                     n_iter, trace_thin=1, summarize=False,
                     summary_quantiles=(), summary_ess=0):
    """Run ``n_iter`` iterations for all chains (vmapped scan).

    The compiled replacement for the reference's per-chain iteration loop
    (mici/samplers.py:457-513): each iteration samples every transition in
    order, applies the active adapters, and emits trace values and
    transition statistics.

    The loop structure is a *scan of batched bodies* (not a vmap of
    per-chain scans): each scan iteration advances the whole chain batch
    through every transition via ``transition.sample_batch`` — a vmap of
    ``sample`` by default, but overridable with batch-level execution
    strategies such as the dynamic transitions' depth-tail re-batching
    (which gathers unfinished chains into a fixed-slot batch and cannot
    be expressed inside a per-chain vmap).  Adapter updates and trace
    functions run per chain under ``vmap`` inside the same body, so for
    default transitions the compiled program is identical to the former
    vmap-of-scan formulation (bit-identical outputs).

    Args:
        transitions: Dict of transition pytrees (broadcast over chains).
        states: Chain states batched on leading axis.
        keys: Per-chain PRNG keys, shape (n_chain,).
        params: Per-chain adapter-controlled parameter overrides, a dict
            ``{trans_key: {"step_size": array}}`` batched over chains.
        adapt_states: Per-chain adapter states
            ``{trans_key: (state, ...)}`` batched over chains.
        trans_keys: Static tuple of transition keys (dict order).
        adapters: Static dict-as-tuple ``((trans_key, (adapter, ...)), ...)``.
        trace_funcs: Static tuple of trace functions or None.
        n_iter: Static chunk length.
        summary: Per-chain running trace-summary state (or None).
        summarize: False | True | "only" — accumulate running summaries
            of the trace values on device; ``"only"`` additionally drops
            the per-iteration trace outputs (no host trace storage).
    """
    adapters_dict = dict(adapters)
    system = None
    for transition in transitions.values():
        if hasattr(transition, "system"):
            system = transition.system
            break

    def body(carry, _):
        states, keys, params, adapt_states, summary = carry
        all_stats = {}
        for trans_key in trans_keys:
            # Per-chain key streams: row 0 is the carried key, row 1 the
            # subkey — the batched form of ``key, subkey = split(key)``.
            splits = jax.vmap(jax.random.split)(keys)
            keys, subkeys = splits[:, 0], splits[:, 1]
            transition = transitions[trans_key]
            t_params = params.get(trans_key, {})
            states, stats = transition.sample_batch(
                states, subkeys, t_params,
            )
            if trans_key in adapters_dict:
                new_adapt_states = []
                for i, adapter in enumerate(adapters_dict[trans_key]):
                    a_state, t_params = jax.vmap(adapter.update)(
                        adapt_states[trans_key][i], states, stats,
                        t_params,
                    )
                    new_adapt_states.append(a_state)
                adapt_states = {
                    **adapt_states,
                    trans_key: tuple(new_adapt_states),
                }
                params = {**params, trans_key: t_params}
            if stats is not None:
                all_stats[trans_key] = stats

        if trace_funcs is not None:
            def chain_traces(state):
                traces = {}
                for trace_func in trace_funcs:
                    if isinstance(trace_func, SystemTraceFunc):
                        traces.update(trace_func(state, system))
                    else:
                        traces.update(trace_func(state))
                return traces

            traces = jax.vmap(chain_traces)(states)
        else:
            traces = {}
        if summarize:
            summary = jax.vmap(
                lambda s, t: _update_trace_summary(
                    s, t, summary_quantiles, summary_ess,
                ),
            )(summary, traces)
        out_traces = {} if summarize == "only" else traces
        return (states, keys, params, adapt_states, summary), (
            out_traces, all_stats)

    (states, keys, params, adapt_states, summary), (
        traces, stats) = jax.lax.scan(
        body, (states, keys, params, adapt_states, summary),
        None, length=n_iter,
    )
    if trace_thin > 1:
        # Record the last iteration of each thin-block: slicing on
        # device cuts device->host trace transfer volume by the thin
        # factor (ROADMAP trace-compression; statistics stay full).
        traces = jax.tree_util.tree_map(
            lambda a: a[trace_thin - 1::trace_thin], traces,
        )
    # Scan stacks outputs iteration-major; host buffers are chain-major.
    traces = jax.tree_util.tree_map(
        lambda a: jnp.moveaxis(a, 0, 1), traces,
    )
    stats = jax.tree_util.tree_map(
        lambda a: jnp.moveaxis(a, 0, 1), stats,
    )
    return states, keys, params, adapt_states, traces, stats, summary


@functools.partial(jax.jit, static_argnames=("trans_keys", "adapters"))
@_engine_precision
def _init_adapters(transitions, states, *, trans_keys, adapters):
    """Initialize adapter states and params per chain (vmapped).

    Reference: mici/samplers.py:463-469 (adapter.initialize per stage).
    """
    adapters_dict = dict(adapters)

    def chain_fn(state):
        adapt_states = {}
        params = {}
        for trans_key in trans_keys:
            if trans_key not in adapters_dict:
                params[trans_key] = {}
                continue
            t_params = {}
            t_states = []
            for adapter in adapters_dict[trans_key]:
                a_state, a_params = adapter.initialize(
                    state, transitions[trans_key],
                )
                t_states.append(a_state)
                t_params.update(a_params)
            adapt_states[trans_key] = tuple(t_states)
            params[trans_key] = t_params
        return adapt_states, params

    return jax.vmap(chain_fn)(states)


class _SampleChainsOutputs(tuple):
    """Named 3-tuple of sampling outputs plus a ``trace_summaries``
    attribute.

    Unpacking stays reference-compatible (exactly three elements:
    ``final_states, traces, statistics = outputs``); the optional
    running-summary results of ``sample_chains(trace_summary=...)`` ride
    along as a plain attribute so they cannot break positional callers.
    """

    _fields = ("final_states", "traces", "statistics")

    def __new__(cls, final_states, traces, statistics,
                trace_summaries=None):
        obj = super().__new__(cls, (final_states, traces, statistics))
        obj.trace_summaries = trace_summaries
        return obj

    @property
    def final_states(self):
        return self[0]

    @property
    def traces(self):
        return self[1]

    @property
    def statistics(self):
        return self[2]

    def __repr__(self):
        return (
            f"{type(self).__name__}(final_states=..., traces=..., "
            f"statistics=..., trace_summaries="
            f"{'...' if self.trace_summaries is not None else None})"
        )


class MCMCSampleChainsOutputs(_SampleChainsOutputs):
    """Outputs of a MarkovChainMonteCarloMethod.sample_chains call.

    Reference: mici/samplers.py:808-836.
    """


class HMCSampleChainsOutputs(_SampleChainsOutputs):
    """Outputs of a HamiltonianMonteCarlo.sample_chains call.

    Reference: mici/samplers.py:1151-1177.
    """

    def to_arviz_dict(self, energy_key="hamiltonian", lp_key="lp"):
        """Export as ``{"posterior": ..., "sample_stats": ...}`` arrays.

        Dependency-free ArviZ ``from_dict`` layout — see
        :func:`mici_tpu.interop.convert_to_arviz_dict`.
        """
        from mici_tpu.interop import convert_to_arviz_dict

        return convert_to_arviz_dict(
            self.traces, self.statistics, energy_key, lp_key,
        )


def _np_dtype_ok(dtype):
    try:
        np.dtype(dtype)
    except TypeError:
        return False
    return True


def _open_new_memmap(file_path, shape, default_value, dtype):
    """Open a new memory-mapped array, fill with value and return.

    Reference: mici/samplers.py:116-138.
    """
    if isinstance(shape, int):
        shape = (shape,)
    memmap = np.lib.format.open_memmap(
        file_path, dtype=dtype, mode="w+", shape=shape,
    )
    memmap[...] = default_value
    return memmap


def _open_existing_memmap(file_path, shape, dtype):
    """Reopen a memmap written by a checkpointed run (resume path)."""
    if isinstance(shape, int):
        shape = (shape,)
    if not Path(file_path).exists():
        msg = (f"Resume: expected memmap file {file_path} from the "
               f"checkpointed run, but it does not exist.")
        raise checkpoint_mod.CheckpointError(msg)
    memmap = np.lib.format.open_memmap(file_path, mode="r+")
    if tuple(memmap.shape) != tuple(shape) or memmap.dtype != np.dtype(
            dtype):
        msg = (f"Resume: memmap file {file_path} has shape "
               f"{tuple(memmap.shape)} / dtype {memmap.dtype}, but the "
               f"resumed configuration expects {tuple(shape)} / "
               f"{np.dtype(dtype)}.")
        raise checkpoint_mod.CheckpointError(msg)
    return memmap


def _adapter_state_templates(transitions, states, *, trans_keys,
                             stage_adapters):
    """Abstract (shape/dtype) templates of a stage's adapter state/params.

    Used on resume to pour checkpointed leaf arrays back into the exact
    pytree structure ``_init_adapters`` would have produced, without
    running the (potentially expensive) initializers.
    """
    return jax.eval_shape(
        functools.partial(
            _init_adapters, trans_keys=trans_keys, adapters=stage_adapters,
        ),
        transitions, states,
    )


class MarkovChainMonteCarloMethod:
    """Generic Markov chain Monte Carlo (MCMC) sampler.

    Generates Markov chains from initial states by iteratively applying a
    sequence of Markov transition operators, with all chains executing as a
    single compiled, vectorized program per sampling stage.

    Reference: mici/samplers.py:838-1148.
    """

    def __init__(self, rng, transitions):
        """
        Args:
            rng: JAX PRNG key, integer seed, or numpy Generator (used to
                derive a key).
            transitions: Ordered dict of Markov transition kernels to
                sequentially sample from on each chain iteration.
        """
        self._rng = _as_key(rng)
        self._transitions = dict(transitions)

    @property
    def transitions(self):
        return self._transitions

    @property
    def rng(self):
        return self._rng

    def _next_key(self):
        self._rng, key = jax.random.split(self._rng)
        return key

    def sample_chains(self, n_warm_up_iter, n_main_iter, init_states, *,
                      trace_funcs=None, adapters=None, stager=None,
                      trace_warm_up=False, force_memmap=False,
                      memmap_path=None, monitor_stats=None,
                      display_progress=True, progress_bar_class=None,
                      chunk_size=None, max_chunk_seconds=None,
                      mesh=None, trace_thin=1,
                      trace_summary=False, trace_summary_quantiles=None,
                      trace_summary_ess=None,
                      checkpoint=False, resume_from=None,
                      n_worker=1, n_process=None,
                      use_thread_pool=False, max_threads_per_worker=None):
        """Sample Markov chains with optional adaptive warm up.

        Mirrors mici/samplers.py:875-1148.  ``n_worker`` / ``n_process`` /
        ``use_thread_pool`` / ``max_threads_per_worker`` are accepted for
        API parity but have no effect: chains are always executed as one
        vectorized device program (use :mod:`mici_tpu.parallel` utilities to
        shard the chain axis over a multi-chip mesh).

        Args:
            n_warm_up_iter: Number of adaptive warm up iterations per chain.
            n_main_iter: Number of main sampling iterations per chain.
            init_states: Iterable of initial chain states (ChainState or
                position arrays).
            trace_funcs: Sequence of jax-traceable functions of the state
                returning dicts of arrays to record each iteration.
            adapters: Dict of lists of adapters keyed by transition key.
            stager: Stager controlling warm-up stage splits.
            trace_warm_up: Whether to record traces/stats during warm up.
            force_memmap: Store traces/stats in numpy memmap files.
            memmap_path: Directory for memmap files.
            monitor_stats: Dict of lists of statistic keys (keyed by
                transition key) to monitor on the progress bar.
            display_progress: Whether to display progress bars.
            progress_bar_class: Class for per-stage progress bar.
            chunk_size: Number of iterations per compiled chunk; bounds
                device memory for traces.  None picks chunk lengths
                automatically so that warm-up stages sharing the same
                transitions/adapters/trace functions reuse one compiled
                program (windowed warm up would otherwise compile one
                stage program per window length); stages with a unique
                compile signature (e.g. the main stage) run as a single
                chunk.
            max_chunk_seconds: Optional wall-time target (seconds) per
                chunk *execution*.  When set, chunk lengths are adapted
                from measured per-iteration time (starting from a tiny
                probe chunk, compile time excluded) so no single device
                execution greatly exceeds the target — for backends
                with per-execution deadlines and for very slow models
                where a whole-stage execution would hold checkpoints,
                progress and interrupts hostage.  Only ever *shortens*
                chunks relative to ``chunk_size`` / the automatic
                choice; results are bit-identical under any chunking.
                While active, chunk draining is synchronous (no
                double-buffer overlap).
            mesh: Optional ``jax.sharding.Mesh`` with a ``chains`` axis
                (see :func:`mici_tpu.parallel.make_chain_mesh`).  When
                given, the chain axis of all chain state is sharded over
                the mesh so the compiled stage programs execute
                data-parallel over the devices, with cross-chain adapter
                reductions lowered to XLA collectives over ICI.  The
                number of chains must be divisible by the mesh size.
            trace_thin: Record traces every ``trace_thin``-th iteration
                (the last of each block), reducing device-to-host trace
                transfer and storage by that factor for very long runs.
                Statistics are always recorded per iteration.  1 (default)
                records every iteration.
            trace_summary: Accumulate per-chain running summaries of all
                trace values on device (count, mean, variance, min, max
                per trace key — Welford accumulators threaded through the
                compiled stage programs, one host fetch at the end).
                Summaries always see *every* recorded iteration even when
                per-iteration traces are thinned.  ``True`` returns them
                in the ``trace_summaries`` output field alongside the
                traces; ``"only"`` additionally drops per-iteration trace
                storage entirely (for runs where even thinned traces
                exceed host budgets); ``False`` (default) disables.
            trace_summary_quantiles: Optional sequence of quantile levels
                in (0, 1).  When given, the summaries additionally carry
                streaming P² quantile-sketch estimates (Jain & Chlamtac
                1985) per chain and trace element under ``"quantiles"``
                (with ``"quantile_levels"``); implies
                ``trace_summary=True`` when it was left as False.
            trace_summary_ess: Optional batch length ``M >= 2`` (or
                ``True`` for the default 64).  When given, the on-device
                summaries additionally carry a streaming batch-means
                effective-sample-size estimate per chain and trace
                element under ``"ess"`` (integrated autocorrelation time
                estimated as ``M var(batch means) / var(x)`` over
                completed batches): ESS measurement with zero trace
                storage or device->host trace streaming — combine with
                ``trace_summary="only"`` for massive runs.  Choose
                ``M`` well above the kernel's autocorrelation time (the
                estimator is biased low when batches are shorter than
                the correlation length).  Implies ``trace_summary=True``
                when it was left as False.
            checkpoint: Write a resumable checkpoint after every drained
                chunk (and at stage boundaries) under
                ``<memmap_path>/checkpoint/``.  Requires ``memmap_path``
                (trace/statistic storage must be on disk); implies
                ``force_memmap=True``.  A killed run can then be
                continued with ``resume_from=memmap_path``, reproducing
                the uninterrupted run's traces bit-for-bit.  Beyond the
                reference, whose only resumption path is re-passing the
                ``final_states`` of a *completed* call
                (mici/samplers.py:808-815); see :mod:`mici_tpu.checkpoint`.
            resume_from: Path to the ``memmap_path`` of an earlier
                checkpointed run to resume.  The call must use the same
                sampler configuration (chains, iterations, stages,
                adapters, trace functions) as the original; completed
                warm-up finalizations are replayed from the checkpoint
                records, the stage-loop carry (chain states, PRNG keys,
                adapter states, transition parameters, trace summaries)
                is restored from the last checkpoint, and sampling
                continues — at most one chunk of work is repeated.
                Implies ``checkpoint=True`` with the same path.

        Returns:
            MCMCSampleChainsOutputs(final_states, traces, statistics).
        """
        trace_thin = int(trace_thin)
        if trace_thin < 1:
            msg = "trace_thin must be a positive integer."
            raise ValueError(msg)
        ignored = [
            name for name, value, default in (
                ("n_worker", n_worker, (1, None)),
                ("n_process", n_process, (1, None)),
                ("use_thread_pool", use_thread_pool, (False, None)),
                ("max_threads_per_worker", max_threads_per_worker, (None,)),
            ) if value not in default
        ]
        if ignored:
            warnings.warn(
                f"Ignoring {', '.join(ignored)}: chains always execute as "
                "a single vectorized device program (the TPU-native "
                "replacement for the reference's worker pools). To scale "
                "across devices pass mesh= (see mici_tpu.parallel).",
                UserWarning,
                stacklevel=2,
            )

        if not display_progress:
            progress_bar_class = DummyProgressBar
            stage_bar_class = DummyProgressBar
        else:
            stage_bar_class = LabelledSequenceProgressBar
            if progress_bar_class is None:
                progress_bar_class = SequenceProgressBar

        # Coerce, stack, then prepare all chains in ONE vmapped program:
        # preparing each chain eagerly in a Python loop costs one device
        # dispatch per chain (seconds at 1024+ chains on remote backends).
        init_states = [self._coerce_init_state(s) for s in init_states]
        n_chain = len(init_states)
        states = _stack_states(init_states)
        system = self._get_system()
        if system is not None:
            states = _prepare_states_batch(system, states)
        states = self._finalize_init_states(states, n_chain)
        chain_keys = jax.random.split(self._next_key(), n_chain)
        if mesh is not None:
            from mici_tpu import parallel

            states = parallel.shard_chain_axis(states, mesh)
            chain_keys = parallel.shard_chain_axis(chain_keys, mesh)

        loaded_ckpt = None
        if resume_from is not None:
            checkpoint = True
            if memmap_path is None:
                memmap_path = resume_from
            elif Path(memmap_path).resolve() != Path(resume_from).resolve():
                msg = ("resume_from must equal memmap_path (the resumed "
                       "run's traces and checkpoints live in the same "
                       "directory).")
                raise ValueError(msg)
            loaded_ckpt = checkpoint_mod.LoadedCheckpoint(
                checkpoint_mod.checkpoint_dir(resume_from),
            )
            # Validate the scalar fingerprint before touching any memmap
            # (full schedule validation happens once stages are built).
            loaded_ckpt.validate_meta({
                "n_chain": int(n_chain),
                "n_warm_up_iter": int(n_warm_up_iter),
                "n_main_iter": int(n_main_iter),
                "trace_thin": int(trace_thin),
                "trace_warm_up": bool(trace_warm_up),
            })
        if checkpoint:
            if memmap_path is None:
                msg = ("checkpoint=True requires memmap_path: checkpoints "
                       "resume against the on-disk trace/statistic "
                       "memmaps.")
                raise ValueError(msg)
            force_memmap = True

        n_trace_iter = (n_warm_up_iter + n_main_iter if trace_warm_up
                        else n_main_iter)
        n_trace_rows = n_trace_iter // trace_thin
        use_memmap = force_memmap
        memmap_dir = None
        if use_memmap:
            if memmap_path is None:
                import tempfile

                memmap_dir = tempfile.mkdtemp()
                memmap_path = memmap_dir
            Path(memmap_path).mkdir(parents=True, exist_ok=True)
            logger.info("Storing traces/statistics in memmaps under %s",
                        memmap_path)

        trace_funcs = (tuple(trace_funcs)
                       if trace_funcs is not None else None)

        if trace_summary not in (False, True, "only"):
            msg = 'trace_summary must be False, True or "only".'
            raise ValueError(msg)
        if trace_summary_quantiles is not None:
            summary_quantiles = tuple(
                float(q) for q in trace_summary_quantiles
            )
            if not summary_quantiles or not all(
                0.0 < q < 1.0 for q in summary_quantiles
            ):
                msg = ("trace_summary_quantiles must be a non-empty "
                       "sequence of levels strictly between 0 and 1.")
                raise ValueError(msg)
            if trace_summary is False:
                trace_summary = True
        else:
            summary_quantiles = ()
        if trace_summary_ess is not None and trace_summary_ess is not False:
            summary_ess = (64 if trace_summary_ess is True
                           else int(trace_summary_ess))
            if summary_ess < 2:
                msg = ("trace_summary_ess must be a batch length >= 2 "
                       "(or True for the default).")
                raise ValueError(msg)
            if trace_summary is False:
                trace_summary = True
        else:
            summary_ess = 0

        # Allocate host buffers for traces and statistics.
        traces = None
        summary_state = None
        per_chain_trace_bytes = 0
        if trace_funcs and n_trace_rows > 0:
            example = {}
            example_system = self._get_system()
            example_state = _index_states(states, 0)
            for trace_func in trace_funcs:
                if isinstance(trace_func, SystemTraceFunc):
                    example.update(
                        trace_func(example_state, example_system),
                    )
                else:
                    example.update(trace_func(example_state))
            per_chain_trace_bytes = sum(
                int(np.asarray(v).size) * np.asarray(v).dtype.itemsize
                for v in example.values()
            )
            if trace_summary:
                summary_state = _init_trace_summary(
                    example, n_chain, summary_quantiles, summary_ess,
                )
            traces = {} if trace_summary != "only" else None
            for key, val in (
                example.items() if trace_summary != "only" else ()):
                val = np.asarray(val)
                init = (np.nan if np.issubdtype(val.dtype, np.inexact)
                        else 0)
                shape = (n_chain, n_trace_rows, *val.shape)
                if loaded_ckpt is not None:
                    traces[key] = _open_existing_memmap(
                        Path(memmap_path) / f"trace_{key}.npy",
                        shape, val.dtype,
                    )
                elif use_memmap:
                    traces[key] = _open_new_memmap(
                        Path(memmap_path) / f"trace_{key}.npy",
                        shape, init, val.dtype,
                    )
                else:
                    traces[key] = np.full(shape, init, val.dtype)
        stats = {}
        per_chain_stats_bytes = 0
        for trans_key, transition in self.transitions.items():
            if transition.statistic_types is not None:
                per_chain_stats_bytes += sum(
                    np.dtype(dtype).itemsize if _np_dtype_ok(dtype) else 8
                    for dtype, _ in transition.statistic_types.values()
                )
        for trans_key, transition in self.transitions.items():
            if transition.statistic_types is not None:
                stats[trans_key] = {}
                for key, (dtype, val) in transition.statistic_types.items():
                    try:
                        np_dtype = np.dtype(dtype)
                    except TypeError:
                        np_dtype = np.float64
                    shape = (n_chain, n_trace_iter)
                    if loaded_ckpt is not None:
                        stats[trans_key][key] = _open_existing_memmap(
                            Path(memmap_path) / f"stats_{trans_key}_{key}.npy",
                            shape, np_dtype,
                        )
                    elif use_memmap:
                        stats[trans_key][key] = _open_new_memmap(
                            Path(memmap_path) / f"stats_{trans_key}_{key}.npy",
                            shape, val, np_dtype,
                        )
                    else:
                        stats[trans_key][key] = np.full(shape, val, np_dtype)

        if stager is None:
            if adapters is None or all(
                a.is_fast for a_list in adapters.values() for a in a_list
            ):
                stager = WarmUpStager()
            else:
                stager = WindowedWarmUpStager()
        sampling_stages = stager.stages(
            n_warm_up_iter, n_main_iter, adapters, trace_funcs,
            trace_warm_up=trace_warm_up,
        )

        trans_keys = tuple(self.transitions)
        transitions = dict(self.transitions)
        if mesh is not None:
            from mici_tpu import parallel

            # Keep the depth-tail re-batching gathers shard-local: group
            # the tail re-batching by the number of chain shards so no
            # tail round induces cross-device gather/scatter traffic
            # (transitions.py sample_batch; VERDICT round-3 item 4).
            n_shards = parallel.n_chain_shards(mesh)
            if n_shards > 1:
                transitions = {
                    k: (t.replace(rebatch_groups=n_shards)
                        if getattr(t, "rebatch_groups", "absent") is None
                        else t)
                    for k, t in transitions.items()
                }
        auto_chunks = (
            _auto_stage_chunks(sampling_stages, trace_thin)
            if chunk_size is None else {}
        )
        ckpt_writer = None
        resume_stage = -1
        resume_carry = None
        if checkpoint:
            # Fingerprint of the run configuration: a resumed call must
            # reproduce the exact stage schedule and storage layout.
            ckpt_meta = {
                "format_version": checkpoint_mod.FORMAT_VERSION,
                "n_chain": int(n_chain),
                "n_warm_up_iter": int(n_warm_up_iter),
                "n_main_iter": int(n_main_iter),
                "trace_thin": int(trace_thin),
                "trace_warm_up": bool(trace_warm_up),
                "trans_keys": list(trans_keys),
                "stages": [
                    [label, int(stage.n_iter),
                     bool(stage.adapters
                          and any(stage.adapters.values())),
                     bool(stage.record_stats),
                     stage.trace_funcs is not None]
                    for label, stage in sampling_stages.items()
                ],
                "trace_keys": sorted(traces) if traces is not None else [],
                "stat_keys": {k: sorted(v) for k, v in stats.items()},
                "trace_summary_ess": int(summary_ess),
            }
            if loaded_ckpt is not None:
                loaded_ckpt.validate_meta(ckpt_meta)
                resume_stage = int(loaded_ckpt.carry["stage_index"])
                resume_carry = loaded_ckpt
            ckpt_writer = checkpoint_mod.CheckpointWriter(
                checkpoint_mod.checkpoint_dir(memmap_path), ckpt_meta,
            )
        sampling_index_offset = 0
        trace_index_offset = 0
        interrupted = False
        logger.debug(
            "Sampling %d chains: %d warm-up + %d main iterations over %d "
            "stage(s)%s",
            n_chain, n_warm_up_iter, n_main_iter, len(sampling_stages),
            "" if mesh is None else f" on mesh {mesh.shape}",
        )

        with stage_bar_class(
            sampling_stages, "Sampling stage", position=(0, 2),
        ) as stage_pb:
            for stage_index, (label, stage) in enumerate(
                sampling_stages.items(),
            ):
                stage_adapters = tuple(
                    (k, tuple(v)) for k, v in (stage.adapters or {}).items()
                    if v
                )
                if stage_index < resume_stage:
                    # Stage fully sampled before the checkpoint: replay
                    # only its cross-chain adapter finalization from the
                    # recorded inputs, reconstructing the adapted
                    # transitions (and any structural metric change)
                    # bit-identically without re-running the chains.
                    if stage_adapters:
                        record = resume_carry.finalize_records.get(
                            stage_index,
                        )
                        if record is None:
                            msg = (f"Resume: missing finalization record "
                                   f"for completed stage {label!r} in the "
                                   f"checkpoint directory.")
                            raise checkpoint_mod.CheckpointError(msg)
                        adapt_template, _ = _adapter_state_templates(
                            transitions, states, trans_keys=trans_keys,
                            stage_adapters=stage_adapters,
                        )
                        r_adapt = checkpoint_mod.restore_like(
                            adapt_template, record["adapt"],
                            what=f"adapter states of stage {label!r}",
                        )
                        r_states = checkpoint_mod.restore_like(
                            states, record["states"],
                            what=f"chain states of stage {label!r}",
                        )
                        self._rng = checkpoint_mod.restore_like(
                            self._rng, record["rng"],
                            what="sampler PRNG key",
                        )
                        if mesh is not None:
                            from mici_tpu import parallel

                            r_states = parallel.shard_chain_axis(
                                r_states, mesh)
                            r_adapt = parallel.shard_chain_axis(
                                r_adapt, mesh)
                        transitions, states = self._finalize_adapters(
                            transitions, r_states, r_adapt, stage_adapters,
                        )
                    stage_pb.update(stage_index + 1)
                    continue

                restored_mid = stage_index == resume_stage
                if restored_mid:
                    # Resumed stage: pour the checkpointed carry back into
                    # freshly computed structure templates.
                    if stage_adapters:
                        adapt_template, params_template = (
                            _adapter_state_templates(
                                transitions, states, trans_keys=trans_keys,
                                stage_adapters=stage_adapters,
                            ))
                    else:
                        adapt_template = {}
                        params_template = {k: {} for k in trans_keys}
                    groups = resume_carry.carry_groups
                    carry_scalars = resume_carry.carry
                    adapt_states = checkpoint_mod.restore_like(
                        adapt_template, groups["adapt"],
                        what="adapter states",
                    )
                    params = checkpoint_mod.restore_like(
                        params_template, groups["params"],
                        what="transition parameters",
                    )
                    states = checkpoint_mod.restore_like(
                        states, groups["states"], what="chain states",
                    )
                    chain_keys = checkpoint_mod.restore_like(
                        chain_keys, groups["chain_keys"],
                        what="chain PRNG keys",
                    )
                    if summary_state is not None or groups["summary"]:
                        summary_state = checkpoint_mod.restore_like(
                            summary_state, groups["summary"],
                            what="trace summaries",
                        )
                    self._rng = checkpoint_mod.restore_like(
                        self._rng, groups["rng"], what="sampler PRNG key",
                    )
                    if mesh is not None:
                        from mici_tpu import parallel

                        states = parallel.shard_chain_axis(states, mesh)
                        chain_keys = parallel.shard_chain_axis(
                            chain_keys, mesh)
                        adapt_states = parallel.shard_chain_axis(
                            adapt_states, mesh)
                        params = parallel.shard_chain_axis(params, mesh)
                        if summary_state is not None:
                            summary_state = parallel.shard_chain_axis(
                                summary_state, mesh)
                    sampling_index_offset = int(
                        carry_scalars["sampling_index_offset"])
                    trace_index_offset = int(
                        carry_scalars["trace_index_offset"])
                elif stage_adapters:
                    adapt_states, params = _init_adapters(
                        transitions, states, trans_keys=trans_keys,
                        adapters=stage_adapters,
                    )
                    self._check_adapter_init(params)
                else:
                    adapt_states = {}
                    params = {k: {} for k in trans_keys}

                stage_trace_funcs = stage.trace_funcs
                record = stage.record_stats or stage_trace_funcs is not None

                base_chunk = (
                    auto_chunks.get(label, stage.n_iter)
                    if chunk_size is None else chunk_size
                )
                chunk = min(base_chunk, stage.n_iter)
                if chunk_size is None:
                    # Cap the per-chunk device trace/stat buffer: bounds
                    # HBM held by trace blocks and overlaps device->host
                    # streaming with the next chunk's compute (see
                    # _MAX_CHUNK_BUFFER_BYTES).
                    bytes_per_iter = n_chain * (
                        (per_chain_trace_bytes // trace_thin
                         if stage.trace_funcs is not None else 0)
                        + (per_chain_stats_bytes
                           if stage.record_stats else 0)
                    )
                    if bytes_per_iter > 0:
                        chunk = max(
                            1, min(
                                chunk,
                                _MAX_CHUNK_BUFFER_BYTES // bytes_per_iter,
                            ),
                        )
                if trace_thin > 1:
                    # Align chunk boundaries to thin-blocks so thinned
                    # trace rows stay contiguous across chunks.
                    chunk = max(trace_thin,
                                (chunk // trace_thin) * trace_thin)
                adapt = None
                if max_chunk_seconds is not None:
                    # Time-capped chunking: adapt lengths per stage from
                    # measured per-iteration time (fresh probe each stage
                    # — stage programs differ, so estimates don't carry).
                    adapt = _ChunkTimeAdapter(
                        max_chunk_seconds, base=chunk, thin=trace_thin,
                        start_at_base=chunk_size is not None,
                    )
                    chunk = adapt.first_chunk()
                if restored_mid:
                    offset_in_stage = int(carry_scalars["offset_in_stage"])
                    trace_offset_in_stage = int(
                        carry_scalars["trace_offset_in_stage"])
                else:
                    offset_in_stage = 0
                    trace_offset_in_stage = 0
                n_remaining = stage.n_iter - offset_in_stage
                pb = progress_bar_class(
                    range(stage.n_iter), description=label, position=(1, 2),
                )
                pending = None  # (row, traces, stats)
                stage_flags = {}

                def merge_flags(summary):
                    for key, (n, total) in summary.items():
                        prev_n, prev_total = stage_flags.get(key, (0.0, 0))
                        stage_flags[key] = (prev_n + n, prev_total + total)

                with pb:
                    try:
                        # Double-buffered streaming: the next chunk is
                        # dispatched (asynchronously) before the previous
                        # chunk's traces are copied to host, overlapping
                        # device compute with device->host transfer — the
                        # compiled-world analogue of the reference's
                        # memmap flush pipeline (mici/samplers.py:354-367).
                        if ckpt_writer is not None:
                            # Stage-entry checkpoint: covers kills before
                            # the first drained chunk of the stage.
                            self._write_carry_checkpoint(
                                ckpt_writer, stage_index,
                                (states, chain_keys, params, adapt_states,
                                 summary_state, offset_in_stage,
                                 trace_offset_in_stage),
                                sampling_index_offset, trace_index_offset,
                            )
                        while n_remaining > 0:
                            carry_snapshot = (
                                states, chain_keys, params, adapt_states,
                                summary_state, offset_in_stage,
                                trace_offset_in_stage,
                            ) if ckpt_writer is not None else None
                            this_chunk = min(chunk, n_remaining)
                            if adapt is not None:
                                adapt.begin()
                            (states, chain_keys, params, adapt_states,
                             chunk_traces, chunk_stats,
                             summary_state) = _run_stage_chunk(
                                transitions, states, chain_keys, params,
                                adapt_states, summary_state,
                                trans_keys=trans_keys,
                                adapters=stage_adapters,
                                trace_funcs=stage_trace_funcs,
                                n_iter=this_chunk,
                                trace_thin=trace_thin,
                                summarize=(
                                    trace_summary
                                    if (trace_summary
                                        and stage_trace_funcs is not None)
                                    else False),
                                summary_quantiles=summary_quantiles,
                                summary_ess=summary_ess,
                            )
                            if adapt is not None:
                                # Sync on this chunk's outputs, measure
                                # its wall (minus compile), resize the
                                # next chunk to fit the time target.
                                chunk = adapt.observe(this_chunk, states)
                            if pending is not None:
                                merge_flags(self._drain_chunk(
                                    pending, traces, stats,
                                    stage_trace_funcs, stage.record_stats,
                                ))
                                if ckpt_writer is not None:
                                    # The snapshot taken before this
                                    # chunk's dispatch is exactly the
                                    # carry matching the rows the drain
                                    # just made durable.
                                    self._write_carry_checkpoint(
                                        ckpt_writer, stage_index,
                                        carry_snapshot,
                                        sampling_index_offset,
                                        trace_index_offset,
                                    )
                            row = slice(
                                sampling_index_offset + offset_in_stage,
                                sampling_index_offset + offset_in_stage
                                + this_chunk,
                            )
                            chunk_trace_rows = this_chunk // trace_thin
                            trace_row = slice(
                                trace_index_offset + trace_offset_in_stage,
                                trace_index_offset + trace_offset_in_stage
                                + chunk_trace_rows,
                            )
                            pending = (row, trace_row, chunk_traces,
                                       chunk_stats)
                            offset_in_stage += this_chunk
                            trace_offset_in_stage += chunk_trace_rows
                            n_remaining -= this_chunk
                            # Monitored-stat means cost one device fetch
                            # (round trip) per chunk: skip them when no
                            # progress is displayed.
                            postfix = (
                                None if display_progress is False
                                else self._monitor_postfix(
                                    monitor_stats, chunk_stats,
                                )
                            )
                            pb.update(
                                offset_in_stage,
                                postfix,
                            )
                        if pending is not None:
                            merge_flags(self._drain_chunk(
                                pending, traces, stats, stage_trace_funcs,
                                stage.record_stats,
                            ))
                        if ckpt_writer is not None:
                            # Stage-end checkpoint: the carry before
                            # finalization, which resume replays.
                            self._write_carry_checkpoint(
                                ckpt_writer, stage_index,
                                (states, chain_keys, params, adapt_states,
                                 summary_state, offset_in_stage,
                                 trace_offset_in_stage),
                                sampling_index_offset, trace_index_offset,
                            )
                    except KeyboardInterrupt:
                        interrupted = True
                        logger.info(
                            "Interrupted during stage %r: returning partial "
                            "traces/statistics for %d completed "
                            "iteration(s).", label,
                            sampling_index_offset + offset_in_stage,
                        )
                        if pending is not None:
                            try:
                                self._drain_chunk(
                                    pending, traces, stats,
                                    stage_trace_funcs, stage.record_stats,
                                )
                            except Exception:  # noqa: BLE001
                                pass

                flagged = [
                    f"{key} {100 * n / total:.2f}%"
                    for key, (n, total) in stage_flags.items()
                    if n > 0 and total > 0
                ]
                if flagged:
                    logger.info(
                        "Stage %r flagged integrator steps: %s",
                        label, "; ".join(flagged),
                    )

                if stage_adapters and not interrupted:
                    if ckpt_writer is not None:
                        # Record the finalization inputs (adapter states,
                        # end-of-stage chain states, the key finalize will
                        # consume) so resume can replay this reduction.
                        ckpt_writer.write_finalize_record(
                            stage_index, adapt_states, states, self._rng,
                        )
                    transitions, states = self._finalize_adapters(
                        transitions, states, adapt_states, stage_adapters,
                    )
                if record:
                    sampling_index_offset += offset_in_stage
                    trace_index_offset += trace_offset_in_stage
                stage_pb.update(stage_index + 1)
                if interrupted:
                    break

        if (trace_thin > 1 and traces is not None and not interrupted
                and trace_index_offset < n_trace_rows):
            # Stage lengths not divisible by trace_thin drop their
            # remainder iterations; trim the unwritten tail rows.
            traces = {
                key: val[:, :trace_index_offset]
                for key, val in traces.items()
            }

        self._transitions = transitions
        final_states = _unstack_states(jax.device_get(states), n_chain)
        trace_summaries = (
            _finalize_trace_summary(
                summary_state, summary_quantiles, summary_ess)
            if summary_state is not None else None)
        return MCMCSampleChainsOutputs(
            final_states, traces, stats, trace_summaries)

    # -- helpers -----------------------------------------------------------

    def _coerce_init_state(self, state):
        """Convert an initial chain state input to a ChainState (no device
        computation — preparation happens batched after stacking).

        Reference: mici/samplers.py:_check_and_process_init_state.
        """
        if isinstance(state, dict):
            return ChainState(**state)
        if not isinstance(state, ChainState):
            return ChainState(pos=state, mom=None, dir=1)
        return state

    def _check_and_process_init_state(self, state):
        """Check initial chain state, convert to ChainState and prepare.

        Kept for reference API parity; the batched driver path uses
        :meth:`_coerce_init_state` + :func:`_prepare_states_batch`.
        """
        state = self._coerce_init_state(state)
        system = self._get_system()
        if system is not None:
            state = system.prepare_state(state)
        return state

    def _finalize_init_states(self, states, n_chain):
        """Hook for subclasses to complete batched initial states."""
        return states

    def _get_system(self):
        for transition in self.transitions.values():
            if hasattr(transition, "system"):
                return transition.system
        return None

    def _check_adapter_init(self, params):
        for t_params in params.values():
            if "step_size" in t_params:
                step = np.asarray(t_params["step_size"])
                if np.any(np.isnan(step)):
                    msg = (
                        "Could not find reasonable initial step size in "
                        "maximum number of iterations (or Hamiltonian "
                        "evaluated to NaN at an initial state)."
                    )
                    logger.error(msg)
                    raise AdaptationError(msg)

    def _write_carry_checkpoint(self, writer, stage_index, snapshot,
                                sampling_index_offset, trace_index_offset):
        """Write the stage-loop carry as an atomic resumable checkpoint."""
        (states, chain_keys, params, adapt_states, summary_state,
         offset_in_stage, trace_offset_in_stage) = snapshot
        writer.write_carry(
            stage_index=stage_index, states=states, chain_keys=chain_keys,
            params=params, adapt_states=adapt_states,
            summary_state=summary_state, offset_in_stage=offset_in_stage,
            trace_offset_in_stage=trace_offset_in_stage,
            sampling_index_offset=sampling_index_offset,
            trace_index_offset=trace_index_offset, rng=self._rng,
        )

    def _finalize_adapters(self, transitions, states, adapt_states,
                           stage_adapters):
        """Cross-chain adapter finalization between stages.

        Reference: mici/samplers.py:651-665, mici/adapters.py:375-389,
        :473-514.
        """
        for trans_key, adapter_list in stage_adapters:
            for i, adapter in enumerate(adapter_list):
                # finalize may factorize the adapted metric (Cholesky /
                # matmuls) eagerly, so it needs the engine precision too.
                with precision.matmul_precision_scope():
                    transition, states = adapter.finalize(
                        adapt_states[trans_key][i], states,
                        transitions[trans_key], self._next_key(),
                    )
                transitions = dict(transitions)
                transitions[trans_key] = transition
                if hasattr(transition, "system"):
                    transitions = _propagate_system(
                        transitions, transition.system,
                    )
        return transitions, states

    #: Per-step failure-flag statistics summarized to the module logger at
    #: stage end (the compiled-world analogue of the reference's per-step
    #: trajectory-termination / integrator-error logging,
    #: mici/transitions.py:30-43).
    _FLAG_STAT_KEYS = ("diverging", "convergence_error",
                       "non_reversible_step")

    def _drain_chunk(self, pending, traces, stats, stage_trace_funcs,
                     record_stats):
        """Copy a completed chunk's device results into host buffers.

        Returns a ``{stat_key: (n_flagged, n_total)}`` summary of the
        chunk's failure-flag statistics for stage-level logging.
        """
        row, trace_row, chunk_traces, chunk_stats = pending
        if stage_trace_funcs is not None and traces:
            host_traces = jax.device_get(chunk_traces)
            for key, arr in host_traces.items():
                traces[key][:, trace_row] = arr
        flag_summary = {}
        if record_stats and stats:
            host_stats = jax.device_get(chunk_stats)
            for t_key, t_stats in host_stats.items():
                for key, arr in t_stats.items():
                    stats[t_key][key][:, row] = arr.astype(
                        stats[t_key][key].dtype,
                    )
                    if key in self._FLAG_STAT_KEYS:
                        flag_summary[f"{t_key}.{key}"] = (
                            float(np.sum(arr)), int(arr.size),
                        )
        return flag_summary

    def _monitor_postfix(self, monitor_stats, chunk_stats):
        if monitor_stats is None:
            return None
        postfix = {}
        for trans_key, keys in monitor_stats.items():
            if trans_key not in chunk_stats:
                continue
            host = jax.device_get(
                {k: chunk_stats[trans_key][k] for k in keys
                 if k in chunk_stats[trans_key]},
            )
            for k, arr in host.items():
                postfix[f"mean({k})"] = float(np.nanmean(arr))
        return postfix


class HamiltonianMonteCarlo(MarkovChainMonteCarloMethod):
    """Wrapper class for Hamiltonian Monte Carlo (HMC) methods.

    Combines a momentum transition and an integration transition.
    Reference: mici/samplers.py:1180-1431.
    """

    def __init__(self, system, rng, integration_transition,
                 momentum_transition=None):
        self.system = system
        if momentum_transition is None:
            momentum_transition = IndependentMomentumTransition(system)
        super().__init__(rng, {
            "momentum_transition": momentum_transition,
            "integration_transition": integration_transition,
        })

    @property
    def integrator(self):
        return self.transitions["integration_transition"].integrator

    def _preprocess_init_state(self, init_state):
        """Make sure initial state is a ChainState with momentum sampled.

        Reference: mici/samplers.py:1248-1261.
        """
        if not isinstance(init_state, ChainState):
            init_state = ChainState(
                pos=init_state, mom=None, dir=1,
            )
        init_state = self.system.prepare_state(init_state)
        if init_state.mom is None:
            init_state = init_state.replace(
                mom=self.system.sample_momentum(
                    init_state, self._next_key(),
                ),
            )
        return init_state

    def _finalize_init_states(self, states, n_chain):
        """Sample missing momenta for the whole batch in one program."""
        if states.mom is None:
            keys = jax.random.split(self._next_key(), n_chain)
            mom = _sample_momenta_batch(self.system, states, keys)
            states = states.replace(mom=mom)
        return states

    # Default traced variables: position and Hamiltonian, with the system
    # routed through the traced argument path so the adapter-tuned metric
    # is used (reference: mici/samplers.py:1263-1269).
    _default_trace_func = default_hamiltonian_trace_func

    def sample_chains(self, n_warm_up_iter, n_main_iter, init_states,
                      **kwargs):
        """Sample chains with adaptive warm up (defaults per reference).

        Reference: mici/samplers.py:1271-1431 (defaults at :1404-1423).
        """
        init_states = [self._coerce_init_state(i) for i in init_states]
        has_mom = [s.mom is not None for s in init_states]
        if any(has_mom) and not all(has_mom):
            # Mixed momenta: fall back to per-chain preparation so the
            # stacked pytree structure is uniform (rare path).
            init_states = [
                self._preprocess_init_state(s) for s in init_states
            ]
        if "adapters" not in kwargs:
            kwargs["adapters"] = [DualAveragingStepSizeAdapter()]
            # TPU-native default beyond the reference list: for dynamic
            # (NUTS) transitions under the fused leaf loop, tune the
            # depth-tail re-batching boundary from the warm-up depth
            # histogram.  Statistically invisible — per-chain decisions
            # are bit-identical to plain vmapped execution (tested) —
            # and compile-free in the standard flows (warm and main
            # stage programs differ anyway), while removing the deep
            # tree tail's lockstep tax on funnel-like geometry
            # (docs/BENCHMARKS.md round-3 depth-tail study).  Users
            # passing an explicit ``adapters`` list (including the
            # reference-default ``[DualAveragingStepSizeAdapter()]``)
            # get exactly what they asked for.
            transition = self.transitions["integration_transition"]
            if (getattr(transition, "max_tree_depth", None) is not None
                    and getattr(transition, "loop_mode", None) == "fused"
                    and getattr(transition, "rebatch_depth", None) is None):
                from mici_tpu.adapters import TreeDepthCapAdapter

                kwargs["adapters"].append(
                    TreeDepthCapAdapter(mode="rebatch"))
        if "trace_funcs" not in kwargs:
            kwargs["trace_funcs"] = [self._default_trace_func]
        if "monitor_stats" in kwargs:
            if kwargs["monitor_stats"] is not None:
                kwargs["monitor_stats"] = {
                    "integration_transition": kwargs["monitor_stats"],
                }
        else:
            kwargs["monitor_stats"] = {
                "integration_transition": ["accept_stat"],
            }
        if kwargs.get("adapters") is not None:
            kwargs["adapters"] = {
                "integration_transition": kwargs["adapters"],
            }
        out = super().sample_chains(
            n_warm_up_iter, n_main_iter, init_states, **kwargs,
        )
        stats = out.statistics.get("integration_transition", {})
        # Refresh the system reference to the adapter-tuned version.
        self.system = self.transitions["integration_transition"].system
        return HMCSampleChainsOutputs(
            out.final_states, out.traces, stats, out.trace_summaries)


class StaticMetropolisHMC(HamiltonianMonteCarlo):
    """Static integration time HMC with Metropolis sampling.

    Reference: mici/samplers.py:1434-1498.
    """

    def __init__(self, system, integrator, rng, n_step,
                 momentum_transition=None):
        integration_transition = MetropolisStaticIntegrationTransition(
            system, integrator, n_step,
        )
        super().__init__(system, rng, integration_transition,
                         momentum_transition)

    @property
    def n_step(self):
        return self.transitions["integration_transition"].n_step


class RandomMetropolisHMC(HamiltonianMonteCarlo):
    """Random integration time HMC with Metropolis sampling.

    Reference: mici/samplers.py:1501-1572.
    """

    def __init__(self, system, integrator, rng, n_step_range,
                 momentum_transition=None):
        integration_transition = MetropolisRandomIntegrationTransition(
            system, integrator, n_step_range,
        )
        super().__init__(system, rng, integration_transition,
                         momentum_transition)

    @property
    def n_step_range(self):
        return self.transitions["integration_transition"].n_step_range


class DynamicMultinomialHMC(HamiltonianMonteCarlo):
    """Dynamic (NUTS) HMC with multinomial proposal sampling.

    Reference: mici/samplers.py:1575-1683.
    """

    def __init__(self, system, integrator, rng, *, max_tree_depth=10,
                 max_delta_h=1000.0,
                 termination_criterion=riemannian_no_u_turn_criterion,
                 do_extra_subtree_checks=True, momentum_transition=None,
                 loop_mode="fused", rebatch_depth=None, rebatch_slots=None,
                 rebatch_groups=None):
        integration_transition = MultinomialDynamicIntegrationTransition(
            system, integrator, max_tree_depth=max_tree_depth,
            max_delta_h=max_delta_h,
            termination_criterion=termination_criterion,
            do_extra_subtree_checks=do_extra_subtree_checks,
            loop_mode=loop_mode, rebatch_depth=rebatch_depth,
            rebatch_slots=rebatch_slots, rebatch_groups=rebatch_groups,
        )
        super().__init__(system, rng, integration_transition,
                         momentum_transition)

    @property
    def max_tree_depth(self):
        return self.transitions["integration_transition"].max_tree_depth

    @property
    def max_delta_h(self):
        return self.transitions["integration_transition"].max_delta_h


class DynamicSliceHMC(HamiltonianMonteCarlo):
    """Dynamic (NUTS) HMC with slice proposal sampling.

    Reference: mici/samplers.py:1686-1791.
    """

    def __init__(self, system, integrator, rng, *, max_tree_depth=10,
                 max_delta_h=1000.0,
                 termination_criterion=euclidean_no_u_turn_criterion,
                 do_extra_subtree_checks=False, momentum_transition=None,
                 loop_mode="fused", rebatch_depth=None, rebatch_slots=None,
                 rebatch_groups=None):
        integration_transition = SliceDynamicIntegrationTransition(
            system, integrator, max_tree_depth=max_tree_depth,
            max_delta_h=max_delta_h,
            termination_criterion=termination_criterion,
            do_extra_subtree_checks=do_extra_subtree_checks,
            loop_mode=loop_mode, rebatch_depth=rebatch_depth,
            rebatch_slots=rebatch_slots, rebatch_groups=rebatch_groups,
        )
        super().__init__(system, rng, integration_transition,
                         momentum_transition)

    @property
    def max_tree_depth(self):
        return self.transitions["integration_transition"].max_tree_depth

    @property
    def max_delta_h(self):
        return self.transitions["integration_transition"].max_delta_h
