"""Utilities for interfacing with external probabilistic programming libraries.

Reference: mici/interop.py (557 LoC): ArviZ conversion (InferenceData for
arviz < 1.0, xarray DataTree for arviz >= 1.0), a PyMC drop-in ``sample``
replacement and Stan model sampling with CmdStan-style arguments.  All
bridges gate on optional dependencies exactly like the reference
(mici/interop.py:20-52).

TPU-native differences from the reference:

* PyMC models are translated **natively to JAX** through PyTensor's JAX
  backend when possible (``pymc.sampling.jax.get_jaxified_logp`` /
  ``get_jaxified_graph``), so the posterior density, its gradient and the
  constrained-parameter trace functions are ordinary traceable JAX
  functions — chains vectorize on device instead of serializing through a
  host callback.  A ``jax.pure_callback`` fallback covers models whose
  graphs contain ops without JAX dispatch rules.
* Stan models are bridged through ``bridgestan`` (an in-process
  log-density/gradient C interface) wrapped with ``jax.pure_callback``,
  rather than the reference's ``pystan`` HTTP service.
"""

from __future__ import annotations

import importlib
import os

import numpy as np


#: The exact external API surface the bridges in this module (and the
#: torch autodiff backend) consume, pinned to the upstream versions whose
#: documented behavior the test fakes mirror (tests/test_interop.py,
#: tests/test_autodiff.py).  This is the conformance contract for
#: environments without the optional packages: the fakes implement
#: exactly these attributes with these semantics, and
#: ``ci/run_gated_tests.sh`` runs the gated test paths against the real
#: libraries the moment they are installed (reference CI runs them for
#: real: /root/reference/pyproject.toml test extras).
#:
#: ``api`` entries are dotted attribute paths resolved on the imported
#: package; ``model_api`` entries are methods required of user-supplied
#: model objects (duck-typed, so they are checked against the fakes).
EXTERNAL_API_CONTRACT = {
    "arviz": {
        "pinned_versions": ["0.16.1", "1.0.0"],
        "api": ["__version__", "from_dict"],
        "notes": (
            "from_dict(posterior=, sample_stats=) for arviz<1.0 "
            "(InferenceData); from_dict({group: dict}) for arviz>=1.0 "
            "(xarray.DataTree)."
        ),
    },
    "pymc": {
        "pinned_versions": ["5.16.2"],
        "api": [
            "modelcontext",
            "blocking.DictToArrayBijection.map",
            "sampling.jax.get_jaxified_logp",
            "sampling.jax.get_jaxified_graph",
        ],
        "model_api": [
            "initial_point",      # () -> dict[str, np.ndarray]
            "value_vars",         # unconstrained value variables
            "unobserved_value_vars",  # constrained params + deterministics
            "logp_dlogp_function",    # (mode=) -> callable q -> (lp, dlp)
            "__enter__",          # model context manager
            "__exit__",
        ],
        "notes": (
            "DictToArrayBijection.map returns RaveledVars with .data and "
            ".point_map_info ((name, shape, size, dtype) on pymc>=5; the "
            "3-tuple layout is also handled)."
        ),
    },
    "bridgestan": {
        "pinned_versions": ["2.5.0"],
        "api": ["StanModel.from_stan_file"],
        "model_api": [
            "param_unc_num",        # () -> int
            "log_density_gradient",  # (q) -> (lp, grad)
            # optional, used when present:
            "param_num",            # () -> int
            "param_constrain",      # (q_unc) -> constrained params
        ],
        "notes": (
            "param_num/param_constrain are optional: absent, the trace "
            "function records unconstrained positions and lp only."
        ),
    },
    "torch": {
        "pinned_versions": ["2.13.0"],
        "api": [
            "func.grad_and_value", "func.vjp", "func.jacfwd",
            "func.hessian", "as_tensor", "ones", "zeros", "float64",
        ],
        "notes": (
            "Installed in this environment since round 3: the torch "
            "autodiff backend conformance tests run against real torch."
        ),
    },
}


def external_api_contract_checksum():
    """SHA-256 of the canonical-JSON contract (drift detection).

    Recorded in docs/PARITY.md; tests assert the recorded value so any
    contract change is a conscious, reviewed edit.
    """
    import hashlib
    import json

    canonical = json.dumps(EXTERNAL_API_CONTRACT, sort_keys=True)
    return hashlib.sha256(canonical.encode()).hexdigest()


def _require(module_name):
    try:
        return __import__(module_name)
    except ImportError as e:  # pragma: no cover - optional dependency
        msg = (
            f"{module_name} must be installed to use this function. "
        )
        raise ImportError(msg) from e


def _parse_version(version):
    from packaging.version import parse

    return parse(version)


def _preprocess_stats(traces, stats, energy_key, lp_key):
    """Normalize statistic names to the ArviZ schema.

    Reference: mici/interop.py:30-45 (``n_step`` -> ``n_steps``,
    ``accept_stat`` -> ``acceptance_rate``, energy/lp lifted from traces).
    """
    stats = dict(stats)
    if "n_step" in stats:
        stats["n_steps"] = stats.pop("n_step")
    if "accept_stat" in stats:
        stats["acceptance_rate"] = stats.pop("accept_stat")
    if energy_key is not None and energy_key in traces:
        stats["energy"] = traces[energy_key]
    if lp_key is not None and lp_key in traces:
        stats["lp"] = traces[lp_key]
    return stats


def _stack_arrays(data_dict):
    """Coerce per-chain array lists / stacked arrays to stacked ndarrays.

    Reference: mici/interop.py:48-52.  The TPU sampler already returns
    chain-stacked arrays; per-chain lists (reference format) are stacked.
    """
    out = {}
    for key, val in data_dict.items():
        if isinstance(val, (list, tuple)):
            val = np.stack([np.asarray(v) for v in val])
        out[key] = np.asarray(val)
    return out


def convert_to_arviz_dict(traces, stats, energy_key="hamiltonian",
                          lp_key="lp"):
    """Dependency-free export of chain output in ArviZ ``from_dict`` layout.

    Produces exactly the dict-of-dict-of-arrays structure that
    ``arviz.from_dict`` (and ``arviz.dict_to_dataset`` per group) consumes
    — reference schema mici/interop.py:54-96 — without importing arviz:

    * ``"posterior"``: every traced variable as an array of shape
      ``(n_chain, n_draw, *variable_shape)``.
    * ``"sample_stats"``: transition statistics with names normalized to
      the ArviZ vocabulary (``n_step`` → ``n_steps``, ``accept_stat`` →
      ``acceptance_rate``; mici/interop.py:30-45), plus the energy and
      log-density traces lifted from ``traces`` under ``"energy"`` /
      ``"lp"`` when present.

    Per-chain lists of ``(n_draw, ...)`` arrays (the reference's native
    trace format) are stacked; chain-stacked arrays (this framework's
    native format) pass through.  The arviz bridges
    (:func:`convert_to_inference_data`, :func:`convert_to_data_tree`) are
    thin adapters over this function, so the conversion logic is fully
    exercised by tests even where arviz itself is not installed.

    Args:
        traces: Traces dict from a ``sample_chains`` call: arrays (or
            lists of per-chain arrays) of shape ``(n_chain, n_iter, ...)``.
        stats: Statistics dict from a ``sample_chains`` call.
        energy_key: Trace key treated as the energy sample statistic
            (default ``"hamiltonian"``, the name recorded by the default
            trace function).
        lp_key: Trace key treated as the log-probability sample statistic.

    Returns:
        ``{"posterior": {name: ndarray}, "sample_stats": {name: ndarray}}``.
    """
    sample_stats = _preprocess_stats(traces, stats, energy_key, lp_key)
    return {
        "posterior": _stack_arrays(traces),
        "sample_stats": _stack_arrays(sample_stats),
    }


def convert_to_inference_data(traces, stats, energy_key="hamiltonian",
                              lp_key="lp"):
    """Convert chain trace and statistics data to an ArviZ InferenceData.

    Reference: mici/interop.py:54-96.  Requires arviz < 1.0 (InferenceData
    was removed in ArviZ v1.0+ in favour of ``xarray.DataTree``; use
    :func:`convert_to_data_tree` there).

    Args:
        traces: Traces dict from a ``sample_chains`` call: arrays (or lists
            of per-chain arrays) of shape ``(n_chain, n_iter, ...)``.
        stats: Statistics dict from a ``sample_chains`` call.
        energy_key: Trace key treated as the energy sample statistic
            (default ``"hamiltonian"``, the name recorded by the default
            trace function).
        lp_key: Trace key treated as the log-probability sample statistic.

    Returns:
        ``arviz.InferenceData`` with posterior and sample_stats groups.
    """
    az = _require("arviz")
    if _parse_version(az.__version__) >= _parse_version("1.0.0"):
        msg = (
            "InferenceData was removed in ArviZ v1.0+ in favour of "
            "xarray.DataTree; use convert_to_data_tree instead."
        )
        raise RuntimeError(msg)
    groups = convert_to_arviz_dict(traces, stats, energy_key, lp_key)
    return az.from_dict(
        posterior=groups["posterior"],
        sample_stats=groups["sample_stats"],
    )


def convert_to_data_tree(traces, stats, energy_key="hamiltonian",
                         lp_key="lp"):
    """Convert chain data to an ArviZ ``xarray.DataTree`` (arviz >= 1.0).

    Reference: mici/interop.py:99-143.

    Args:
        traces: Traces dict from a ``sample_chains`` call.
        stats: Statistics dict from a ``sample_chains`` call.
        energy_key: Trace key treated as the energy sample statistic.
        lp_key: Trace key treated as the log-probability sample statistic.

    Returns:
        ``xarray.DataTree`` with ``posterior`` and ``sample_stats`` groups.
    """
    az = _require("arviz")
    if _parse_version(az.__version__) < _parse_version("1.0.0"):
        msg = "xarray.DataTree support requires ArviZ v1.0+"
        raise RuntimeError(msg)
    return az.from_dict(
        convert_to_arviz_dict(traces, stats, energy_key, lp_key),
    )


# ---------------------------------------------------------------------------
# Dependency-free bridge cores (directly tested without the external
# packages; the real-library adapters below are thin over these)
# ---------------------------------------------------------------------------


def split_flat_vector(pos, entries):
    """Split a flat parameter vector into named blocks.

    The inverse of PyMC's ``DictToArrayBijection.map`` raveling
    (mici/interop.py:146-177 operates on the same flat layout), shared by
    both PyMC bridge paths and directly testable without pymc.

    Args:
        pos: Flat vector (jax or numpy array).
        entries: Sequence of ``(name, shape, size)`` blocks in raveled
            order (see :func:`_point_map_entries`).

    Returns:
        List of per-block arrays reshaped to each entry's shape.
    """
    import jax.numpy as jnp

    parts = []
    offset = 0
    for _name, shape, size in entries:
        parts.append(jnp.reshape(pos[offset:offset + size], shape))
        offset += size
    return parts


def make_callback_grad_neg_log_dens(host_val_and_grad, dim, dtype=None):
    """Wrap a host ``q -> (neg_log_dens, grad)`` pair for compiled code.

    The shared ``jax.pure_callback`` plumbing of the PyMC C-function
    fallback and the bridgestan bridge (reference analogues:
    mici/interop.py:146-197, :375-414): result shapes use the canonical
    JAX float dtype (64-bit result shapes are rejected when x64 is
    disabled — the default f32 library mode), and vmapped chains
    serialize through the callback sequentially.

    Args:
        host_val_and_grad: Host function ``np.ndarray -> (scalar, array)``
            returning the negative log density and its gradient, already
            cast to ``dtype``.
        dim: Length of the flat parameter vector.
        dtype: Result dtype; defaults to the canonical JAX float dtype.

    Returns:
        ``(neg_log_dens, grad_neg_log_dens)`` jax-traceable functions,
        with ``grad_neg_log_dens`` returning ``(grad, value)`` (the
        aux-value convention system constructors expect).
    """
    import jax
    import jax.numpy as jnp

    if dtype is None:
        dtype = np.dtype(jnp.result_type(float))

    def grad_neg_log_dens(q):
        val_shape = jax.ShapeDtypeStruct((), dtype)
        grad_shape = jax.ShapeDtypeStruct((dim,), dtype)
        val, grad = jax.pure_callback(
            host_val_and_grad, (val_shape, grad_shape), q,
            vmap_method="sequential",
        )
        return grad, val

    def neg_log_dens(q):
        return grad_neg_log_dens(q)[1]

    return neg_log_dens, grad_neg_log_dens


#: Valid pymc.sample init strategies mirrored by the PyMC bridge
#: (mici/interop.py:300-312).
PYMC_INIT_STRATEGIES = (
    "jitter+adapt_diag", "jitter+adapt_full", "adapt_diag", "adapt_full",
)


def resolve_pymc_init(init):
    """Resolve a pymc ``init`` strategy string.

    Reference semantics: mici/interop.py:300-312 — ``"auto"`` means
    ``"jitter+adapt_diag"``; ``adapt_full`` variants adapt a dense metric;
    ``jitter+`` variants jitter initial states uniformly in [-1, 1].

    Returns:
        ``(use_dense_metric, jitter_init)`` booleans.

    Raises:
        ValueError: For unknown strategies.
    """
    init = "jitter+adapt_diag" if init == "auto" else init
    if init not in PYMC_INIT_STRATEGIES:
        msg = ('init must be "auto", "jitter+adapt_diag", "adapt_diag", '
               '"jitter+adapt_full" or "adapt_full"')
        raise ValueError(msg)
    return "adapt_full" in init, "jitter" in init


def jittered_init_states(mean, n_chains, neg_log_dens, rng,
                         jitter_max_retries=10):
    """Draw per-chain jittered initial states with finite density.

    Reference: mici/interop.py:325-335 — uniform [-1, 1] jitter around the
    model's initial point, retried per chain up to ``jitter_max_retries``
    times until the density is finite (the last draw is kept regardless,
    matching the reference's fallback behavior).

    Args:
        mean: Initial point (flat vector) to jitter around.
        n_chains: Number of chains.
        neg_log_dens: Callable evaluating the negative log density of a
            flat vector (jax or numpy based).
        rng: ``numpy.random.Generator`` consumed draw by draw.
        jitter_max_retries: Maximum attempts per chain.

    Returns:
        List of ``n_chains`` flat numpy vectors.
    """
    mean = np.asarray(mean, dtype=np.float64)
    init_states = []
    for _c in range(n_chains):
        pos = mean
        for _t in range(jitter_max_retries):
            pos = mean + rng.uniform(-1, 1, mean.shape)
            if np.isfinite(float(np.asarray(neg_log_dens(pos)))):
                break
        init_states.append(pos)
    return init_states


#: Valid CmdStan metric names (mici/interop.py:417-470).
STAN_METRICS = ("unit_e", "diag_e", "dense_e")


def resolve_stan_adaptation(metric="diag_e", adapt_engaged=True, *,
                            delta=0.8, gamma=0.05, kappa=0.75, t0=10,
                            init_buffer=75, term_buffer=50, window=25):
    """Map CmdStan adaptation arguments to adapters + stager.

    The full argument-mapping logic of :func:`sample_stan_model`
    (reference: mici/interop.py:417-557) with no Stan dependency:
    ``metric`` selects the adapted metric representation,
    ``delta``/``gamma``/``kappa``/``t0`` parameterize dual averaging, and
    ``init_buffer``/``term_buffer``/``window`` parameterize the
    Stan-style windowed warm-up schedule.

    Returns:
        ``(adapters, stager)`` — ``(None, None)`` when adaptation is
        disabled.

    Raises:
        ValueError: For unknown metric names.
    """
    from mici_tpu import adapters as _adapters
    from mici_tpu import stagers as _stagers

    if metric not in STAN_METRICS:
        msg = 'metric must be one of "unit_e", "diag_e" or "dense_e"'
        raise ValueError(msg)
    if not adapt_engaged:
        return None, None
    adapter_list = [
        _adapters.DualAveragingStepSizeAdapter(
            adapt_stat_target=delta,
            iter_offset=t0,
            iter_decay_coeff=kappa,
            log_step_size_reg_coefficient=gamma,
        ),
    ]
    if metric == "diag_e":
        adapter_list.append(_adapters.OnlineVarianceMetricAdapter())
    elif metric == "dense_e":
        adapter_list.append(_adapters.OnlineCovarianceMetricAdapter())
    if len(adapter_list) > 1:
        stager = _stagers.WindowedWarmUpStager(
            n_init_fast_stage_iter=init_buffer,
            n_final_fast_stage_iter=term_buffer,
            n_init_slow_window_iter=window,
        )
    else:
        stager = _stagers.WarmUpStager()
    return adapter_list, stager


# ---------------------------------------------------------------------------
# PyMC bridge
# ---------------------------------------------------------------------------


def _point_map_entries(raveled_point):
    """Yield ``(name, shape, size)`` for each flat-vector block.

    Handles both pymc ``point_map_info`` layouts: ``(name, shape, size,
    dtype)`` (pymc >= 5) and ``(name, shape, dtype)``.
    """
    entries = []
    for info in raveled_point.point_map_info:
        name, shape = info[0], tuple(int(s) for s in info[1])
        size = (int(info[2]) if len(info) >= 4
                else int(np.prod(shape)) if shape else 1)
        entries.append((name, shape, size))
    return entries


def _construct_pymc_model_functions_jax(model, pm):
    """Native PyTensor->JAX translation of a PyMC model.

    Uses ``pymc.sampling.jax.get_jaxified_logp`` / ``get_jaxified_graph``
    so the density, gradient and trace functions are jax-traceable: chains
    vectorize on device (no host callback in the hot loop).
    """
    import jax
    from pymc.sampling.jax import get_jaxified_graph, get_jaxified_logp

    initial_point = model.initial_point()
    raveled = pm.blocking.DictToArrayBijection.map(initial_point)
    entries = _point_map_entries(raveled)

    def _split(pos):
        return split_flat_vector(pos, entries)

    logp_fn = get_jaxified_logp(model)

    def neg_log_dens(pos):
        return -logp_fn(_split(pos))

    _val_and_grad = jax.value_and_grad(neg_log_dens)

    def grad_neg_log_dens(pos):
        val, grad = _val_and_grad(pos)
        return grad, val

    # Trace the *unobserved value variables* (constrained parameters and
    # deterministics) exactly like the reference trace function
    # (mici/interop.py:178-195), but as one jax-traceable graph.
    trace_vars = model.unobserved_value_vars
    trace_names = [var.name for var in trace_vars]
    trace_fn = get_jaxified_graph(
        inputs=model.value_vars, outputs=trace_vars,
    )

    def trace_func(state):
        outs = trace_fn(*_split(state.pos))
        trace_dict = dict(zip(trace_names, outs))
        trace_dict["lp"] = -neg_log_dens(state.pos)
        return trace_dict

    return neg_log_dens, grad_neg_log_dens, trace_func


def _construct_pymc_model_functions_callback(model, pm):
    """Host-callback bridge for models PyTensor cannot lower to JAX.

    The compiled C logp/dlogp function is exposed to compiled sampling
    code through ``jax.pure_callback`` (chains serialize through the
    callback; prefer the JAX translation when available).
    """
    import jax.numpy as jnp

    logp_dlogp_fn = model.logp_dlogp_function(mode="FAST_RUN")
    logp_dlogp_fn.set_extra_values({})
    initial_point = model.initial_point()
    raveled = pm.blocking.DictToArrayBijection.map(initial_point)
    entries = _point_map_entries(raveled)
    dim = sum(size for _n, _s, size in entries)
    dtype = np.dtype(jnp.result_type(float))

    def _host_val_and_grad(q):
        val, grad = logp_dlogp_fn(np.asarray(q, np.float64))
        return np.asarray(-val, dtype), np.asarray(-grad, dtype)

    neg_log_dens, grad_neg_log_dens = make_callback_grad_neg_log_dens(
        _host_val_and_grad, dim, dtype,
    )

    def _split(pos):
        return split_flat_vector(pos, entries)

    names = [name for name, _s, _z in entries]

    def trace_func(state):
        trace_dict = dict(zip(names, _split(state.pos)))
        trace_dict["lp"] = -neg_log_dens(state.pos)
        return trace_dict

    return neg_log_dens, grad_neg_log_dens, trace_func


def construct_pymc_model_functions(model):
    """Construct functions for sampling from a PyMC model.

    Reference: mici/interop.py:146-197.  Returns ``(neg_log_dens,
    grad_neg_log_dens, trace_func)`` operating on the flat unconstrained
    parameter vector.  The model graph is translated natively to JAX via
    PyTensor's JAX backend where possible (density/gradient/trace evaluate
    on device, vectorized over chains); models containing ops without JAX
    dispatch rules fall back to a ``jax.pure_callback`` bridge around the
    PyMC-compiled C functions.
    """
    pm = _require("pymc")
    try:
        return _construct_pymc_model_functions_jax(model, pm)
    except (ImportError, NotImplementedError):
        return _construct_pymc_model_functions_callback(model, pm)


def sample_pymc_model(draws=1000, *, tune=1000, chains=None, cores=None,
                      random_seed=None, progressbar=True, init="auto",
                      jitter_max_retries=10, return_inferencedata=False,
                      model=None, target_accept=0.8, max_treedepth=10):
    """Generate approximate samples from posterior defined by a PyMC model.

    Drop-in replacement for ``pymc.sample`` using the TPU-native dynamic
    multinomial HMC sampler.  Reference: mici/interop.py:200-351 (argument
    names and semantics mirrored, including the ``init`` strategies and
    jittered-initialization retries).

    Args:
        draws: Number of (post warm-up) samples to draw per chain.
        tune: Number of adaptive warm-up iterations per chain.
        chains: Number of chains; defaults to ``max(2, cores)``.
        cores: Accepted for API parity (chains always execute as one
            vectorized device program); only used for the ``chains``
            default.
        random_seed: Seed for the NumPy generator deriving the PRNG key.
        progressbar: Whether to display progress bars.
        init: One of ``"auto"``, ``"adapt_diag"``, ``"jitter+adapt_diag"``,
            ``"adapt_full"``, ``"jitter+adapt_full"``: whether to adapt a
            diagonal or dense metric, and whether to jitter the initial
            states uniformly in [-1, 1].  ``"auto"`` resolves to
            ``"jitter+adapt_diag"``.
        jitter_max_retries: Maximum attempts (per chain) at drawing a
            jittered initial state with finite density.
        return_inferencedata: Return an ``arviz.InferenceData`` instead of
            a traces dict.
        model: PyMC model (or None inside a model context manager).
        target_accept: Dual-averaging target acceptance statistic.
        max_treedepth: Maximum NUTS trajectory tree depth.

    Returns:
        Dict mapping traced variable names to stacked ``(chains, draws,
        ...)`` arrays, or an ``arviz.InferenceData`` when
        ``return_inferencedata=True``.
    """
    import jax.numpy as jnp

    from mici_tpu import adapters as _adapters
    from mici_tpu import integrators as _integrators
    from mici_tpu import samplers as _samplers
    from mici_tpu import systems as _systems

    pm = _require("pymc")
    if return_inferencedata and importlib.util.find_spec("arviz") is None:
        msg = "Cannot return InferenceData as ArviZ is not installed"
        raise ValueError(msg)

    model = pm.modelcontext(model)

    # Defaults mirroring pymc.sample (mici/interop.py:296-298); cores only
    # affects the chains default here.
    cores = min(4, max(1, (os.cpu_count() or 2) // 2)) if cores is None \
        else cores
    chains = max(2, cores) if chains is None else chains

    use_dense_metric, jitter_init = resolve_pymc_init(init)

    with model:
        neg_log_dens, grad_neg_log_dens, trace_func = (
            construct_pymc_model_functions(model)
        )
        system = _systems.EuclideanMetricSystem(
            neg_log_dens, grad_neg_log_dens=grad_neg_log_dens,
        )
        integrator = _integrators.LeapfrogIntegrator(system)
        rng = np.random.default_rng(random_seed)
        seed = int(rng.integers(2**31 - 1))
        sampler = _samplers.DynamicMultinomialHMC(
            system, integrator, seed, max_tree_depth=max_treedepth,
        )
        step_size_adapter = _adapters.DualAveragingStepSizeAdapter(
            target_accept,
        )
        metric_adapter = (
            _adapters.OnlineCovarianceMetricAdapter() if use_dense_metric
            else _adapters.OnlineVarianceMetricAdapter()
        )

        initial_point = model.initial_point()
        raveled = pm.blocking.DictToArrayBijection.map(initial_point)
        mean = np.asarray(raveled.data, dtype=np.float64).copy()
        if jitter_init:
            init_states = jittered_init_states(
                mean, chains, lambda q: neg_log_dens(jnp.asarray(q)), rng,
                jitter_max_retries,
            )
        else:
            init_states = [mean.copy() for _c in range(chains)]

        out = sampler.sample_chains(
            tune, draws, init_states,
            adapters=[step_size_adapter, metric_adapter],
            trace_funcs=[trace_func],
            display_progress=progressbar,
            monitor_stats=["accept_stat", "n_step", "diverging"],
        )

    if return_inferencedata:
        return convert_to_inference_data(
            out.traces, out.statistics, energy_key=None,
        )
    return {key: np.asarray(val) for key, val in out.traces.items()}


# ---------------------------------------------------------------------------
# Stan bridge
# ---------------------------------------------------------------------------


def construct_stan_model_functions(model):
    """Construct functions for sampling from a Stan model.

    Reference: mici/interop.py:375-414.  ``model`` should be a
    ``bridgestan``-style object exposing ``log_density_gradient`` /
    ``param_unc_num`` (and optionally ``param_constrain`` /
    ``param_names`` for constrained-parameter tracing).
    """
    import jax
    import jax.numpy as jnp

    dim = model.param_unc_num()
    dtype = np.dtype(jnp.result_type(float))

    def _host_val_and_grad(q):
        val, grad = model.log_density_gradient(np.asarray(q, np.float64))
        return np.asarray(-val, dtype), np.asarray(-grad, dtype)

    neg_log_dens, grad_neg_log_dens = make_callback_grad_neg_log_dens(
        _host_val_and_grad, dim, dtype,
    )

    # Constrained-parameter tracing (mici/interop.py:398-411): bridgestan
    # exposes the constraining transform as ``param_constrain``.
    can_constrain = hasattr(model, "param_constrain") and hasattr(
        model, "param_num",
    )
    if can_constrain:
        n_param = int(model.param_num())

        def _host_constrain(q):
            return np.asarray(
                model.param_constrain(np.asarray(q, np.float64)), dtype,
            )

        def trace_func(state):
            params = jax.pure_callback(
                _host_constrain,
                jax.ShapeDtypeStruct((n_param,), dtype),
                state.pos,
                vmap_method="sequential",
            )
            return {
                "pos": state.pos,
                "params": params,
                "lp": -neg_log_dens(state.pos),
            }
    else:
        def trace_func(state):
            return {"pos": state.pos, "lp": -neg_log_dens(state.pos)}

    return neg_log_dens, grad_neg_log_dens, trace_func


def sample_stan_model(model_code_or_model, data=None, *, num_samples=1000,
                      num_warmup=1000, num_chains=4, save_warmup=False,
                      metric="diag_e", stepsize=1.0, adapt_engaged=True,
                      delta=0.8, gamma=0.05, kappa=0.75, t0=10,
                      init_buffer=75, term_buffer=50, window=25,
                      max_depth=10, seed=None, return_inferencedata=False,
                      display_progress=True):
    """Generate samples from a Stan model (CmdStan-style arguments).

    Reference: mici/interop.py:417-557.  The full CmdStan adaptation
    argument surface is mirrored: ``metric`` selects the adapted metric
    representation, ``delta``/``gamma``/``kappa``/``t0`` parameterize dual
    averaging, and ``init_buffer``/``term_buffer``/``window`` parameterize
    the Stan-style windowed warm-up schedule.  Models are bridged through
    ``bridgestan`` (preferred) or any object exposing the bridgestan model
    interface.

    Args:
        model_code_or_model: Path to a ``.stan`` file (compiled with
            ``bridgestan``), or a prebuilt bridgestan-style model object.
        data: Data dictionary / path for the model (when compiling).
        num_samples: Non-warm-up iterations per chain.
        num_warmup: Warm-up iterations per chain.
        num_chains: Number of Markov chains.
        save_warmup: Record warm-up traces/statistics.
        metric: One of ``"unit_e"``, ``"diag_e"``, ``"dense_e"``.
        stepsize: Initial integrator step size.
        adapt_engaged: Whether warm-up adaptation is enabled.
        delta: Adaptation target acceptance statistic.
        gamma: Adaptation regularization scale.
        kappa: Adaptation relaxation exponent.
        t0: Adaptation iteration offset.
        init_buffer: Width of initial fast adaptation interval.
        term_buffer: Width of final fast adaptation interval.
        window: Initial width of slow adaptation interval.
        max_depth: Maximum NUTS trajectory tree depth.
        seed: Seed for the NumPy generator deriving the PRNG key.
        return_inferencedata: Return an ``arviz.InferenceData``.
        display_progress: Whether to display progress bars.

    Returns:
        Dict mapping traced variable names to stacked ``(chains, draws,
        ...)`` arrays, or an ``arviz.InferenceData`` when
        ``return_inferencedata=True``.
    """
    from mici_tpu import integrators as _integrators
    from mici_tpu import samplers as _samplers
    from mici_tpu import systems as _systems

    if return_inferencedata and importlib.util.find_spec("arviz") is None:
        msg = "Cannot return InferenceData as ArviZ is not installed"
        raise ValueError(msg)
    # Validates `metric` regardless of adapt_engaged (reference behavior).
    adapters, stager = resolve_stan_adaptation(
        metric, adapt_engaged, delta=delta, gamma=gamma, kappa=kappa,
        t0=t0, init_buffer=init_buffer, term_buffer=term_buffer,
        window=window,
    )

    if isinstance(model_code_or_model, str):
        bridgestan = _require("bridgestan")
        model = bridgestan.StanModel.from_stan_file(
            model_code_or_model, data,
        )
    else:
        model = model_code_or_model
    neg_log_dens, grad_neg_log_dens, trace_func = (
        construct_stan_model_functions(model)
    )
    system = _systems.EuclideanMetricSystem(
        neg_log_dens, grad_neg_log_dens=grad_neg_log_dens,
    )
    integrator = _integrators.LeapfrogIntegrator(system, step_size=stepsize)
    rng = np.random.default_rng(seed)
    sampler = _samplers.DynamicMultinomialHMC(
        system, integrator, int(rng.integers(2**31 - 1)),
        max_tree_depth=max_depth,
    )

    dim_u = model.param_unc_num()
    init_states = rng.uniform(-2, 2, size=(num_chains, dim_u))

    out = sampler.sample_chains(
        num_warmup, num_samples, init_states,
        adapters=adapters,
        stager=stager,
        trace_funcs=[trace_func],
        display_progress=display_progress,
        monitor_stats=["accept_stat", "n_step", "diverging"],
        trace_warm_up=save_warmup,
    )

    if return_inferencedata:
        return convert_to_inference_data(
            out.traces, out.statistics, energy_key=None,
        )
    return {key: np.asarray(val) for key, val in out.traces.items()}
