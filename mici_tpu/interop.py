"""Utilities for interfacing with external probabilistic programming libraries.

Reference: mici/interop.py (557 LoC): ArviZ conversion, PyMC drop-in
``sample`` replacement and Stan model sampling.  All bridges gate on
optional dependencies exactly like the reference (mici/interop.py:20-52);
the PyMC/Stan bridges construct JAX-callable density functions via each
library's compiled functions wrapped with ``jax.pure_callback`` so the
sampling loop itself still runs compiled on device.
"""

from __future__ import annotations

import numpy as np


def _require(module_name):
    try:
        return __import__(module_name)
    except ImportError as e:  # pragma: no cover - optional dependency
        msg = (
            f"{module_name} must be installed to use this function. "
        )
        raise ImportError(msg) from e


def convert_to_inference_data(traces, stats, energy_key="hamiltonian",
                              lp_key="lp"):
    """Convert chain trace and statistics data to an ArviZ InferenceData.

    Reference: mici/interop.py:54-96.

    Args:
        traces: Traces dict from a ``sample_chains`` call: arrays (or lists
            of per-chain arrays) of shape ``(n_chain, n_iter, ...)``.
        stats: Statistics dict from a ``sample_chains`` call.
        energy_key: Trace key treated as the energy sample statistic.
        lp_key: Trace key treated as the log-probability sample statistic.

    Returns:
        ``arviz.InferenceData`` with posterior and sample_stats groups.
    """
    az = _require("arviz")
    posterior = {}
    sample_stats = {}
    for key, val in traces.items():
        arr = np.asarray(val)
        if key == energy_key:
            sample_stats["energy"] = arr
        elif key == lp_key:
            sample_stats["lp"] = arr
        else:
            posterior[key] = arr
    rename = {
        "accept_stat": "acceptance_rate",
        "n_step": "n_steps",
        "tree_depth": "tree_depth",
        "diverging": "diverging",
        "step_size": "step_size",
    }
    for key, val in stats.items():
        name = rename.get(key, key)
        sample_stats[name] = np.asarray(val)
    return az.from_dict(posterior=posterior, sample_stats=sample_stats)


def convert_to_data_tree(traces, stats, **kwargs):
    """Convert chain data to an ArviZ DataTree (arviz >= 1.0).

    Reference: mici/interop.py:99-143.
    """
    return convert_to_inference_data(traces, stats, **kwargs)


def construct_pymc_model_functions(model):
    """Construct functions for sampling from a PyMC model.

    Reference: mici/interop.py:146-197.  Returns ``(neg_log_dens,
    grad_neg_log_dens, trace_func)`` operating on the flat unconstrained
    parameter vector; the PyMC-compiled logp/dlogp callables are exposed to
    compiled sampling code through ``jax.pure_callback``.
    """
    import jax
    import jax.numpy as jnp

    _require("pymc")

    logp_dlogp_fn = model.logp_dlogp_function(mode="FAST_RUN")
    logp_dlogp_fn.set_extra_values({})
    dim = logp_dlogp_fn.size
    dtype = np.float64

    def _host_val_and_grad(q):
        val, grad = logp_dlogp_fn(np.asarray(q, dtype))
        return np.asarray(-val, dtype), np.asarray(-grad, dtype)

    def grad_neg_log_dens(q):
        val_shape = jax.ShapeDtypeStruct((), dtype)
        grad_shape = jax.ShapeDtypeStruct((dim,), dtype)
        val, grad = jax.pure_callback(
            _host_val_and_grad, (val_shape, grad_shape), q,
            vmap_method="sequential",
        )
        return grad, val

    def neg_log_dens(q):
        return grad_neg_log_dens(q)[1]

    var_names = [v.name for v in model.value_vars]

    def trace_func(state):
        return {"pos": state.pos, **{
            name: val for name, val in zip(
                var_names, _split_flat(state.pos, model),
            )
        }}

    return neg_log_dens, grad_neg_log_dens, trace_func


def _split_flat(pos, model):
    """Split flat parameter vector according to PyMC value var shapes."""
    import jax.numpy as jnp

    parts = []
    offset = 0
    for var in model.value_vars:
        shape = tuple(
            int(s) for s in model.initial_point()[var.name].shape
        )
        size = int(np.prod(shape)) if shape else 1
        parts.append(jnp.reshape(pos[offset:offset + size], shape))
        offset += size
    return parts


def sample_pymc_model(model, *, draws=1000, tune=1000, chains=4,
                      random_seed=None, progressbar=True,
                      init="auto", jitter_max_retries=10, return_inferencedata=False,
                      target_accept=0.8, max_treedepth=10):
    """Generate approximate samples from posterior defined by a PyMC model.

    Drop-in replacement for ``pymc.sample`` using the TPU-native dynamic
    multinomial HMC sampler.  Reference: mici/interop.py:200-351.
    """
    import jax.numpy as jnp

    from mici_tpu import adapters as _adapters
    from mici_tpu import integrators as _integrators
    from mici_tpu import samplers as _samplers
    from mici_tpu import systems as _systems

    pm = _require("pymc")

    with model:
        neg_log_dens, grad_neg_log_dens, trace_func = (
            construct_pymc_model_functions(model)
        )
        system = _systems.EuclideanMetricSystem(
            neg_log_dens, grad_neg_log_dens=grad_neg_log_dens,
        )
        integrator = _integrators.LeapfrogIntegrator(system)
        seed = 0 if random_seed is None else random_seed
        sampler = _samplers.DynamicMultinomialHMC(
            system, integrator, seed, max_tree_depth=max_treedepth,
        )
        point = model.initial_point()
        flat = np.concatenate([
            np.asarray(point[v.name], np.float64).ravel()
            for v in model.value_vars
        ])
        rng = np.random.default_rng(seed)
        init_states = [
            flat + 0.9 * rng.standard_normal(flat.shape)
            for _ in range(chains)
        ]
        out = sampler.sample_chains(
            tune, draws, init_states,
            adapters=[
                _adapters.DualAveragingStepSizeAdapter(target_accept),
                _adapters.OnlineVarianceMetricAdapter(),
            ],
            display_progress=progressbar,
        )
    if return_inferencedata:
        return convert_to_inference_data(out.traces, out.statistics)
    return out


def construct_stan_model_functions(model):
    """Construct functions for sampling from a Stan model.

    Reference: mici/interop.py:375-414.  ``model`` should be a
    ``bridgestan``-style object exposing ``log_density_gradient`` /
    ``param_unc_num``.
    """
    import jax
    import jax.numpy as jnp

    dim = model.param_unc_num()
    dtype = np.float64

    def _host_val_and_grad(q):
        val, grad = model.log_density_gradient(np.asarray(q, dtype))
        return np.asarray(-val, dtype), np.asarray(-grad, dtype)

    def grad_neg_log_dens(q):
        val_shape = jax.ShapeDtypeStruct((), dtype)
        grad_shape = jax.ShapeDtypeStruct((dim,), dtype)
        val, grad = jax.pure_callback(
            _host_val_and_grad, (val_shape, grad_shape), q,
            vmap_method="sequential",
        )
        return grad, val

    def neg_log_dens(q):
        return grad_neg_log_dens(q)[1]

    def trace_func(state):
        return {"pos": state.pos}

    return neg_log_dens, grad_neg_log_dens, trace_func


def sample_stan_model(model_code_or_model, data=None, *, num_samples=1000,
                      num_warmup=1000, num_chains=4, seed=None,
                      adapt_delta=0.8, max_depth=10, display_progress=True):
    """Generate samples from a Stan model (CmdStan-style arguments).

    Reference: mici/interop.py:417-557.  Requires ``bridgestan`` (preferred)
    or an object exposing the bridgestan model interface.
    """
    from mici_tpu import adapters as _adapters
    from mici_tpu import integrators as _integrators
    from mici_tpu import samplers as _samplers
    from mici_tpu import systems as _systems

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
    integrator = _integrators.LeapfrogIntegrator(system)
    sampler = _samplers.DynamicMultinomialHMC(
        system, integrator, 0 if seed is None else seed,
        max_tree_depth=max_depth,
    )
    dim = model.param_unc_num()
    rng = np.random.default_rng(seed)
    init_states = [
        rng.standard_normal(dim) for _ in range(num_chains)
    ]
    return sampler.sample_chains(
        num_warmup, num_samples, init_states,
        adapters=[
            _adapters.DualAveragingStepSizeAdapter(adapt_delta),
            _adapters.OnlineVarianceMetricAdapter(),
        ],
        display_progress=display_progress,
    )
