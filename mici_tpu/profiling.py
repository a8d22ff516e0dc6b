"""Profiling utilities: model-evaluation counting and compiled-cost queries.

Reference: mici/states.py:48-71, :204-213 — the reference threads a
``_call_counts`` dict through chain states so every memoized system method
increments a counter, giving a built-in gradient-evaluation profiler.

Under ``jit`` the notion of a per-iteration *runtime* call count is
determined at trace time, so the TPU-native equivalents are:

* :class:`CallCounter` / :func:`count_traced_calls` — count how many times
  model functions are evaluated in the *traced program* (e.g. asserting one
  gradient evaluation per leapfrog step, as the reference's cache tests
  do);
* :func:`compiled_cost` — XLA's cost analysis (FLOPs, bytes accessed) of a
  compiled function, the hardware-level analogue of call counting.
"""

from __future__ import annotations

import functools

import jax


class CallCounter:
    """Wrap a function, counting invocations (trace-time under jit)."""

    def __init__(self, func, name=None):
        self.func = func
        self.name = name or getattr(func, "__name__", "function")
        self.count = 0
        functools.update_wrapper(self, func)

    def __call__(self, *args, **kwargs):
        self.count += 1
        return self.func(*args, **kwargs)

    def reset(self):
        self.count = 0


def count_traced_calls(fn, *example_args, counters):
    """Trace ``fn`` once and report each counter's number of evaluations.

    Args:
        fn: Function to trace (e.g. an integrator step closed over a
            system whose ``neg_log_dens`` is a :class:`CallCounter`).
        example_args: Abstract or concrete example arguments.
        counters: Iterable of :class:`CallCounter` objects to report.

    Returns:
        Dict mapping counter name to number of evaluations in the traced
        program.
    """
    for counter in counters:
        counter.reset()
    jax.make_jaxpr(fn)(*example_args)
    return {counter.name: counter.count for counter in counters}


def compiled_cost(fn, *example_args, static_argnums=()):
    """Compile ``fn`` and return XLA's cost analysis dictionary.

    Typical keys include ``flops`` and ``bytes accessed``; availability
    depends on backend.
    """
    lowered = jax.jit(fn, static_argnums=static_argnums).lower(
        *example_args,
    )
    compiled = lowered.compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0] if analysis else {}
    return dict(analysis or {})
