"""Tests for profiling utilities (trace-time call counting)."""

import jax
import jax.numpy as jnp

from mici_tpu import integrators, systems
from mici_tpu.profiling import CallCounter, compiled_cost, count_traced_calls
from mici_tpu.states import ChainState


def test_count_traced_calls_leapfrog():
    nld = CallCounter(lambda q: 0.25 * jnp.sum(q**4), "neg_log_dens")
    system = systems.EuclideanMetricSystem(nld)
    integrator = integrators.LeapfrogIntegrator(system, 0.1)

    def run(pos, mom):
        state = system.prepare_state(ChainState(pos=pos, mom=mom, dir=1))
        for _ in range(5):
            state = integrator.step(state)
        return state.pos

    counts = count_traced_calls(
        run, jnp.zeros(3), jnp.ones(3), counters=[nld])
    # one evaluation per position: 1 prepare + 5 steps
    assert counts["neg_log_dens"] == 6


def test_compiled_cost():
    def f(x):
        return (x @ x.T).sum()

    cost = compiled_cost(f, jnp.ones((64, 64)))
    assert isinstance(cost, dict)


def test_compile_telemetry_counts_compiles():
    from mici_tpu.profiling import compile_telemetry

    @jax.jit
    def g(x):
        return x * 3.0 + 1.0

    x = jnp.ones(5)  # auxiliary compiles (array creation) happen here
    with compile_telemetry() as tele:
        g(x).block_until_ready()   # compile (cache miss)
        g(x).block_until_ready()   # cache hit: no compile
    assert tele.n_compiles >= 1
    assert tele.compile_seconds_total > 0
    assert tele.n_traces >= 1
    assert tele.summary()["n_compiles"] == tele.n_compiles

    with compile_telemetry() as tele2:
        g(x).block_until_ready()   # still cached
    assert tele2.n_compiles == 0
