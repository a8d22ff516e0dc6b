"""Matmul-precision policy tests (mici_tpu/precision.py).

On TPU the default matmul precision computes f32 dots in bfloat16,
which breaks the implicit-integrator fixed-point solves (measured:
27% solver-failure rate / 0.67 acceptance on BASELINE config 3 at
default precision vs 0.988 at ``highest`` — docs/BENCHMARKS.md round-3
note).  These tests pin the policy plumbing: the compiled engine must
trace its dot operations at the policy precision.
"""

import contextlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mici_tpu import precision, samplers, systems
from mici_tpu.states import ChainState


def test_default_policy_is_highest():
    assert precision.get_matmul_precision() == "highest"


def test_set_and_scope_roundtrip():
    try:
        precision.set_matmul_precision("default")
        assert isinstance(
            precision.matmul_precision_scope(),
            contextlib.nullcontext,
        )
        precision.set_matmul_precision("bfloat16")
        with precision.matmul_precision_scope():
            jaxpr = jax.make_jaxpr(lambda a, b: a @ b)(
                jnp.ones((2, 2)), jnp.ones((2, 2)),
            )
        assert "DEFAULT" in str(jaxpr)  # bfloat16 == hardware default
    finally:
        precision.set_matmul_precision("highest")
    assert precision.get_matmul_precision() == "highest"


def test_engine_precision_wrapper_traces_highest():
    wrapped = samplers._engine_precision(lambda a, b: a @ b)
    jaxpr = jax.make_jaxpr(wrapped)(jnp.ones((3, 3)), jnp.ones((3, 3)))
    assert "HIGHEST" in str(jaxpr)


def test_momentum_batch_program_uses_highest_precision():
    """The compiled momentum-sampling program (dense metric: a Cholesky
    triangular matmul against the noise draw) carries the policy
    precision on its dot operations."""
    dim = 3
    rng = np.random.default_rng(0)
    a = rng.standard_normal((dim, dim))
    metric = a @ a.T + dim * np.eye(dim)

    system = systems.EuclideanMetricSystem(
        lambda q: 0.5 * q @ q, metric=jnp.asarray(metric, jnp.float32),
    )
    states = jax.vmap(
        lambda q: system.prepare_state(
            ChainState(pos=q, mom=jnp.zeros_like(q), dir=1),
        ),
    )(jnp.zeros((4, dim), jnp.float32))
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    text = samplers._sample_momenta_batch.lower(
        system, states, keys,
    ).as_text()
    assert "HIGHEST" in text


@pytest.mark.parametrize("bad", ["HIGH", 17])
def test_scope_rejects_invalid_values(bad):
    precision.set_matmul_precision(bad)
    try:
        with pytest.raises(Exception):
            with precision.matmul_precision_scope():
                pass
    finally:
        precision.set_matmul_precision("highest")
