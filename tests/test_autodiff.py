"""AD operator conformance tests.

Mirrors reference test strategy (mici tests/test_autodiff.py:157-332): each
of the six DIFF_OPS evaluated on analytic functions with hand-coded
derivative oracles.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mici_tpu import autodiff

SEED = 42
DIM = 3


def f_quartic(q):
    return 0.25 * jnp.sum(q**4)


def grad_quartic(q):
    return q**3


def hess_quartic(q):
    return np.diag(3 * q**2)


def tress_quartic(q):
    t = np.zeros((DIM, DIM, DIM))
    for i in range(DIM):
        t[i, i, i] = 6 * q[i]
    return t


def c_vector(q):
    # vector function R^3 -> R^2
    return jnp.array([jnp.sum(q**2) - 1.0, q[0] * q[1]])


def jac_vector(q):
    return np.array([
        2 * q,
        [q[1], q[0], 0.0],
    ])


def hess_vector(q):
    h = np.zeros((2, DIM, DIM))
    h[0] = 2 * np.eye(DIM)
    h[1, 0, 1] = h[1, 1, 0] = 1.0
    return h


@pytest.fixture
def q():
    return np.random.default_rng(SEED).standard_normal(DIM)


def test_grad_and_value(q):
    grad, val = autodiff.grad_and_value(f_quartic)(jnp.asarray(q))
    np.testing.assert_allclose(val, 0.25 * np.sum(q**4), rtol=1e-10)
    np.testing.assert_allclose(grad, grad_quartic(q), rtol=1e-10)


def test_vjp_and_value(q):
    vjp, val = autodiff.vjp_and_value(c_vector)(jnp.asarray(q))
    np.testing.assert_allclose(val, np.asarray(c_vector(jnp.asarray(q))),
                               rtol=1e-10)
    v = np.array([0.3, -1.2])
    np.testing.assert_allclose(
        vjp(v), v @ jac_vector(q), rtol=1e-10)


def test_jacobian_and_value(q):
    jac, val = autodiff.jacobian_and_value(c_vector)(jnp.asarray(q))
    np.testing.assert_allclose(jac, jac_vector(q), rtol=1e-10)
    np.testing.assert_allclose(val, np.asarray(c_vector(jnp.asarray(q))),
                               rtol=1e-10)


def test_mhp_jacobian_and_value(q):
    mhp, jac, val = autodiff.mhp_jacobian_and_value(c_vector)(
        jnp.asarray(q))
    np.testing.assert_allclose(jac, jac_vector(q), rtol=1e-10)
    m = np.random.default_rng(SEED + 1).standard_normal((2, DIM))
    expected = np.einsum("ij,ijk->k", m, hess_vector(q))
    np.testing.assert_allclose(mhp(m), expected, rtol=1e-9, atol=1e-12)


def test_hessian_grad_and_value(q):
    hess, grad, val = autodiff.hessian_grad_and_value(f_quartic)(
        jnp.asarray(q))
    np.testing.assert_allclose(hess, hess_quartic(q), rtol=1e-10)
    np.testing.assert_allclose(grad, grad_quartic(q), rtol=1e-10)
    np.testing.assert_allclose(val, 0.25 * np.sum(q**4), rtol=1e-10)


def test_mtp_hessian_grad_and_value(q):
    mtp, hess, grad, val = autodiff.mtp_hessian_grad_and_value(f_quartic)(
        jnp.asarray(q))
    np.testing.assert_allclose(hess, hess_quartic(q), rtol=1e-10)
    m = np.random.default_rng(SEED + 2).standard_normal((DIM, DIM))
    expected = np.einsum("ij,ijk->k", m, tress_quartic(q))
    np.testing.assert_allclose(mtp(m), expected, rtol=1e-9, atol=1e-12)


def test_autodiff_fallback_uses_user_function(q):
    marker = object()

    def user_fn(pos):
        return marker

    out = autodiff.autodiff_fallback(
        user_fn, f_quartic, "grad_and_value", "grad", None)
    assert out is user_fn


def test_autodiff_fallback_unknown_backend():
    with pytest.raises(ValueError):
        autodiff.autodiff_fallback(
            None, f_quartic, "grad_and_value", "grad", "not_a_backend")


def test_autodiff_fallback_unknown_op():
    with pytest.raises(ValueError):
        autodiff.autodiff_fallback(
            None, f_quartic, "not_an_op", "grad", None)


def test_register_backend(q):
    custom = dict(autodiff.BACKENDS["jax"])
    autodiff.register_backend("custom_test", custom)
    fn = autodiff.autodiff_fallback(
        None, f_quartic, "grad_and_value", "grad", "custom_test")
    grad, val = fn(jnp.asarray(q))
    np.testing.assert_allclose(grad, grad_quartic(q), rtol=1e-10)
    with pytest.raises(ValueError):
        autodiff.register_backend("incomplete", {"grad_and_value": None})


def test_wrap_function_unknown_backend():
    with pytest.raises(ValueError, match="not.*registered"):
        autodiff.wrap_function(f_quartic, backend="not_a_backend")


def test_wrap_function_registered_backends_identity():
    for backend in (None, "jax", "jax_nojit"):
        assert autodiff.wrap_function(f_quartic, backend) is f_quartic


# ---------------------------------------------------------------------------
# torch backend (the second, foreign-framework backend; analogue of the
# reference's autograd backend, mici/autodiff/autograd_wrapper.py)
# ---------------------------------------------------------------------------

torch = pytest.importorskip("torch")


def t_quartic(t):
    return 0.25 * torch.sum(t**4)


def t_vector(t):
    return torch.stack([torch.sum(t**2) - 1.0, t[0] * t[1]])


def test_torch_backend_registered():
    assert "torch" in autodiff.BACKENDS


def test_torch_grad_and_value(q):
    fn = autodiff.autodiff_fallback(
        None, t_quartic, "grad_and_value", "grad", "torch")
    grad, val = fn(jnp.asarray(q))
    np.testing.assert_allclose(grad, grad_quartic(q), rtol=1e-6)
    np.testing.assert_allclose(val, 0.25 * np.sum(q**4), rtol=1e-6)


def test_torch_vjp_and_value(q):
    vjp, val = autodiff.BACKENDS["torch"]["vjp_and_value"](t_vector)(
        jnp.asarray(q))
    np.testing.assert_allclose(val, np.asarray(c_vector(q)), rtol=1e-6)
    ct = np.array([2.0, -1.0])
    np.testing.assert_allclose(
        vjp(ct), ct @ jac_vector(q), rtol=1e-6)


def test_torch_jacobian_and_value(q):
    jac, val = autodiff.BACKENDS["torch"]["jacobian_and_value"](t_vector)(
        jnp.asarray(q))
    np.testing.assert_allclose(jac, jac_vector(q), rtol=1e-6)


def test_torch_mhp_jacobian_and_value(q):
    mhp, jac, val = autodiff.BACKENDS["torch"]["mhp_jacobian_and_value"](
        t_vector)(jnp.asarray(q))
    np.testing.assert_allclose(jac, jac_vector(q), rtol=1e-6)
    m = np.random.default_rng(SEED + 1).standard_normal((2, DIM))
    expected = np.einsum("ij,ijk->k", m, hess_vector(q))
    np.testing.assert_allclose(mhp(m), expected, rtol=1e-6, atol=1e-10)


def test_torch_hessian_grad_and_value(q):
    hess, grad, val = autodiff.BACKENDS["torch"][
        "hessian_grad_and_value"](t_quartic)(jnp.asarray(q))
    np.testing.assert_allclose(hess, hess_quartic(q), rtol=1e-6)
    np.testing.assert_allclose(grad, grad_quartic(q), rtol=1e-6)


def test_torch_mtp_hessian_grad_and_value(q):
    mtp, hess, grad, val = autodiff.BACKENDS["torch"][
        "mtp_hessian_grad_and_value"](t_quartic)(jnp.asarray(q))
    np.testing.assert_allclose(hess, hess_quartic(q), rtol=1e-6)
    m = np.random.default_rng(SEED + 2).standard_normal((DIM, DIM))
    expected = np.einsum("ij,ijk->k", m, tress_quartic(q))
    np.testing.assert_allclose(mtp(m), expected, rtol=1e-6, atol=1e-10)


def test_torch_backend_end_to_end_sampling(q):
    """A torch-written model samples through the compiled HMC driver."""
    from mici_tpu import integrators, samplers, systems

    def torch_nld(t):
        return 0.5 * torch.sum(t**2)

    system = systems.EuclideanMetricSystem(torch_nld, backend="torch")
    integ = integrators.LeapfrogIntegrator(system, step_size=0.5)
    sampler = samplers.StaticMetropolisHMC(system, integ, 42, n_step=4)
    out = sampler.sample_chains(
        0, 30, [q, -q], adapters=None, display_progress=False,
    )
    pos = np.asarray(out.traces["pos"])
    assert pos.shape == (2, 30, DIM)
    assert np.all(np.isfinite(pos))
    assert not np.allclose(pos[:, 0], pos[:, -1])
