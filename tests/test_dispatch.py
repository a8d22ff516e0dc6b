"""Tests for the batch-aware Pallas dispatch layer (mici_tpu.ops.dispatch).

The kernel path is forced on the CPU test backend (Pallas interpreter mode)
via ``ops.force_dispatch("kernel")`` and checked A/B against the XLA path
on identical inputs — both for the raw dispatched ops and end-to-end
through the vmapped dense-metric sampler hot path the dispatch exists for
(reference hot path: mici/matrices.py:1163-1173).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mici_tpu import integrators, matrices, ops, systems
from mici_tpu.ops import dispatch
from mici_tpu.states import ChainState

SEED = 20260816
DIM = 6
BATCH = 8


def _spd_batch(b, n, seed=SEED):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((b, n, n))
    return np.einsum("bij,bkj->bik", a, a) + n * np.eye(n)


def test_cholesky_unbatched_matches_xla():
    spd = _spd_batch(1, DIM)[0]
    out = dispatch.cholesky(jnp.asarray(spd))
    np.testing.assert_allclose(out, np.linalg.cholesky(spd), atol=1e-10)


def test_cholesky_gradient_matches_native():
    spd = jnp.asarray(_spd_batch(1, DIM)[0])
    w = jnp.arange(1.0, DIM * DIM + 1).reshape(DIM, DIM)
    g = jax.grad(lambda m: jnp.sum(dispatch.cholesky(m) ** 2 * w))(spd)
    g_ref = jax.grad(lambda m: jnp.sum(jnp.linalg.cholesky(m) ** 2 * w))(spd)
    np.testing.assert_allclose(g, g_ref, atol=1e-12)


@pytest.mark.parametrize("mode", ["kernel", "xla"])
def test_cholesky_vmapped(mode):
    spds = jnp.asarray(_spd_batch(BATCH, DIM))
    with ops.force_dispatch(mode):
        out = jax.vmap(dispatch.cholesky)(spds)
    np.testing.assert_allclose(out, np.linalg.cholesky(spds), atol=1e-9)


def test_cholesky_vmapped_grad_kernel_matches_xla():
    spds = jnp.asarray(_spd_batch(BATCH, DIM))
    w = jnp.arange(1.0, DIM * DIM + 1).reshape(DIM, DIM)

    def loss(m):
        return jnp.sum(dispatch.cholesky(m) ** 2 * w)

    with ops.force_dispatch("kernel"):
        gk = jax.vmap(jax.grad(loss))(spds)
    with ops.force_dispatch("xla"):
        gx = jax.vmap(jax.grad(loss))(spds)
    np.testing.assert_allclose(gk, gx, atol=1e-9)


def test_cholesky_explicit_batch_dispatch():
    """Explicitly batched (B, N, N) input also routes through dispatch."""
    spds = jnp.asarray(_spd_batch(BATCH, DIM))
    with ops.force_dispatch("kernel"):
        out = dispatch.cholesky(spds)
    np.testing.assert_allclose(out, np.linalg.cholesky(spds), atol=1e-9)


@pytest.mark.parametrize("lower", [True, False])
@pytest.mark.parametrize("trans", [True, False])
@pytest.mark.parametrize("mode", ["kernel", "xla"])
def test_solve_triangular_vec_combinations(lower, trans, mode):
    tril = np.linalg.cholesky(_spd_batch(BATCH, DIM))
    tri = tril if lower else np.swapaxes(tril, -2, -1)
    rng = np.random.default_rng(SEED + 1)
    rhs = rng.standard_normal((BATCH, DIM))
    with ops.force_dispatch(mode):
        out = jax.vmap(
            lambda a, b: dispatch.solve_triangular_vec(
                a, b, lower=lower, trans=trans,
            ),
        )(jnp.asarray(tri), jnp.asarray(rhs))
    op = np.swapaxes(tri, -2, -1) if trans else tri
    ref = np.stack([np.linalg.solve(op[i], rhs[i]) for i in range(BATCH)])
    np.testing.assert_allclose(out, ref, atol=1e-9)


@pytest.mark.parametrize("trans", [True, False])
def test_solve_triangular_vec_grads_kernel_matches_xla(trans):
    tril = jnp.asarray(np.linalg.cholesky(_spd_batch(BATCH, DIM)))
    rng = np.random.default_rng(SEED + 2)
    rhs = jnp.asarray(rng.standard_normal((BATCH, DIM)))

    def loss(a, b):
        x = dispatch.solve_triangular_vec(a, b, lower=True, trans=trans)
        return jnp.sum(x ** 2 * jnp.arange(1.0, DIM + 1))

    with ops.force_dispatch("kernel"):
        gk = jax.vmap(jax.grad(loss, argnums=(0, 1)))(tril, rhs)
    with ops.force_dispatch("xla"):
        gx = jax.vmap(jax.grad(loss, argnums=(0, 1)))(tril, rhs)
    np.testing.assert_allclose(gk[0], gx[0], atol=1e-9)
    np.testing.assert_allclose(gk[1], gx[1], atol=1e-9)


def test_solve_triangular_matrix_gradient_masked_to_read_triangle():
    """The adjoint wrt the matrix is supported on the read triangle only."""
    tril = jnp.asarray(np.linalg.cholesky(_spd_batch(1, DIM))[0])
    rng = np.random.default_rng(SEED + 3)
    rhs = jnp.asarray(rng.standard_normal(DIM))

    def loss(a):
        return jnp.sum(
            dispatch.solve_triangular_vec(a, rhs, lower=True) ** 2,
        )

    g = jax.grad(loss)(tril)
    np.testing.assert_allclose(g, jnp.tril(g))
    g_ref = jax.grad(
        lambda a: jnp.sum(jnp.linalg.solve(a, rhs) ** 2),
    )(tril)
    np.testing.assert_allclose(g, np.tril(np.asarray(g_ref)), atol=1e-10)


def test_constant_matrix_batched_rhs():
    """Unbatched matrix under vmap broadcasts without materializing."""
    spd = jnp.asarray(_spd_batch(1, DIM)[0])
    rng = np.random.default_rng(SEED + 4)
    rhs = rng.standard_normal((BATCH, DIM))
    tril = jnp.asarray(np.linalg.cholesky(np.asarray(spd)))
    out = jax.vmap(
        lambda b: dispatch.solve_triangular_vec(tril, b, lower=True),
    )(jnp.asarray(rhs))
    ref = np.linalg.solve(np.asarray(tril), rhs.T).T
    np.testing.assert_allclose(out, ref, atol=1e-10)


def test_constant_rhs_batched_matrix():
    trils = jnp.asarray(np.linalg.cholesky(_spd_batch(BATCH, DIM)))
    rng = np.random.default_rng(SEED + 5)
    rhs = jnp.asarray(rng.standard_normal(DIM))
    with ops.force_dispatch("kernel"):
        out = jax.vmap(
            lambda a: dispatch.solve_triangular_vec(a, rhs, lower=True),
        )(trils)
    ref = np.stack([
        np.linalg.solve(np.asarray(trils)[i], np.asarray(rhs))
        for i in range(BATCH)
    ])
    np.testing.assert_allclose(out, ref, atol=1e-9)


def test_force_dispatch_validates_mode():
    with pytest.raises(ValueError):
        with ops.force_dispatch("bogus"):
            pass


# ---------------------------------------------------------------------------
# End-to-end: vmapped dense-Riemannian hot path, kernel vs XLA
# ---------------------------------------------------------------------------


def _dense_system():
    def neg_log_dens(q):
        return 0.5 * jnp.sum(q ** 2) + 0.25 * jnp.sum(q ** 4)

    def metric_func(q):
        return (1.0 + 0.5 * jnp.sum(q ** 2)) * jnp.eye(q.shape[0]) \
            + 0.1 * jnp.outer(q, q)

    return systems.DenseRiemannianMetricSystem(neg_log_dens, metric_func)


def _batched_states(system, b=BATCH, seed=SEED):
    rng = np.random.default_rng(seed)
    pos = jnp.asarray(rng.standard_normal((b, DIM)) * 0.4)
    keys = jax.random.split(jax.random.PRNGKey(seed), b)

    def make(p, k):
        state = system.prepare_state(ChainState(pos=p, mom=None, dir=1))
        return state.replace(mom=system.sample_momentum(state, k))

    return jax.vmap(make)(pos, keys)


def test_dense_riemannian_quantities_kernel_matches_xla():
    system = _dense_system()
    states = _batched_states(system)

    def quantities(state):
        return (
            system.h(state),
            system.dh1_dpos(state),
            system.dh2_dpos(state),
            system.dh2_dmom(state),
        )

    with ops.force_dispatch("kernel"):
        qk = jax.vmap(quantities)(states)
    with ops.force_dispatch("xla"):
        qx = jax.vmap(quantities)(states)
    for a, b in zip(qk, qx):
        np.testing.assert_allclose(a, b, atol=1e-8)


def test_dense_riemannian_trajectory_kernel_matches_xla():
    """Implicit-leapfrog trajectories agree between dispatch paths."""
    system = _dense_system()
    integrator = integrators.ImplicitLeapfrogIntegrator(
        system, step_size=0.05,
        fixed_point_solver_kwargs={"convergence_tol": 1e-12},
    )
    states = _batched_states(system)

    def trajectory(state):
        def step(s, _):
            s = integrator.step(s)
            return s, (s.pos, s.mom)

        _, traj = jax.lax.scan(step, state, None, length=5)
        return traj

    with ops.force_dispatch("kernel"):
        tk = jax.jit(jax.vmap(trajectory))(states)
        tk = jax.tree_util.tree_map(np.asarray, tk)
    with ops.force_dispatch("xla"):
        tx = jax.jit(jax.vmap(trajectory))(states)
        tx = jax.tree_util.tree_map(np.asarray, tx)
    np.testing.assert_allclose(tk[0], tx[0], atol=1e-8)
    np.testing.assert_allclose(tk[1], tx[1], atol=1e-8)


# ---------------------------------------------------------------------------
# eigh dispatch (fixed-sweep Jacobi lane kernel, 9 <= n <= 32)
# ---------------------------------------------------------------------------


def _sym_batch(b, n, seed=SEED):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((b, n, n))
    return (a + np.swapaxes(a, -2, -1)) / 2


def test_eigh_unbatched_matches_xla():
    sym = _sym_batch(1, DIM)[0]
    w, v = dispatch.eigh(jnp.asarray(sym))
    w_ref, _v_ref = np.linalg.eigh(sym)
    np.testing.assert_allclose(w, w_ref, atol=1e-10)


@pytest.mark.parametrize("n", [4, 12])
def test_eigh_vmapped_kernel_matches_xla(n):
    sym = jnp.asarray(_sym_batch(BATCH, n))
    with ops.force_dispatch("kernel"):
        w_k, v_k = jax.jit(jax.vmap(dispatch.eigh))(sym)
    w_ref, _ = np.linalg.eigh(np.asarray(sym))
    np.testing.assert_allclose(np.asarray(w_k), w_ref, atol=1e-8)
    # eigenvectors orthonormal + reconstruct the input (sign-invariant)
    recon = np.einsum(
        "bij,bj,bkj->bik", np.asarray(v_k), np.asarray(w_k),
        np.asarray(v_k))
    np.testing.assert_allclose(recon, np.asarray(sym), atol=1e-8)


def test_eigh_gradient_matches_native():
    # Gradient through a sign-invariant function of the decomposition:
    # f(A) = x^T V diag(softplus(w)) V^T y
    sym = jnp.asarray(_sym_batch(1, DIM)[0])
    x = jnp.arange(1.0, DIM + 1)
    y = jnp.ones(DIM) / DIM

    def f(op):
        def inner(m):
            w, v = op(m)
            return x @ (v @ (jnp.logaddexp(0.0, w) * (v.T @ y)))
        return inner

    g = jax.grad(f(dispatch.eigh))(sym)
    g_ref = jax.grad(f(jnp.linalg.eigh))(sym)
    np.testing.assert_allclose(g, g_ref, atol=1e-8)


def test_eigh_vmapped_gradient_kernel_matches_xla():
    n = 4  # small: interpreter-mode Jacobi is expensive
    sym = jnp.asarray(_sym_batch(BATCH, n, seed=SEED + 3))
    x = jnp.arange(1.0, n + 1)

    def loss_with(op):
        def loss(ms):
            def per(m):
                w, v = op(m)
                return x @ (v @ (jnp.logaddexp(0.0, w) * (v.T @ x)))
            return jnp.sum(jax.vmap(per)(ms))
        return loss

    with ops.force_dispatch("kernel"):
        g_k = jax.jit(jax.grad(loss_with(dispatch.eigh)))(sym)
    g_ref = jax.grad(loss_with(jnp.linalg.eigh))(sym)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_ref),
                               atol=1e-7)


def test_cholesky_blocked_mode_matches_xla():
    """force_dispatch("blocked") routes through the blocked composition
    with identical results and gradients (large-N dispatch path)."""
    spd = jnp.asarray(_spd_batch(4, 70, SEED + 21))
    with ops.force_dispatch("blocked"):
        out = jax.vmap(ops.cholesky)(spd)
    np.testing.assert_allclose(
        np.asarray(out), np.linalg.cholesky(np.asarray(spd)), atol=1e-8)

    def loss(m, mode):
        with ops.force_dispatch(mode):
            return jnp.sum(jnp.log(jnp.diagonal(
                jax.vmap(ops.cholesky)(m), axis1=-2, axis2=-1)))

    g_blocked = jax.grad(loss)(spd, "blocked")
    g_xla = jax.grad(loss)(spd, "xla")
    np.testing.assert_allclose(
        np.asarray(g_blocked), np.asarray(g_xla), atol=1e-8)


@pytest.mark.parametrize("trans", [False, True])
def test_solve_triangular_vec_blocked_mode(trans):
    spd = _spd_batch(4, 70, SEED + 22)
    tril = jnp.asarray(np.linalg.cholesky(spd))
    rng = np.random.default_rng(SEED + 23)
    rhs = jnp.asarray(rng.standard_normal((4, 70)))
    with ops.force_dispatch("blocked"):
        out = ops.solve_triangular_vec(tril, rhs, lower=True, trans=trans)
    with ops.force_dispatch("xla"):
        ref = ops.solve_triangular_vec(tril, rhs, lower=True, trans=trans)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-8)


def test_dispatch_size_policy():
    """Auto policy: lane kernel to N=64, blocked to N=512 (batch-gated),
    XLA elsewhere (dispatch.py cutoffs; the N=128 lane-kernel VMEM fault
    motivated the 64 ceiling)."""
    import jax.numpy as jnp_

    from mici_tpu.ops import dispatch as d

    orig = d._bl._on_tpu
    d._bl._on_tpu = lambda: True
    try:
        assert d._use_kernel(1024, 64, jnp_.float32)
        assert not d._use_kernel(1024, 65, jnp_.float32)
        assert not d._use_kernel(64, 64, jnp_.float32)
        assert d._use_blocked(64, 65, jnp_.float32)
        assert d._use_blocked(256, 512, jnp_.float32)
        assert not d._use_blocked(256, 513, jnp_.float32)
        assert not d._use_blocked(32, 256, jnp_.float32)
        assert not d._use_blocked(256, 64, jnp_.float32)
    finally:
        d._bl._on_tpu = orig


def test_eigh_blocked_mode_matches_xla():
    """force_dispatch("blocked") routes dispatch.eigh through the blocked
    block-Jacobi composition with matching values and gradients (the
    large-N SoftAbs dispatch path)."""
    n = 48
    sym = jnp.asarray(_sym_batch(4, n, seed=SEED + 31))
    with ops.force_dispatch("blocked"):
        w_b, v_b = jax.jit(jax.vmap(dispatch.eigh))(sym)
    w_ref, _ = np.linalg.eigh(np.asarray(sym))
    np.testing.assert_allclose(np.asarray(w_b), w_ref, atol=1e-9)
    recon = np.einsum(
        "bij,bj,bkj->bik", np.asarray(v_b), np.asarray(w_b),
        np.asarray(v_b))
    np.testing.assert_allclose(recon, np.asarray(sym), atol=1e-9)

    x = jnp.arange(1.0, n + 1)

    def loss(ms, mode):
        def per(m):
            w, v = dispatch.eigh(m)
            return x @ (v @ (jnp.logaddexp(0.0, w) * (v.T @ x)))
        with ops.force_dispatch(mode):
            return jnp.sum(jax.vmap(per)(ms))

    g_blocked = jax.grad(loss)(sym, "blocked")
    g_xla = jax.grad(loss)(sym, "xla")
    np.testing.assert_allclose(
        np.asarray(g_blocked), np.asarray(g_xla), atol=1e-8)


def test_eigh_blocked_two_separate_jit_traces():
    """Regression: calling the blocked eigh from TWO separate jit traces
    must not leak trace-local constants between traces.

    Round 4 shipped ``_block_jacobi_schedule`` memoizing ``jnp`` arrays
    under ``functools.cache`` — permutation tables created during the
    first trace leaked into the second and crashed with
    ``UnexpectedTracerError``.  This exercises the exact trigger: two
    distinct jitted programs, same (n, half) schedule key."""
    n = 48
    sym = jnp.asarray(_sym_batch(3, n, seed=SEED + 33))

    # Distinct jit caches: two different wrapper functions.
    def first(ms):
        return jax.vmap(dispatch.eigh)(ms)

    def second(ms):
        w, v = jax.vmap(dispatch.eigh)(ms)
        return w + 1.0, v

    with ops.force_dispatch("blocked"):
        w1, _ = jax.jit(first)(sym)
        w2, _ = jax.jit(second)(sym)  # second trace — leak crashed here
    w_ref, _ = np.linalg.eigh(np.asarray(sym))
    np.testing.assert_allclose(np.asarray(w1), w_ref, atol=1e-9)
    np.testing.assert_allclose(np.asarray(w2), w_ref + 1.0, atol=1e-9)

    # The schedule cache itself must hold only host (numpy) arrays.
    from mici_tpu.ops import batched_linalg as bl

    perm, inv = bl._block_jacobi_schedule(64, bl._EIGH_PAIR_HALF)
    assert type(perm).__module__.startswith("numpy")
    assert type(inv).__module__.startswith("numpy")


def test_eigh_dispatch_policy():
    """Auto policy for eigh (round 5, revised by the end-to-end A/B):
    parallel-order scalar Jacobi only in its measured-win region —
    8 < N <= 32 at batch >= 512 on TPU f32 — and XLA everywhere else.
    The first round-5 window (N <= 64 at batch >= 64) extrapolated the
    standalone wins and the softabs_eigh_dim64 artifact row measured
    forced-XLA 4x faster end-to-end at (B=64, N=64).  The Pallas lane
    kernel and the blocked block-Jacobi are force-only (the kernel's
    Mosaic compile blows up at n=32; the blocked path loses to XLA 11x
    at its target regime — measured round 5)."""
    import jax.numpy as jnp_

    from mici_tpu.ops import dispatch as d

    orig = d._bl._on_tpu
    d._bl._on_tpu = lambda: True
    try:
        assert d._use_parallel_eigh(512, 9, jnp_.float32)
        assert d._use_parallel_eigh(512, 32, jnp_.float32)
        assert d._use_parallel_eigh(1024, 16, jnp_.float32)
        assert not d._use_parallel_eigh(512, 33, jnp_.float32)
        assert not d._use_parallel_eigh(64, 64, jnp_.float32)  # the A/B
        assert not d._use_parallel_eigh(511, 32, jnp_.float32)
        assert not d._use_parallel_eigh(512, 8, jnp_.float32)
        assert not d._use_parallel_eigh(512, 32, jnp_.float64)
        # blocked / kernel never auto-selected
        assert not d._use_blocked_eigh(64, 256, jnp_.float32)
        assert not d._use_blocked_eigh(256, 512, jnp_.float32)
        with d.force_dispatch("blocked"):
            assert d._use_blocked_eigh(1, 256, jnp_.float64)
        with d.force_dispatch("parallel"):
            assert d._use_parallel_eigh(1, 256, jnp_.float64)
        with d.force_dispatch("xla"):
            assert not d._use_parallel_eigh(64, 32, jnp_.float32)
    finally:
        d._bl._on_tpu = orig


def test_eigh_parallel_mode_matches_xla():
    """force_dispatch("parallel") routes dispatch.eigh through the
    pure-XLA parallel-order Jacobi with matching values and gradients
    (the auto path for 8 < N <= 64 TPU f32 batches)."""
    n = 24
    sym = jnp.asarray(_sym_batch(6, n, seed=SEED + 37))
    with ops.force_dispatch("parallel"):
        w_p, v_p = jax.jit(jax.vmap(dispatch.eigh))(sym)
    w_ref, _ = np.linalg.eigh(np.asarray(sym))
    np.testing.assert_allclose(np.asarray(w_p), w_ref, atol=1e-9)
    recon = np.einsum(
        "bij,bj,bkj->bik", np.asarray(v_p), np.asarray(w_p),
        np.asarray(v_p))
    np.testing.assert_allclose(recon, np.asarray(sym), atol=1e-9)

    x = jnp.arange(1.0, n + 1)

    def loss(ms, mode):
        def per(m):
            w, v = dispatch.eigh(m)
            return x @ (v @ (jnp.logaddexp(0.0, w) * (v.T @ x)))
        with ops.force_dispatch(mode):
            return jnp.sum(jax.vmap(per)(ms))

    g_parallel = jax.grad(loss)(sym, "parallel")
    g_xla = jax.grad(loss)(sym, "xla")
    np.testing.assert_allclose(
        np.asarray(g_parallel), np.asarray(g_xla), atol=1e-8)


def _tril_batch(b, n, seed=SEED):
    spd = _spd_batch(b, n, seed=seed)
    return np.linalg.cholesky(spd)


@pytest.mark.parametrize("mode", ["kernel", "blocked", "xla"])
def test_tri_inverse_modes_match(mode):
    """All dispatch routes of tri_inverse agree with numpy, values and
    both AD modes (the Cholesky-JVP sandwich runs on this op)."""
    tril = jnp.asarray(_tril_batch(BATCH, DIM, seed=SEED + 40))
    with ops.force_dispatch(mode):
        out = jax.jit(jax.vmap(dispatch.tri_inverse))(tril)
    ref = np.stack([np.linalg.inv(np.asarray(tril)[i]) for i in range(BATCH)])
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-9)

    w = jnp.arange(1.0, DIM * DIM + 1).reshape(DIM, DIM)

    def loss(ls, m):
        with ops.force_dispatch(m):
            return jnp.sum(jax.vmap(dispatch.tri_inverse)(ls) ** 2 * w)

    g = jax.grad(loss)(tril, mode)
    g_ref = jax.grad(loss)(tril, "xla")
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-9)
    # forward mode agrees with reverse-derived jacobian structure
    tang = jnp.ones_like(tril)
    _, jv = jax.jvp(lambda ls: loss(ls, mode), (tril,), (tang,))
    _, jv_ref = jax.jvp(lambda ls: loss(ls, "xla"), (tril,), (tang,))
    np.testing.assert_allclose(float(jv), float(jv_ref), atol=1e-9)


@pytest.mark.parametrize("lower", [True, False])
@pytest.mark.parametrize("trans", [True, False])
@pytest.mark.parametrize("mode", ["kernel", "xla"])
def test_solve_triangular_mat(lower, trans, mode):
    """Matrix-RHS triangular solve matches scipy across every
    (lower, trans) combination and dispatch mode, with matching
    gradients in both arguments."""
    import scipy.linalg as sla

    m = 3
    tril = _tril_batch(BATCH, DIM, seed=SEED + 41)
    a_np = tril if lower else np.swapaxes(tril, -2, -1)
    rng = np.random.default_rng(SEED + 42)
    b_np = rng.standard_normal((BATCH, DIM, m))
    a, b = jnp.asarray(a_np), jnp.asarray(b_np)

    with ops.force_dispatch(mode):
        out = jax.jit(jax.vmap(
            lambda ai, bi: dispatch.solve_triangular_mat(
                ai, bi, lower=lower, trans=trans)
        ))(a, b)
    ref = np.stack([
        sla.solve_triangular(a_np[i], b_np[i], lower=lower,
                             trans=1 if trans else 0)
        for i in range(BATCH)
    ])
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-9)

    def loss(ai, bi, md):
        with ops.force_dispatch(md):
            x = jax.vmap(lambda aj, bj: dispatch.solve_triangular_mat(
                aj, bj, lower=lower, trans=trans))(ai, bi)
        return jnp.sum(x**3)

    g_a, g_b = jax.grad(loss, argnums=(0, 1))(a, b, mode)
    g_a_ref, g_b_ref = jax.grad(loss, argnums=(0, 1))(a, b, "xla")
    np.testing.assert_allclose(np.asarray(g_a), np.asarray(g_a_ref),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_b_ref),
                               atol=1e-8)


def test_dense_grad_log_abs_det_dispatched():
    """DenseDefiniteMatrix.grad_log_abs_det (now Cholesky-inverse based)
    equals the LU inverse for both signs, batched under every mode."""
    spds = _spd_batch(BATCH, DIM, seed=SEED + 43)
    for sign in (1, -1):
        arrs = jnp.asarray(sign * spds)
        for mode in ("kernel", "xla"):
            with ops.force_dispatch(mode):
                out = jax.jit(jax.vmap(
                    lambda m: matrices.DenseDefiniteMatrix(
                        m, sign=sign).grad_log_abs_det
                ))(arrs)
            # Reference semantics (mici/matrices.py:1176-1177):
            # grad_log_abs_det = A^-1 for the actual matrix A = sign * S.
            ref = np.linalg.inv(sign * spds)
            np.testing.assert_allclose(np.asarray(out), ref, atol=1e-8)
