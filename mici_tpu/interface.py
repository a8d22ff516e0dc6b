"""Higher-level functional interface to mici_tpu.

Reference: mici/interface.py (312 LoC).  One-call sampling for
unconstrained and constrained targets, mirroring ``sample_hmc_chains`` /
``sample_constrained_hmc_chains`` (mici/interface.py:35-146, :149-312)
with identical class/keyword-injection semantics.
"""

from __future__ import annotations

from mici_tpu import integrators, samplers, systems


def _preprocess_kwargs(*kwargs_dicts):
    return tuple({} if d is None else d for d in kwargs_dicts)


def sample_hmc_chains(
    n_warm_up_iter,
    n_main_iter,
    init_states,
    neg_log_dens,
    *,
    backend=None,
    seed=None,
    grad_neg_log_dens=None,
    system_class=systems.EuclideanMetricSystem,
    integrator_class=integrators.LeapfrogIntegrator,
    sampler_class=samplers.DynamicMultinomialHMC,
    system_kwargs=None,
    integrator_kwargs=None,
    sampler_kwargs=None,
    **kwargs,
):
    """Sample Hamiltonian Monte Carlo chains for a given target distribution.

    Reference: mici/interface.py:35-146.

    Args:
        n_warm_up_iter: Number of adaptive warm up iterations per chain.
        n_main_iter: Number of main sampling iterations per chain.
        init_states: Iterable of initial chain states (position arrays or
            ChainState instances).
        neg_log_dens: Function of position returning the negative log
            (unnormalized) density of the target distribution.
        backend: AD backend name (API parity; built-ins map to native JAX).
        seed: Integer seed, JAX PRNG key, or numpy Generator.
        grad_neg_log_dens: Optional gradient function (or returning a
            (gradient, value) 2-tuple).
        system_class: Hamiltonian system class to use.
        integrator_class: Symplectic integrator class to use.
        sampler_class: HamiltonianMonteCarlo sampler class to use.
        system_kwargs: Extra keyword arguments for the system initializer.
        integrator_kwargs: Extra keyword arguments for the integrator.
        sampler_kwargs: Extra keyword arguments for the sampler.
        **kwargs: Extra keyword arguments for ``sample_chains``.

    Returns:
        HMCSampleChainsOutputs(final_states, traces, statistics).
    """
    seed = 0 if seed is None else seed
    system_kwargs, integrator_kwargs, sampler_kwargs = _preprocess_kwargs(
        system_kwargs, integrator_kwargs, sampler_kwargs,
    )
    system = system_class(
        neg_log_dens=neg_log_dens,
        grad_neg_log_dens=grad_neg_log_dens,
        backend=backend,
        **system_kwargs,
    )
    integrator = integrator_class(system=system, **integrator_kwargs)
    sampler = sampler_class(
        system=system, integrator=integrator, rng=seed, **sampler_kwargs,
    )
    return sampler.sample_chains(
        n_warm_up_iter=n_warm_up_iter,
        n_main_iter=n_main_iter,
        init_states=init_states,
        **kwargs,
    )


def sample_constrained_hmc_chains(
    n_warm_up_iter,
    n_main_iter,
    init_states,
    neg_log_dens,
    constr,
    *,
    backend=None,
    seed=None,
    grad_neg_log_dens=None,
    jacob_constr=None,
    mhp_constr=None,
    dens_wrt_hausdorff=True,
    system_class=systems.DenseConstrainedEuclideanMetricSystem,
    integrator_class=integrators.ConstrainedLeapfrogIntegrator,
    sampler_class=samplers.DynamicMultinomialHMC,
    system_kwargs=None,
    integrator_kwargs=None,
    sampler_kwargs=None,
    **kwargs,
):
    """Sample constrained Hamiltonian Monte Carlo chains.

    Samples chains with stationary distribution on an implicitly-defined
    manifold (the zero level-set of ``constr``) embedded in an ambient
    Euclidean space.  Reference: mici/interface.py:149-312.

    Args:
        n_warm_up_iter: Number of adaptive warm up iterations per chain.
        n_main_iter: Number of main sampling iterations per chain.
        init_states: Iterable of initial chain states (positions must
            satisfy the constraint).
        neg_log_dens: Function of position returning the negative log
            density (with respect to the Hausdorff measure on the manifold
            if ``dens_wrt_hausdorff`` else the ambient Lebesgue measure).
        constr: Constraint function whose zero level-set defines the
            manifold.
        backend: AD backend name (API parity).
        seed: Integer seed, JAX PRNG key, or numpy Generator.
        grad_neg_log_dens: Optional gradient function.
        jacob_constr: Optional constraint Jacobian function.
        mhp_constr: Optional constraint matrix-Hessian-product function.
        dens_wrt_hausdorff: Whether ``neg_log_dens`` is with respect to the
            Hausdorff measure on the manifold.
        system_class: Constrained Hamiltonian system class to use.
        integrator_class: Constrained symplectic integrator class to use.
        sampler_class: HamiltonianMonteCarlo sampler class to use.
        system_kwargs: Extra keyword arguments for the system initializer.
        integrator_kwargs: Extra keyword arguments for the integrator.
        sampler_kwargs: Extra keyword arguments for the sampler.
        **kwargs: Extra keyword arguments for ``sample_chains``.

    Returns:
        HMCSampleChainsOutputs(final_states, traces, statistics).
    """
    seed = 0 if seed is None else seed
    system_kwargs, integrator_kwargs, sampler_kwargs = _preprocess_kwargs(
        system_kwargs, integrator_kwargs, sampler_kwargs,
    )
    if not dens_wrt_hausdorff:
        system_kwargs.setdefault("mhp_constr", mhp_constr)
    system = system_class(
        neg_log_dens=neg_log_dens,
        constr=constr,
        dens_wrt_hausdorff=dens_wrt_hausdorff,
        grad_neg_log_dens=grad_neg_log_dens,
        jacob_constr=jacob_constr,
        backend=backend,
        **system_kwargs,
    )
    integrator = integrator_class(system=system, **integrator_kwargs)
    sampler = sampler_class(
        system=system, integrator=integrator, rng=seed, **sampler_kwargs,
    )
    return sampler.sample_chains(
        n_warm_up_iter=n_warm_up_iter,
        n_main_iter=n_main_iter,
        init_states=init_states,
        **kwargs,
    )
