"""Sampling from a distribution on a torus (the reference worked example).

TPU-native version of the reference README example
(/root/reference/README.md:292-406): approximate samples from a
distribution on a 2D torus embedded in 3D, using constrained HMC with a
RATTLE-style integrator.  Derivatives come from JAX autodiff (replacing
SymNum) and the chains run as one vectorized compiled program (replacing
the multiprocessing pool) — scale ``n_chain`` to thousands on a TPU chip.

Run: python examples/torus_sampling.py
"""

import pathlib
import sys

# allow running from a source checkout without installing the package
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp
import numpy as np

import mici_tpu
from mici_tpu.diagnostics import effective_sample_size, split_rhat

# Fixed model parameters
R = 1.0      # toroidal radius in (0, inf)
r = 0.5      # poloidal radius in (0, R)
ALPHA = 0.9  # density fluctuation amplitude in [0, 1)

dim_q = 3


def constr(q):
    """Constraint whose zero level set {q : constr(q) == 0} is the torus."""
    x, y, z = q[0], q[1], q[2]
    return jnp.array([((x**2 + y**2) ** 0.5 - R) ** 2 + z**2 - r**2])


def neg_log_dens(q):
    """Negative log density wrt the area measure on the torus."""
    x, y, z = q[0], q[1], q[2]
    theta = jnp.arctan2(y, x)
    phi = jnp.arctan2(z, x / jnp.cos(theta) - R)
    return jnp.log1p(r * jnp.cos(phi) / R) - jnp.log1p(
        jnp.sin(4 * theta) * jnp.cos(phi) * ALPHA,
    )


def trace_func(state):
    return {"x": state.pos[0], "y": state.pos[1], "z": state.pos[2]}


def main(n_chain=8, n_warm_up_iter=200, n_main_iter=500):
    rng = np.random.default_rng(seed=1234)

    # Initial positions on the torus via (theta, phi) parameterization.
    theta_init, phi_init = rng.uniform(0, 2 * np.pi, size=(2, n_chain))
    q_init = np.stack(
        [
            (R + r * np.cos(phi_init)) * np.cos(theta_init),
            (R + r * np.cos(phi_init)) * np.sin(theta_init),
            r * np.sin(phi_init),
        ],
        -1,
    )

    final_states, traces, stats = mici_tpu.sample_constrained_hmc_chains(
        n_warm_up_iter=n_warm_up_iter,
        n_main_iter=n_main_iter,
        init_states=q_init,
        neg_log_dens=neg_log_dens,
        constr=constr,
        seed=1234,
        trace_funcs=[trace_func],
        # solver / reversibility tolerances default to dtype-aware values
        # (f64: the reference defaults; f32 on TPU: rescaled just above the
        # f32 residual floor) — hardcoding f64-grade tolerances here would
        # make every projection "fail" in f32 and collapse the step size
        sampler_kwargs={"max_tree_depth": 6},
    )

    for c in range(n_chain):
        print(f"Chain {c}:")
        print(
            f"  Average accept prob. = "
            f"{np.nanmean(stats['accept_stat'][c]):.2f}",
        )
        print(
            f"  Average number steps = "
            f"{np.mean(stats['n_step'][c]):.1f}",
        )

    for key in "xyz":
        values = np.asarray(traces[key])
        print(
            f"{key}: mean={values.mean():+.3f} sd={values.std():.3f} "
            f"ESS={effective_sample_size(values):.0f} "
            f"R-hat={split_rhat(values):.3f}",
        )

    # Check all samples lie on the torus.
    pos = np.stack(
        [np.asarray(traces[k]).ravel() for k in "xyz"], axis=-1,
    )
    residual = np.abs(
        (np.sqrt(pos[:, 0] ** 2 + pos[:, 1] ** 2) - R) ** 2
        + pos[:, 2] ** 2 - r**2,
    ).max()
    print(f"max constraint residual: {residual:.2e}")
    return traces


if __name__ == "__main__":
    main()
