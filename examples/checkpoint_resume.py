"""Kill-and-resume a sampling run bit-identically.

Long adaptive runs on shared/preemptible TPU pools die: the pool is
reclaimed, the job is rescheduled, and with the reference library the
only thing that survives is whatever memmap trace rows were flushed —
adapter state, transition parameters and generator position are gone,
so the run restarts from scratch (the reference's one resumption path
is re-passing a *completed* call's ``final_states``,
mici/samplers.py:808-815).

This framework checkpoints the *whole compiled sampling loop* at chunk
boundaries (``mici_tpu/checkpoint.py``): chain states, per-chain PRNG
keys, adapter states, adapter-controlled transition parameters, trace
summaries, trace cursors and the sampler's base key, written atomically
next to the memmap trace files, plus a replayable record of every
warm-up finalization.  ``sample_chains(resume_from=...)`` then continues
the run **bit-identically** to the uninterrupted one — same warm-up
adaptation, same draws, same statistics — repeating at most one chunk
of work.

This example runs a windowed-warm-up NUTS job three ways: straight
through, killed partway (a mid-run ``KeyboardInterrupt``), and resumed
from the killed run's checkpoint with a *fresh* sampler object.  It
then verifies the resumed traces equal the uninterrupted ones
bit-for-bit.

Run: python examples/checkpoint_resume.py
"""

import pathlib
import sys
import tempfile

# allow running from a source checkout without installing the package
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp
import numpy as np

from mici_tpu import adapters, integrators, samplers, stagers, systems

SEED = 20260819
DIM = 5
N_CHAIN = 8
N_WARM_UP, N_MAIN = 120, 100


def make_sampler():
    rng = np.random.default_rng(SEED)
    a = rng.standard_normal((DIM, DIM))
    cov = a @ a.T + DIM * np.eye(DIM)
    prec = jnp.asarray(np.linalg.inv(cov))

    def neg_log_dens(q):
        return 0.5 * q @ (prec @ q)

    system = systems.EuclideanMetricSystem(neg_log_dens)
    integrator = integrators.LeapfrogIntegrator(system)
    return samplers.DynamicMultinomialHMC(system, integrator, SEED)


def run(memmap_path, progress_bar_class=None, resume_from=None):
    sampler = make_sampler()
    init_states = list(
        np.random.default_rng(SEED + 1).standard_normal((N_CHAIN, DIM)))
    return sampler.sample_chains(
        N_WARM_UP, N_MAIN, init_states,
        adapters=[adapters.DualAveragingStepSizeAdapter(),
                  adapters.OnlineVarianceMetricAdapter()],
        stager=stagers.WindowedWarmUpStager(),
        chunk_size=25,
        memmap_path=str(memmap_path),
        checkpoint=True,
        resume_from=resume_from,
        display_progress=progress_bar_class is not None,
        progress_bar_class=progress_bar_class,
    )


class KillAfterChunks:
    """Progress-bar stand-in that simulates preemption mid-run."""

    def __init__(self, n_chunks):
        self.remaining = n_chunks

    def __call__(self, sequence, description=None, position=None, **kw):
        outer = self

        class Bar:
            def __enter__(self):
                return self

            def __exit__(self, *exc):
                return False

            def update(self, *a, **k):
                outer.remaining -= 1
                if outer.remaining <= 0:
                    print("  ... simulated preemption (SIGINT) ...")
                    raise KeyboardInterrupt

        return Bar()


def main():
    base = pathlib.Path(tempfile.mkdtemp(prefix="mici_tpu_ckpt_"))
    (base / "full").mkdir()
    (base / "killed").mkdir()

    print(f"uninterrupted run -> {base / 'full'}")
    reference = run(base / "full")

    print(f"killed run        -> {base / 'killed'}")
    try:
        run(base / "killed", progress_bar_class=KillAfterChunks(5))
    except KeyboardInterrupt:  # pragma: no cover - driver swallows it
        pass

    print("resuming the killed run with a fresh sampler object ...")
    resumed = run(base / "killed", resume_from=str(base / "killed"))

    for key in reference.traces:
        np.testing.assert_array_equal(
            np.asarray(reference.traces[key]),
            np.asarray(resumed.traces[key]),
        )
    for key in reference.statistics:
        np.testing.assert_array_equal(
            np.asarray(reference.statistics[key]),
            np.asarray(resumed.statistics[key]),
        )
    ess = np.asarray(reference.traces["pos"]).shape
    print(f"resumed == uninterrupted, bit for bit "
          f"(traces {ess[0]} chains x {ess[1]} draws).")


if __name__ == "__main__":
    main()
