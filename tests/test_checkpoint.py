"""Tests for chunk-boundary checkpoint / resume.

The reference's only resumption path is re-passing ``final_states`` of a
*completed* call (mici/samplers.py:808-815); this framework checkpoints
the full stage-loop carry at every drained chunk (mici_tpu/checkpoint.py)
so a killed run continues bit-identically.  The kill is simulated with a
progress-bar class that raises ``KeyboardInterrupt`` after a chosen
number of chunk updates — exercising kills mid-stage, at stage
boundaries, and before the first chunk completes.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mici_tpu import (
    adapters,
    checkpoint as checkpoint_mod,
    integrators,
    parallel,
    samplers,
    stagers,
    systems,
)

SEED = 321
DIM = 3
N_CHAIN = 4
N_WARM_UP = 12
N_MAIN = 10


@functools.lru_cache(maxsize=1)
def _make_system():
    rng = np.random.default_rng(SEED)
    a = rng.standard_normal((DIM, DIM))
    cov = a @ a.T + DIM * np.eye(DIM)
    prec = np.linalg.inv(cov)

    def nld(q):
        return 0.5 * q @ (jnp.asarray(prec) @ q)

    return systems.EuclideanMetricSystem(nld)


def _make_sampler(n_chain=N_CHAIN):
    system = _make_system()
    integ = integrators.LeapfrogIntegrator(system, step_size=0.5)
    return samplers.DynamicMultinomialHMC(
        system, integ, SEED, max_tree_depth=3,
    )


def _init_states(n=N_CHAIN):
    rng = np.random.default_rng(SEED + 1)
    return [rng.standard_normal(DIM) for _ in range(n)]


class _KillAfter:
    """Progress-bar factory raising KeyboardInterrupt at the nth update.

    The counter is shared across stages (one factory per run), so
    different ``n`` values place the simulated kill mid-stage, at stage
    boundaries, or before the first chunk of a stage drains.
    """

    def __init__(self, n_updates):
        self.remaining = n_updates

    def __call__(self, sequence, description=None, position=None, **kw):
        factory = self

        class Bar:
            def __enter__(self):
                return self

            def __exit__(self, *exc):
                return False

            def update(self, *a, **k):
                factory.remaining -= 1
                if factory.remaining <= 0:
                    raise KeyboardInterrupt

        return Bar()


def _sample_kwargs(tmp_path, **overrides):
    kwargs = dict(
        adapters=[
            adapters.DualAveragingStepSizeAdapter(),
            adapters.OnlineVarianceMetricAdapter(),
        ],
        stager=stagers.WindowedWarmUpStager(
            n_init_fast_stage_iter=3, n_init_slow_window_iter=2,
            n_final_fast_stage_iter=3,
        ),
        chunk_size=3,
        memmap_path=str(tmp_path),
        checkpoint=True,
        display_progress=False,
        trace_warm_up=True,
    )
    kwargs.update(overrides)
    return kwargs


def _assert_outputs_equal(a, b):
    for key in a.traces:
        np.testing.assert_array_equal(
            np.asarray(a.traces[key]), np.asarray(b.traces[key]), err_msg=key,
        )
    for key in a.statistics:
        np.testing.assert_array_equal(
            np.asarray(a.statistics[key]), np.asarray(b.statistics[key]),
            err_msg=key,
        )
    for sa, sb in zip(a.final_states, b.final_states):
        np.testing.assert_array_equal(np.asarray(sa.pos), np.asarray(sb.pos))
        np.testing.assert_array_equal(np.asarray(sa.mom), np.asarray(sb.mom))


def _run_full(tmp_path, **overrides):
    sampler = _make_sampler()
    return sampler.sample_chains(
        N_WARM_UP, N_MAIN, _init_states(),
        **_sample_kwargs(tmp_path, **overrides),
    )


@pytest.mark.parametrize("kill_after", [1, 3, 5, 8, 11])
def test_kill_and_resume_bit_identical(tmp_path, kill_after):
    full_dir = tmp_path / "full"
    kill_dir = tmp_path / "kill"
    full_dir.mkdir()
    kill_dir.mkdir()
    reference = _run_full(full_dir)

    killed_sampler = _make_sampler()
    killed_sampler.sample_chains(
        N_WARM_UP, N_MAIN, _init_states(),
        **_sample_kwargs(
            kill_dir, display_progress=True,
            progress_bar_class=_KillAfter(kill_after),
        ),
    )

    # Resume with a FRESH sampler (no in-memory state carries over).
    resumed_sampler = _make_sampler()
    resumed = resumed_sampler.sample_chains(
        N_WARM_UP, N_MAIN, _init_states(),
        **_sample_kwargs(kill_dir, resume_from=str(kill_dir)),
    )
    _assert_outputs_equal(reference, resumed)


def test_resume_with_trace_summary_and_thinning(tmp_path):
    full_dir = tmp_path / "full"
    kill_dir = tmp_path / "kill"
    full_dir.mkdir()
    kill_dir.mkdir()
    overrides = dict(
        trace_thin=2,
        trace_summary=True,
        trace_summary_quantiles=(0.5,),
    )
    reference = _run_full(full_dir, **overrides)

    killed_sampler = _make_sampler()
    killed_sampler.sample_chains(
        N_WARM_UP, N_MAIN, _init_states(),
        **_sample_kwargs(
            kill_dir, display_progress=True,
            progress_bar_class=_KillAfter(6), **overrides,
        ),
    )
    resumed = _make_sampler().sample_chains(
        N_WARM_UP, N_MAIN, _init_states(),
        **_sample_kwargs(kill_dir, resume_from=str(kill_dir), **overrides),
    )
    _assert_outputs_equal(reference, resumed)
    for key in reference.trace_summaries:
        jax.tree_util.tree_map(
            np.testing.assert_array_equal,
            reference.trace_summaries[key],
            resumed.trace_summaries[key],
        )


@pytest.mark.slow
def test_kill_and_resume_sharded(tmp_path):
    mesh = parallel.make_chain_mesh(2)
    full_dir = tmp_path / "full"
    kill_dir = tmp_path / "kill"
    full_dir.mkdir()
    kill_dir.mkdir()
    reference = _run_full(full_dir, mesh=mesh)

    killed_sampler = _make_sampler()
    killed_sampler.sample_chains(
        N_WARM_UP, N_MAIN, _init_states(),
        **_sample_kwargs(
            kill_dir, mesh=mesh, display_progress=True,
            progress_bar_class=_KillAfter(5),
        ),
    )
    resumed = _make_sampler().sample_chains(
        N_WARM_UP, N_MAIN, _init_states(),
        **_sample_kwargs(kill_dir, resume_from=str(kill_dir), mesh=mesh),
    )
    _assert_outputs_equal(reference, resumed)


def test_checkpoint_requires_memmap_path(tmp_path):
    sampler = _make_sampler()
    with pytest.raises(ValueError, match="memmap_path"):
        sampler.sample_chains(
            2, 2, _init_states(), checkpoint=True, display_progress=False,
        )


def test_resume_missing_checkpoint_errors(tmp_path):
    sampler = _make_sampler()
    with pytest.raises(checkpoint_mod.CheckpointError, match="No checkpoint"):
        sampler.sample_chains(
            2, 2, _init_states(), resume_from=str(tmp_path),
            display_progress=False,
        )


def test_resume_config_mismatch_errors(tmp_path):
    kill_dir = tmp_path / "kill"
    kill_dir.mkdir()
    killed_sampler = _make_sampler()
    killed_sampler.sample_chains(
        N_WARM_UP, N_MAIN, _init_states(),
        **_sample_kwargs(
            kill_dir, display_progress=True,
            progress_bar_class=_KillAfter(3),
        ),
    )
    with pytest.raises(
            checkpoint_mod.CheckpointError, match="n_main_iter"):
        _make_sampler().sample_chains(
            N_WARM_UP, N_MAIN + 5, _init_states(),
            **_sample_kwargs(kill_dir, resume_from=str(kill_dir)),
        )


def test_completed_run_resume_returns_final_states(tmp_path):
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    reference = _run_full(run_dir)
    resumed = _make_sampler().sample_chains(
        N_WARM_UP, N_MAIN, _init_states(),
        **_sample_kwargs(run_dir, resume_from=str(run_dir)),
    )
    _assert_outputs_equal(reference, resumed)


def test_kill_and_resume_with_max_chunk_seconds(tmp_path):
    """Time-capped chunking (round 5) composes with checkpoint/resume:
    adapted chunk lengths change checkpoint placement but never results,
    so a killed time-capped run resumes bit-identically to an
    uninterrupted run with default chunking."""
    full_dir = tmp_path / "full"
    kill_dir = tmp_path / "kill"
    full_dir.mkdir()
    kill_dir.mkdir()
    reference = _run_full(full_dir)

    killed_sampler = _make_sampler()
    killed_sampler.sample_chains(
        N_WARM_UP, N_MAIN, _init_states(),
        **_sample_kwargs(
            kill_dir, display_progress=True,
            progress_bar_class=_KillAfter(5),
            max_chunk_seconds=1e-9,  # force probe-length chunks
        ),
    )
    resumed_sampler = _make_sampler()
    resumed = resumed_sampler.sample_chains(
        N_WARM_UP, N_MAIN, _init_states(),
        **_sample_kwargs(
            kill_dir, resume_from=str(kill_dir), max_chunk_seconds=1e-9,
        ),
    )
    _assert_outputs_equal(reference, resumed)


def test_describe_and_cli(tmp_path, capsys):
    kill_dir = tmp_path / "kill"
    kill_dir.mkdir()
    killed_sampler = _make_sampler()
    killed_sampler.sample_chains(
        N_WARM_UP, N_MAIN, _init_states(),
        **_sample_kwargs(
            kill_dir, display_progress=True,
            progress_bar_class=_KillAfter(4),
        ),
    )
    lines = checkpoint_mod.describe(str(kill_dir))
    text = "\n".join(lines)
    assert f"{N_CHAIN} chains" in text
    assert "resume position: stage" in text
    assert "resume_from=" in text

    assert checkpoint_mod._main([str(kill_dir)]) == 0
    out = capsys.readouterr().out
    assert "resume position" in out

    assert checkpoint_mod._main([str(tmp_path / "nowhere")]) == 1
    assert "error:" in capsys.readouterr().out


#: Self-contained builder module for the CLI resume test: rebuilds the
#: exact configuration of this file's checkpointed runs (same seeds).
_BUILDER_SRC = """
import numpy as np
import jax.numpy as jnp
from mici_tpu import adapters, integrators, samplers, stagers, systems

SEED, DIM, N_CHAIN = 321, 3, 4


def build():
    rng = np.random.default_rng(SEED)
    a = rng.standard_normal((DIM, DIM))
    prec = np.linalg.inv(a @ a.T + DIM * np.eye(DIM))

    def nld(q):
        return 0.5 * q @ (jnp.asarray(prec) @ q)

    system = systems.EuclideanMetricSystem(nld)
    integ = integrators.LeapfrogIntegrator(system, step_size=0.5)
    sampler = samplers.DynamicMultinomialHMC(
        system, integ, SEED, max_tree_depth=3,
    )
    rng_init = np.random.default_rng(SEED + 1)
    init_states = [rng_init.standard_normal(DIM) for _ in range(N_CHAIN)]
    sample_kwargs = dict(
        adapters=[
            adapters.DualAveragingStepSizeAdapter(),
            adapters.OnlineVarianceMetricAdapter(),
        ],
        stager=stagers.WindowedWarmUpStager(
            n_init_fast_stage_iter=3, n_init_slow_window_iter=2,
            n_final_fast_stage_iter=3,
        ),
        chunk_size=3, display_progress=False, trace_warm_up=True,
    )
    return sampler, init_states, sample_kwargs
"""


def test_cli_resume_with_builder(tmp_path, capsys):
    """`python -m mici_tpu.checkpoint resume <dir> --builder mod:fn`
    continues a killed run bit-identically (ROADMAP round-5 #5: the
    library resume API landed round 4; this is the command-line path,
    with the sampler configuration rebuilt by a user-supplied builder
    since checkpoints deliberately never pickle user closures)."""
    full_dir = tmp_path / "full"
    kill_dir = tmp_path / "kill"
    full_dir.mkdir()
    kill_dir.mkdir()
    reference = _run_full(full_dir)

    killed_sampler = _make_sampler()
    killed_sampler.sample_chains(
        N_WARM_UP, N_MAIN, _init_states(),
        **_sample_kwargs(
            kill_dir, display_progress=True,
            progress_bar_class=_KillAfter(4),
        ),
    )

    builder_path = tmp_path / "builder.py"
    builder_path.write_text(_BUILDER_SRC)
    spec = f"{builder_path}:build"

    # Library path: spec string resolution + resumed outputs identical.
    resumed = checkpoint_mod.resume(str(kill_dir), spec)
    _assert_outputs_equal(reference, resumed)

    # CLI path on the (now completed) checkpoint: replays finalizations
    # and returns the full outputs, rc 0.
    assert checkpoint_mod._main(
        ["resume", str(kill_dir), "--builder", spec],
    ) == 0
    out = capsys.readouterr().out
    assert "resumed run complete: 4 chains" in out

    # Bad specs fail cleanly.
    assert checkpoint_mod._main(
        ["resume", str(kill_dir), "--builder", "nonsense"],
    ) == 1
    assert "error:" in capsys.readouterr().out
    assert checkpoint_mod._main(
        ["resume", str(kill_dir), "--builder", f"{builder_path}:missing"],
    ) == 1
    assert "error:" in capsys.readouterr().out
