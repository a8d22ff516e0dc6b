"""Chunk-boundary checkpoint / restore for long sampling runs.

The reference's memory-mapped trace storage makes partial *traces*
crash-survivable (mici/samplers.py:87-367 — flushed memmaps persist after
a kill), but a preempted long run still loses adapter state, transition
parameters and generator position: the only resumption the reference
supports is re-passing ``final_states`` of a *completed* call as the next
call's ``init_states`` (mici/samplers.py:808-815).

This module makes the whole sampling loop resumable at compiled-chunk
granularity, which matters on shared / preemptible TPU pools:

* After every drained chunk the full device carry of the stage loop —
  chain states, per-chain PRNG keys, adapter states, adapter-controlled
  transition parameters, running trace summaries — plus the host-side
  cursors (stage index, offset within stage, trace-row offsets) and the
  sampler's base PRNG key are serialized to ``<memmap_path>/checkpoint/``
  with an atomic write (``os.replace``), so a checkpoint is never
  half-written even under ``kill -9``.
* At every stage boundary the inputs of the cross-chain adapter
  finalization (final adapter states, end-of-stage chain states, and the
  sampler key it will consume) are recorded.  On resume the finalizations
  of completed stages are *replayed* from these records, reconstructing
  the adapted transitions — including structural changes such as an
  identity metric being replaced by an adapted diagonal/dense one —
  bit-identically, without having to serialize transition/system objects
  (which close over user model functions and are not picklable).
* Traces and statistics live in the memmap files already on disk; resume
  reopens them in ``r+`` mode and overwrites any rows written after the
  last checkpoint (those iterations are re-run from the checkpointed
  carry, reproducing the same values).

Only array leaves are serialized; pytree *structure* is never stored.
On resume each saved leaf list is poured back into a structure template
recomputed by the driver (prepared initial states, ``jax.eval_shape`` of
the adapter initialization, the host-initialized summary state), with
shape/dtype validation against the template.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

FORMAT_VERSION = 1

_META_FILE = "checkpoint_meta.json"
_CARRY_FILE = "carry.npz"


class CheckpointError(RuntimeError):
    """Raised when a checkpoint is missing, corrupt or incompatible."""


def _is_key_leaf(leaf):
    dtype = getattr(leaf, "dtype", None)
    if dtype is None:
        return False
    try:
        return jnp.issubdtype(dtype, jax.dtypes.prng_key)
    except TypeError:
        return False


def _leaf_to_numpy(leaf):
    if _is_key_leaf(leaf):
        leaf = jax.random.key_data(leaf)
    return np.asarray(jax.device_get(leaf))


def host_leaves(tree):
    """Flatten a pytree to a list of host numpy arrays (keys unwrapped)."""
    return [_leaf_to_numpy(leaf) for leaf in jax.tree_util.tree_leaves(tree)]


def restore_like(template, leaves, *, what="checkpoint payload"):
    """Pour saved leaf arrays back into the structure of ``template``.

    ``template`` provides the treedef and per-leaf shape/dtype (its leaves
    may be concrete arrays or ``jax.ShapeDtypeStruct`` from ``eval_shape``);
    ``leaves`` are the host arrays loaded from a checkpoint, in tree order.
    """
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    if len(t_leaves) != len(leaves):
        msg = (f"Checkpoint mismatch restoring {what}: saved {len(leaves)} "
               f"array(s) but the current configuration expects "
               f"{len(t_leaves)}. The resumed call must use the same "
               f"sampler configuration as the checkpointed run.")
        raise CheckpointError(msg)
    restored = []
    for t_leaf, leaf in zip(t_leaves, leaves):
        if _is_key_leaf(t_leaf):
            expect_shape = tuple(
                jax.eval_shape(jax.random.key_data, t_leaf).shape,
            )
            key = True
        else:
            expect_shape = tuple(np.shape(t_leaf)) if not hasattr(
                t_leaf, "shape") else tuple(t_leaf.shape)
            key = False
        if tuple(leaf.shape) != expect_shape:
            msg = (f"Checkpoint mismatch restoring {what}: saved array of "
                   f"shape {tuple(leaf.shape)} where the current "
                   f"configuration expects {expect_shape}.")
            raise CheckpointError(msg)
        if key:
            impl = str(jax.random.key_impl(t_leaf))
            leaf = jax.random.wrap_key_data(jnp.asarray(leaf), impl=impl)
        restored.append(leaf)
    return treedef.unflatten(restored)


def _pack_groups(groups, scalars):
    arrays = {"__scalars__": np.asarray(json.dumps(scalars))}
    for name, leaves in groups.items():
        arrays[f"__n_{name}__"] = np.asarray(len(leaves))
        for i, leaf in enumerate(leaves):
            arrays[f"{name}_{i}"] = leaf
    return arrays


def _unpack_groups(npz, group_names):
    scalars = json.loads(str(npz["__scalars__"][()]))
    groups = {}
    for name in group_names:
        n = int(npz[f"__n_{name}__"][()])
        groups[name] = [npz[f"{name}_{i}"] for i in range(n)]
    return groups, scalars


_CARRY_GROUPS = ("states", "chain_keys", "params", "adapt", "summary", "rng")
_RECORD_GROUPS = ("states", "adapt", "rng")


class CheckpointWriter:
    """Writes atomic chunk-boundary checkpoints under a directory."""

    def __init__(self, directory, meta):
        self._dir = Path(directory)
        self._dir.mkdir(parents=True, exist_ok=True)
        self._atomic_write_bytes(
            self._dir / _META_FILE,
            json.dumps(meta, indent=2, sort_keys=True).encode(),
        )

    def _atomic_write_bytes(self, path, data):
        tmp = path.with_suffix(path.suffix + ".tmp")
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    def _atomic_savez(self, path, arrays):
        tmp = path.with_suffix(".tmp.npz")
        with open(tmp, "wb") as f:
            np.savez(f, **arrays)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    def write_carry(self, *, stage_index, states, chain_keys, params,
                    adapt_states, summary_state, offset_in_stage,
                    trace_offset_in_stage, sampling_index_offset,
                    trace_index_offset, rng):
        groups = {
            "states": host_leaves(states),
            "chain_keys": host_leaves(chain_keys),
            "params": host_leaves(params),
            "adapt": host_leaves(adapt_states),
            "summary": host_leaves(summary_state)
            if summary_state is not None else [],
            "rng": host_leaves(rng),
        }
        scalars = {
            "stage_index": int(stage_index),
            "offset_in_stage": int(offset_in_stage),
            "trace_offset_in_stage": int(trace_offset_in_stage),
            "sampling_index_offset": int(sampling_index_offset),
            "trace_index_offset": int(trace_index_offset),
            "has_summary": summary_state is not None,
        }
        self._atomic_savez(
            self._dir / _CARRY_FILE, _pack_groups(groups, scalars),
        )

    def write_finalize_record(self, stage_index, adapt_states, states, rng):
        groups = {
            "states": host_leaves(states),
            "adapt": host_leaves(adapt_states),
            "rng": host_leaves(rng),
        }
        scalars = {"stage_index": int(stage_index)}
        self._atomic_savez(
            self._dir / f"finalize_{int(stage_index):03d}.npz",
            _pack_groups(groups, scalars),
        )


class LoadedCheckpoint:
    """Raw contents of a checkpoint directory (no interpretation)."""

    def __init__(self, directory):
        self._dir = Path(directory)
        meta_path = self._dir / _META_FILE
        carry_path = self._dir / _CARRY_FILE
        if not meta_path.exists() or not carry_path.exists():
            msg = (f"No checkpoint found under {self._dir} (expected "
                   f"{_META_FILE} and {_CARRY_FILE}).")
            raise CheckpointError(msg)
        with open(meta_path) as f:
            self.meta = json.load(f)
        if self.meta.get("format_version") != FORMAT_VERSION:
            msg = (f"Unsupported checkpoint format version "
                   f"{self.meta.get('format_version')!r} (this build reads "
                   f"version {FORMAT_VERSION}).")
            raise CheckpointError(msg)
        with np.load(carry_path) as npz:
            self.carry_groups, self.carry = _unpack_groups(
                npz, _CARRY_GROUPS,
            )
        self.finalize_records = {}
        for path in sorted(self._dir.glob("finalize_*.npz")):
            with np.load(path) as npz:
                groups, scalars = _unpack_groups(npz, _RECORD_GROUPS)
            self.finalize_records[int(scalars["stage_index"])] = groups

    def validate_meta(self, expected):
        """Check the run fingerprint matches the resumed call's config."""
        for field, value in expected.items():
            saved = self.meta.get(field)
            if saved != value:
                msg = (f"Checkpoint was written by a run with {field}="
                       f"{saved!r}; the resumed call has {field}={value!r}. "
                       f"Resume must use the same sampler configuration.")
                raise CheckpointError(msg)


def checkpoint_dir(memmap_path):
    return Path(memmap_path) / "checkpoint"


def describe(memmap_path):
    """Human-readable summary of a run's checkpoint state.

    Returns a list of text lines describing the run fingerprint, the
    resume position (stage / iteration cursors), and the finalization
    records present — without touching any device state.
    """
    loaded = LoadedCheckpoint(checkpoint_dir(memmap_path))
    meta, carry = loaded.meta, loaded.carry
    stages = meta.get("stages", [])
    lines = [
        f"checkpoint under {checkpoint_dir(memmap_path)}",
        f"  run: {meta.get('n_chain')} chains, "
        f"{meta.get('n_warm_up_iter')} warm-up + "
        f"{meta.get('n_main_iter')} main iterations, "
        f"trace_thin={meta.get('trace_thin')}",
        f"  traced: {', '.join(meta.get('trace_keys', [])) or '(none)'}",
        f"  stages ({len(stages)}):",
    ]
    for index, (label, n_iter, has_adapters, _rec, _tf) in enumerate(
            stages):
        marker = " "
        if index < carry["stage_index"]:
            marker = "x"
        elif index == carry["stage_index"]:
            done = carry["offset_in_stage"]
            marker = "x" if done >= n_iter else ">"
        suffix = " [adaptive]" if has_adapters else ""
        lines.append(f"    [{marker}] {label}: {n_iter} iter{suffix}")
    stage_index = carry["stage_index"]
    label = stages[stage_index][0] if stage_index < len(stages) else "?"
    lines.append(
        f"  resume position: stage {stage_index} ({label!r}) at "
        f"iteration {carry['offset_in_stage']}"
        f" / trace row {carry['trace_offset_in_stage']}",
    )
    lines.append(
        f"  finalization records: "
        f"{sorted(loaded.finalize_records) or '(none)'}",
    )
    lines.append(
        "  resume with: sample_chains(..., "
        f"resume_from={str(memmap_path)!r})",
    )
    return lines


def load_builder(spec):
    """Resolve a ``module:function`` / ``file.py:function`` builder spec.

    The named function must take no arguments and return
    ``(sampler, init_states, sample_kwargs)`` — the same sampler
    configuration the checkpointed run used (adapters, stager, trace
    functions, chunking), minus the iteration counts and checkpoint
    paths, which :func:`resume` supplies from the checkpoint itself.
    """
    mod_part, _, func_name = spec.partition(":")
    if not mod_part or not func_name:
        msg = (f"Builder spec {spec!r} must be 'module:function' or "
               f"'path/to/file.py:function'.")
        raise CheckpointError(msg)
    try:
        if mod_part.endswith(".py"):
            import importlib.util

            module_spec = importlib.util.spec_from_file_location(
                "_mici_tpu_checkpoint_builder", mod_part,
            )
            if module_spec is None or module_spec.loader is None:
                msg = f"Cannot load builder file {mod_part!r}."
                raise CheckpointError(msg)
            module = importlib.util.module_from_spec(module_spec)
            module_spec.loader.exec_module(module)
        else:
            import importlib

            module = importlib.import_module(mod_part)
    except (ImportError, OSError, SyntaxError) as exc:
        msg = f"Cannot import builder {spec!r}: {exc}"
        raise CheckpointError(msg) from exc
    builder = getattr(module, func_name, None)
    if not callable(builder):
        msg = f"Builder {spec!r} does not name a callable."
        raise CheckpointError(msg)
    return builder


def resume(memmap_path, builder):
    """Resume a checkpointed run (library / command-line entry).

    Checkpoints store array state, never user closures, so resuming
    needs the original sampler configuration rebuilt in code:
    ``builder`` is a callable (or a ``module:function`` /
    ``file.py:function`` spec) returning ``(sampler, init_states,
    sample_kwargs)`` exactly as the original run was configured.
    Iteration counts come from the checkpoint meta; the memmap path,
    ``checkpoint=True`` and ``resume_from`` are set here.  Returns the
    completed run's ``sample_chains`` outputs — bit-identical to the
    uninterrupted run.
    """
    if isinstance(builder, str):
        builder = load_builder(builder)
    loaded = LoadedCheckpoint(checkpoint_dir(memmap_path))
    meta = loaded.meta
    sampler, init_states, sample_kwargs = builder()
    sample_kwargs = dict(sample_kwargs)
    sample_kwargs["memmap_path"] = str(memmap_path)
    sample_kwargs["resume_from"] = str(memmap_path)
    sample_kwargs["checkpoint"] = True
    return sampler.sample_chains(
        meta["n_warm_up_iter"], meta["n_main_iter"], init_states,
        **sample_kwargs,
    )


def _main(argv=None):
    import argparse
    import sys as _sys

    argv = list(_sys.argv[1:] if argv is None else argv)
    # Backward compatible: a bare path argument means "inspect".
    if argv and argv[0] not in ("inspect", "resume", "-h", "--help"):
        argv = ["inspect", *argv]
    parser = argparse.ArgumentParser(
        prog="python -m mici_tpu.checkpoint",
        description="Inspect or resume a sample_chains checkpoint "
                    "directory.",
    )
    sub = parser.add_subparsers(dest="command", required=True)
    p_inspect = sub.add_parser(
        "inspect", help="Describe a run's checkpoint state.",
    )
    p_inspect.add_argument(
        "memmap_path",
        help="The memmap_path of the checkpointed run.",
    )
    p_resume = sub.add_parser(
        "resume",
        help="Continue a killed run to completion (bit-identical to "
             "the uninterrupted run).",
    )
    p_resume.add_argument(
        "memmap_path",
        help="The memmap_path of the checkpointed run.",
    )
    p_resume.add_argument(
        "--builder", required=True,
        help="'module:function' or 'path/to/file.py:function' returning "
             "(sampler, init_states, sample_kwargs) with the original "
             "run's configuration.",
    )
    args = parser.parse_args(argv)
    try:
        if args.command == "inspect":
            print("\n".join(describe(args.memmap_path)))
        else:
            outputs = resume(args.memmap_path, args.builder)
            print(f"resumed run complete: {len(outputs.final_states)} "
                  f"chains")
            print("\n".join(describe(args.memmap_path)))
    except CheckpointError as exc:
        print(f"error: {exc}")
        return 1
    return 0


if __name__ == "__main__":  # pragma: no cover - exercised via _main test
    import sys

    sys.exit(_main())
