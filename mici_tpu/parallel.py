"""Multi-chip chain parallelism over a TPU device mesh.

The reference parallelizes chains with ``multiprocessing`` pools, queues
and memory-mapped files (mici/samplers.py:61-81, :668-772).  The TPU-native
equivalent (SURVEY.md §2.3): chains are batched with ``vmap`` *within* a
chip and the chain axis is **sharded** over an ICI mesh — the communication
backend is XLA collectives.  Because the whole per-stage sampling step is a
single ``jit``-compiled program over chain-batched pytrees, sharding the
chain axis with a :class:`jax.sharding.NamedSharding` is sufficient: XLA
partitions the vmapped program per device and inserts ``all-reduce``
collectives for the cross-chain adapter reductions
(mici/adapters.py:486-505 equivalents) automatically, riding ICI.

``shard_map`` entry points are also provided for explicit-collective
control (e.g. the driver's multi-chip dry run).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


CHAIN_AXIS = "chains"
SLICE_AXIS = "slice"
MODEL_AXIS = "model"


def make_chain_mesh(n_devices=None, devices=None):
    """Create a 1D device mesh with a single ``chains`` axis.

    Args:
        n_devices: Number of devices to include (default: all).
        devices: Explicit device list (overrides n_devices).

    Returns:
        ``jax.sharding.Mesh`` over the ``chains`` axis.
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (CHAIN_AXIS,))


def make_slice_chain_mesh(n_slices, n_devices_per_slice=None, devices=None):
    """Create a two-level ``("slice", "chains")`` device mesh.

    For multi-slice TPU pods the devices within a slice are connected by
    ICI while slices communicate over DCN.  Laying the mesh out as
    ``(slice, chains)`` — with devices of the same slice contiguous along
    the inner ``chains`` axis — keeps the all-reduces for cross-chain
    adapter reductions hierarchical: XLA reduces within a slice over ICI
    first and exchanges only the reduced values across slices over DCN.

    Args:
        n_slices: Number of slices (outer mesh axis size).
        n_devices_per_slice: Devices per slice (inner axis size).  Default:
            all available devices divided evenly into ``n_slices`` groups.
        devices: Explicit device list in slice-major order (overrides
            ``n_devices_per_slice``).

    Returns:
        ``jax.sharding.Mesh`` with axes ``("slice", "chains")``.
    """
    if devices is None:
        devices = jax.devices()
        if n_devices_per_slice is not None:
            devices = devices[: n_slices * n_devices_per_slice]
    devices = np.asarray(devices)
    if devices.size % n_slices != 0:
        msg = (
            f"Number of devices ({devices.size}) is not divisible by "
            f"n_slices ({n_slices})."
        )
        raise ValueError(msg)
    return Mesh(
        devices.reshape(n_slices, -1), (SLICE_AXIS, CHAIN_AXIS),
    )


def make_chain_model_mesh(n_chain_devices, n_model_devices=None,
                          devices=None):
    """Create a two-level ``("chains", "model")`` device mesh.

    For very high-dimensional targets the per-chain state vectors
    themselves are sharded: the chain batch is data-parallel over the
    ``chains`` axis while each chain's position/momentum vectors (and any
    per-chain matrices) span the ``model`` axis — XLA inserts the
    reductions for density/gradient dot products and the U-turn criteria
    automatically (tensor parallelism in the scaling-book sense, with
    chains as the data axis).  No reference analogue (the reference holds
    each chain's state on one process); SURVEY.md §2.3 / §5 names sharded
    state vectors as the TPU-native design target for the
    very-high-dimension regime.

    Args:
        n_chain_devices: Devices along the chain (data) axis.
        n_model_devices: Devices along the model (state-vector) axis.
            Default: all remaining available devices.
        devices: Explicit device list in chain-major order.

    Returns:
        ``jax.sharding.Mesh`` with axes ``("chains", "model")``.
    """
    if devices is None:
        devices = jax.devices()
        if n_model_devices is not None:
            devices = devices[: n_chain_devices * n_model_devices]
    devices = np.asarray(devices)
    if devices.size % n_chain_devices != 0:
        msg = (
            f"Number of devices ({devices.size}) is not divisible by "
            f"n_chain_devices ({n_chain_devices})."
        )
        raise ValueError(msg)
    return Mesh(
        devices.reshape(n_chain_devices, -1), (CHAIN_AXIS, MODEL_AXIS),
    )


def _chain_axis_names(mesh):
    """Mesh axes the chain (leading batch) axis is sharded over."""
    return tuple(n for n in mesh.axis_names if n != MODEL_AXIS)


def n_chain_shards(mesh):
    """Number of devices the chain (leading batch) axis spans."""
    return int(np.prod([mesh.shape[n] for n in _chain_axis_names(mesh)],
                       dtype=np.int64))


def chain_sharding(mesh):
    """NamedSharding placing the leading (chain) axis over the mesh.

    For a two-level ``("slice", "chains")`` mesh the chain axis is sharded
    over *both* mesh axes (slice-major), so the flat chain batch spans all
    devices while collectives stay hierarchical.  For a
    ``("chains", "model")`` mesh only the ``chains`` axis is used (the
    ``model`` axis shards trailing state dimensions; see
    :func:`state_sharding`).
    """
    return NamedSharding(mesh, PartitionSpec(_chain_axis_names(mesh)))


def state_sharding(mesh, ndim, trailing_size=None):
    """NamedSharding for a chain-batched state array on a model mesh.

    Leading axis over the chain axes; the *last* axis over ``model`` when
    the mesh has a model axis and ``trailing_size`` divides evenly
    (replicated otherwise — e.g. PRNG key pairs or dimensions that don't
    tile).  Intermediate axes are replicated; XLA's sharding propagation
    decides internal layouts from these input placements.
    """
    chain_axes = _chain_axis_names(mesh)
    if (MODEL_AXIS not in mesh.axis_names or ndim < 2
            or (trailing_size is not None
                and trailing_size % mesh.shape[MODEL_AXIS] != 0)):
        return NamedSharding(mesh, PartitionSpec(chain_axes))
    spec = [chain_axes] + [None] * (ndim - 2) + [MODEL_AXIS]
    return NamedSharding(mesh, PartitionSpec(*spec))


def replicated_sharding(mesh):
    """NamedSharding replicating a value on every device of the mesh."""
    return NamedSharding(mesh, PartitionSpec())


def shard_chain_axis(tree, mesh):
    """Place every array in a chain-batched pytree with its leading axis
    sharded over the mesh's chain axes — and, on a ``("chains", "model")``
    mesh, its trailing (state) axis over ``model`` where it tiles evenly.

    The number of chains (leading axis size) must be divisible by the
    product of the chain mesh axes.
    """
    if MODEL_AXIS in mesh.axis_names:
        def put(x):
            x = np.asarray(x) if not hasattr(x, "ndim") else x
            # Only floating-point leaves are state vectors; integer /
            # key leaves (PRNG keys are uint32 pairs, flags, counters)
            # stay chain-sharded-and-replicated — splitting a key's two
            # 32-bit words across devices would force a gather before
            # every jax.random op in the hot loop.
            is_state = x.ndim >= 2 and jax.numpy.issubdtype(
                x.dtype, jax.numpy.floating)
            return jax.device_put(
                x, state_sharding(mesh, x.ndim,
                                  x.shape[-1] if is_state else None
                                  ) if is_state
                else NamedSharding(mesh,
                                   PartitionSpec(_chain_axis_names(mesh))),
            )
    else:
        sharding = chain_sharding(mesh)

        def put(x):
            return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, tree)


def replicate(tree, mesh):
    """Replicate every array in a pytree across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree,
    )
