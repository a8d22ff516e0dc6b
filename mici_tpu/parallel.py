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


def chain_sharding(mesh):
    """NamedSharding placing the leading (chain) axis over the mesh.

    For a two-level ``("slice", "chains")`` mesh the chain axis is sharded
    over *both* mesh axes (slice-major), so the flat chain batch spans all
    devices while collectives stay hierarchical.
    """
    return NamedSharding(mesh, PartitionSpec(mesh.axis_names))


def replicated_sharding(mesh):
    """NamedSharding replicating a value on every device of the mesh."""
    return NamedSharding(mesh, PartitionSpec())


def shard_chain_axis(tree, mesh):
    """Place every array in a chain-batched pytree with its leading axis
    sharded over the mesh's ``chains`` axis.

    The number of chains (leading axis size) must be divisible by the mesh
    size.
    """
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
