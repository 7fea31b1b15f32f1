"""Device mesh + sharding helpers.

The PEPPER workload is region-sharded data parallelism (the reference does
it with ProcessPoolExecutor over HDF5 files, ImageGenerationUI.py:326-328 /
predict_distributed_cpu.py:200-202).  On TPU the equivalent is one `data`
mesh axis: window batches are sharded over it, model params are replicated,
and training gradients are reduced with psum over the same axis.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"


def get_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over all (or the first n) local devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def resolve_num_devices(num_devices: int | None) -> int:
    """Normalize a --num_devices request against this host's local device
    count: -1/0/None = all local devices, N>0 = min(N, local).  The
    production role of the reference's --callers_per_gpu file fan-out
    (RunInference.py:24-84) — here one process shards batches over chips."""
    local = jax.local_device_count()
    if num_devices is None or num_devices <= 0:
        return local
    return min(num_devices, local)


def local_mesh(num_devices: int | None):
    """Mesh over the first `resolve_num_devices(n)` local devices, or None
    when that resolves to a single device (plain single-chip dispatch)."""
    n = resolve_num_devices(num_devices)
    if n <= 1:
        return None
    return get_mesh(n)


def shard_batch(mesh: Mesh, batch):
    """Place a (B, ...) array batch-sharded over the data axis."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (e.g. model params) on every device of the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def make_global_batch(mesh: Mesh, array):
    """Batch rows -> a batch-sharded array on the mesh.

    Single-process: a plain sharded device_put (shard_batch).  Under
    jax.distributed (multi-host training, the TPU-native equivalent of the
    reference's DDP loop, pepper/.../models/train_distributed.py:254-283):
    every process passes ONLY the rows its own devices hold (its contiguous
    slice of the global batch in mesh-device order) and the global array is
    assembled with jax.make_array_from_process_local_data — no cross-host
    data movement."""
    import jax

    sharding = NamedSharding(mesh, P(DATA_AXIS))
    if jax.process_count() == 1:
        return jax.device_put(array, sharding)
    return jax.make_array_from_process_local_data(sharding, array)


def host_batch_rows(array, process_index: int, process_count: int):
    """This host's contiguous row-slice of a global batch whose length is a
    multiple of the global device count (and therefore of process_count,
    with equal devices per process — mesh-device order groups rows by
    process)."""
    per_host = len(array) // process_count
    return array[process_index * per_host:(process_index + 1) * per_host]


_replicate_cache: dict = {}


def replicate_cached(mesh: Mesh, tree):
    """`replicate` memoized on (mesh, tree identity): prediction loops call
    the wrapper once per HDF5 file / interval with the same host params —
    without the cache every call would re-transfer the weights to every
    device.  One entry per mesh (the entry pins the host tree so its id()
    stays valid); passing a different tree for the same mesh replaces the
    entry, so checkpoint reloads don't accumulate host/device copies."""
    hit = _replicate_cache.get(mesh)
    if hit is not None and hit[0] is tree:
        return hit[1]
    replicated = replicate(mesh, tree)
    _replicate_cache[mesh] = (tree, replicated)
    return replicated


def pad_to_multiple(array, multiple, axis=0):
    """Pad axis 0 up to a multiple (needed to shard uneven batches)."""
    n = array.shape[axis]
    remainder = n % multiple
    if remainder == 0:
        return array, n
    pad = multiple - remainder
    widths = [(0, 0)] * array.ndim
    widths[axis] = (0, pad)
    return np.pad(array, widths), n
