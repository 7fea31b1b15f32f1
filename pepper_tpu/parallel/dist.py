"""Multi-host region-sharded execution.

The reference's parallelism is process-pool + HDF5 files with silently
dropped shards on worker death (ImageGenerationUI.py:330-339 logs and
continues).  Here shard completion is explicit: a region manifest records
every interval, hosts claim intervals deterministically (interval i belongs
to host i mod n_hosts — no coordination needed), and done-markers make
resume exact (SURVEY.md §5.3).

Device-level collectives: when `jax.distributed` is initialized the decode
merge can all-gather per-host candidate arrays over ICI/DCN
(process_allgather); the filesystem path (per-host prediction files +
rank-0 merge) is the default because candidate records are ragged strings
and the global sort at decode (CandidateFinder.py:549-550) is
order-independent, so any gather order is safe.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None):
    """Initialize jax.distributed when running multi-host; no-op otherwise.
    Returns (process_index, process_count)."""
    import jax

    if coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    try:
        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


def shard_intervals(intervals, process_index: int, process_count: int):
    """Deterministic round-robin interval assignment (the reference's
    `i % threads == pid` scheme, ImageGenerationUI.py:211, lifted to
    hosts)."""
    return [interval for i, interval in enumerate(intervals)
            if i % process_count == process_index]


@dataclass
class RegionManifest:
    """JSON manifest of work intervals + done-markers for exact resume."""

    directory: str

    @property
    def manifest_path(self) -> str:
        return os.path.join(self.directory, "region_manifest.json")

    def _marker(self, interval) -> str:
        contig, start, end = interval
        return os.path.join(self.directory, "done",
                            f"{contig}_{start}_{end}.done")

    def write(self, intervals) -> None:
        os.makedirs(os.path.join(self.directory, "done"), exist_ok=True)
        with open(self.manifest_path, "w") as f:
            json.dump({"intervals": [list(i) for i in intervals]}, f)

    def read(self):
        with open(self.manifest_path) as f:
            return [tuple(i) for i in json.load(f)["intervals"]]

    def mark_done(self, interval) -> None:
        with open(self._marker(interval), "w") as f:
            f.write("done\n")

    def is_done(self, interval) -> bool:
        return os.path.exists(self._marker(interval))

    def pending(self):
        return [interval for interval in self.read()
                if not self.is_done(interval)]

    def completed(self):
        return [interval for interval in self.read()
                if self.is_done(interval)]


def all_gather_rows(local_array):
    """All-gather a (n_i, d) float/int array across hosts; returns the
    concatenation on every host.  Requires jax.distributed init; on a
    single host it is the identity."""
    import jax
    import numpy as np

    if jax.process_count() == 1:
        return np.asarray(local_array)
    from jax.experimental import multihost_utils

    return np.asarray(
        multihost_utils.process_allgather(local_array, tiled=True))


def barrier(name: str = "pepper") -> None:
    import jax

    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
