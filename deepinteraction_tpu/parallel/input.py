"""Multi-host input feeding and result gathering.

The reference's 8-process DDP (tools/dist_train.sh:8) gives every process
its own loader shard and all-gathers eval results (tools/test.py:221-226,
mmcv ``collect_results_cpu``). The TPU-native equivalents:

* each process loads only the samples destined for ITS local devices and
  assembles the global batch with ``jax.make_array_from_process_local_data``
  (a plain ``device_put`` of a host-local batch onto a global sharding
  would silently feed every host the same data);
* eval shards the val split per process, runs embarrassingly parallel on
  the process's local devices, and merges with a file-based gather (the
  same design as mmcv's tmpdir ``collect_results_cpu``) behind a
  ``sync_global_devices`` barrier.

Everything degrades to the identity on a single process, so the same code
path runs on one chip, one host with 8 chips, and a multi-host slice.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, List, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def process_shard_indices(
    ids: Sequence[int],
    local_batch: int,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
    drop_last: bool = True,
) -> List[int]:
    """This process's slice of a globally-shuffled index list.

    Stride slicing keeps every process's shard length within 1 of each
    other; ``drop_last`` then trims all shards to the MINIMUM shard's
    whole-batch count so every process runs the same number of steps
    (divergent step counts deadlock the gradient psum).
    """
    pid = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    mine = list(ids[pid::pc])
    if drop_last:
        min_len = len(ids) // pc  # the shortest process shard
        n_batches = min_len // local_batch
        mine = mine[: n_batches * local_batch]
    return mine


def globalize_batch(mesh: Mesh, batch: Any) -> Any:
    """Assemble a global batch-sharded array tree from per-process data.

    Every leaf with a leading batch dim becomes a global array sharded
    P("data") whose shards on this host come from this host's ``batch``;
    scalars are replicated. Single-process this equals
    ``device_put(x, NamedSharding(mesh, P("data")))``.
    """
    data_sh = NamedSharding(mesh, P("data"))
    repl_sh = NamedSharding(mesh, P())

    def put(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, repl_sh)
        return jax.make_array_from_process_local_data(data_sh, x)

    return jax.tree_util.tree_map(put, batch)


def local_mesh(data: Optional[int] = None, model: int = 1) -> Mesh:
    """Mesh over THIS process's devices only (embarrassingly-parallel eval)."""
    devices = np.asarray(jax.local_devices())
    if data is None:
        data = devices.size // model
    assert data * model == devices.size
    return Mesh(devices.reshape(data, model), ("data", "model"))


def gather_results(
    items: List[Any],
    tmpdir: str = "",
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> Optional[List[Any]]:
    """Cross-process result gather over the ICI/DCN collectives.

    The reference's mmcv ``collect_results_cpu`` (tools/test.py:221-226)
    writes ``part_<rank>.pkl`` files to a shared tmpdir — an assumption that
    silently breaks on multi-host TPU slices, where hosts do NOT share a
    filesystem, and can merge STALE part files left by a previous run
    (ADVICE r2 #2). Here each process pickles its ``items`` and the bytes
    ride ``multihost_utils.process_allgather`` (length-allgather, pad to the
    global max, allgather the padded payloads) — no filesystem involved.

    Process 0 returns the concatenation in process order; every other
    process returns None (mmcv contract). Single-process returns ``items``
    directly. ``tmpdir`` is retained for API compatibility and ignored.
    """
    del tmpdir  # no filesystem involvement; kept for call-site compat
    pid = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if pc == 1:
        return items
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(items), dtype=np.uint8)
    lengths = multihost_utils.process_allgather(
        np.asarray([payload.size], np.int64)
    ).reshape(-1)
    padded = np.zeros((int(lengths.max()),), np.uint8)
    padded[: payload.size] = payload
    parts = multihost_utils.process_allgather(padded)  # [pc, max_len]
    if pid != 0:
        return None
    merged: List[Any] = []
    for k in range(pc):
        merged.extend(pickle.loads(parts[k, : int(lengths[k])].tobytes()))
    return merged
