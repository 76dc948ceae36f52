"""Device mesh + sharding: the entire distributed backend surface.

The reference's distribution story is NCCL DDP over 8 GPUs
(tools/dist_train.sh, config dist_params; SURVEY §2.4) — pure data
parallelism, gradients all-reduced by the DDP wrapper. The TPU-native
equivalent is declarative: a 1-D ``data`` mesh (ICI within a slice, DCN
across slices), batch-sharded inputs, replicated params, and XLA inserts the
gradient psum during jit. A second ``model`` axis is reserved for future
tensor sharding (the reference has none — SURVEY §2.4).

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh()``
(tools/train.py does when env vars are present).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, model: int = 1) -> Mesh:
    devices = np.asarray(jax.devices())
    if data is None:
        data = devices.size // model
    assert data * model == devices.size, (
        f"mesh {data}x{model} != {devices.size} devices"
    )
    return Mesh(devices.reshape(data, model), ("data", "model"))


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Shard every array's leading (batch) dim over the data axis."""
    def put(x):
        spec = P("data") if getattr(x, "ndim", 0) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
