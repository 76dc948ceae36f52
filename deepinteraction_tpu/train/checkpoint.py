"""Checkpointing: orbax save/restore with the reference's load/resume split.

The reference uses mmcv CheckpointHook (every epoch) plus two distinct
restore modes (tools/train.py:141-142, config L273-274):

- ``load_from``  — params only (warm-start, e.g. the frozen-branch
  pretrained checkpoint 'r50_fpn_voxel_0075.pth'),
- ``resume_from`` — params + optimizer state + step (crash recovery).

Both map onto one orbax CheckpointManager here; ``publish`` strips the
optimizer state like tools/model_converters/publish_model.py.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

from .step import TrainState


def _manager(directory: str, max_to_keep: Optional[int] = None):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        directory,
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_checkpoint(directory: str, state: TrainState, step: int, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    mgr = _manager(os.path.abspath(directory), max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def restore_checkpoint(
    directory: str, target: TrainState, step: Optional[int] = None
) -> TrainState:
    """resume_from semantics: full state (params + opt + step)."""
    import orbax.checkpoint as ocp

    mgr = _manager(os.path.abspath(directory))
    step = mgr.latest_step() if step is None else step
    assert step is not None, f"no checkpoint found under {directory}"
    state = mgr.restore(step, args=ocp.args.StandardRestore(target))
    mgr.close()
    return state


def load_params(directory: str, target: TrainState, step: Optional[int] = None):
    """load_from semantics: params (+ batch_stats) only, fresh optimizer."""
    restored = restore_checkpoint(directory, target, step)
    return target.replace(params=restored.params, batch_stats=restored.batch_stats)


def publish(directory: str, target: TrainState, out_path: str, step: Optional[int] = None):
    """Strip optimizer state for release (publish_model.py analog):
    writes a flat .npz of params + batch_stats."""
    state = restore_checkpoint(directory, target, step)
    flat = {}
    for coll, tree in (("params", state.params), ("batch_stats", state.batch_stats)):
        leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
        for path, leaf in leaves:
            key = coll + "/" + "/".join(
                getattr(p, "key", str(getattr(p, "idx", p))) for p in path
            )
            flat[key] = np.asarray(leaf)
    np.savez(out_path, **flat)
    return out_path
