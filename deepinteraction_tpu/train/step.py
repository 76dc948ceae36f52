"""Training state + jitted train step (the runner's compute core).

TPU-native replacement for the reference's mmcv ``EpochBasedRunner`` +
``MMDistributedDataParallel`` step (tools/train.py:237, SURVEY §2.4):

- AdamW with the cyclic LR *and* cyclic momentum (beta1) schedules of the
  reference (config Fusion_0075_refactor.py:252-264), grad clip by global
  norm 0.1 — all inside one optax chain, so the whole update is one XLA
  program.
- branch freezing (``freeze_img`` / ``freeze_pts``,
  models/detectors/deepinteraction.py:60-97) is an ``optax.multi_transform``
  mask: frozen subtrees get zero updates and their BN running statistics are
  carried through unchanged — the functional equivalent of
  ``requires_grad_(False)`` + ``track_running_stats=False``.
- distribution is declarative: callers shard the batch over the mesh's
  ``data`` axis and replicate the state; XLA inserts the gradient
  all-reduce (the reference needs NCCL DDP + ``find_unused_parameters`` for
  exactly this).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct, traverse_util

from ..configs import Config
from ..targets.assign import detection_loss
from .schedules import cyclic_cosine


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


FROZEN_IMG = (("img_backbone",), ("img_neck",))
# The reference's freeze_pts set (deepinteraction.py:71-97) is not just the
# LiDAR trunk: it also pins the warm-started head components — the first
# decoder layer, the LiDAR heatmap head (NOT heatmap_head_img), the first
# prediction FFN, the class encoding, and the shared LiDAR conv in the
# fusion neck — plus their BN running stats (track_running_stats=False).
FROZEN_PTS = (
    ("pts_middle_encoder",),
    ("pts_backbone",),
    ("pts_neck",),
    ("pts_bbox_head", "decoder0"),
    ("pts_bbox_head", "class_encoding"),
    ("pts_bbox_head", "pred0"),
    ("pts_bbox_head", "heatmap_head_0"),
    ("pts_bbox_head", "heatmap_head_1"),
    ("imgpts_neck", "shared_conv_pts"),
)


def frozen_paths(cfg: Config) -> Tuple[Tuple[str, ...], ...]:
    """Param-tree path prefixes frozen by the config's freeze flags."""
    paths: Tuple[Tuple[str, ...], ...] = ()
    if cfg.model.freeze_img:
        paths += FROZEN_IMG
    if cfg.model.freeze_pts:
        paths += FROZEN_PTS
    return paths


def _path_frozen(path: Tuple[str, ...], frozen: Tuple[Tuple[str, ...], ...]) -> bool:
    return any(path[: len(f)] == f for f in frozen)


def make_optimizer(cfg: Config, total_steps: int):
    o = cfg.optim
    lr = cyclic_cosine(
        o.lr, o.lr_target_ratio[0], o.lr_target_ratio[1], o.lr_step_ratio_up, total_steps
    )
    b1 = cyclic_cosine(
        o.momentum_base,
        o.momentum_target_ratio[0],
        o.momentum_target_ratio[1],
        o.momentum_step_ratio_up,
        total_steps,
    )
    inner = optax.inject_hyperparams(
        lambda learning_rate, b1: optax.chain(
            optax.clip_by_global_norm(o.grad_clip_norm),
            optax.adamw(learning_rate, b1=b1, weight_decay=o.weight_decay),
        )
    )(learning_rate=lr, b1=b1)
    frozen = frozen_paths(cfg)
    if not frozen:
        return inner

    def labels(params):
        flat = traverse_util.flatten_dict(params)
        lab = {
            k: ("frozen" if _path_frozen(k, frozen) else "train") for k in flat
        }
        return traverse_util.unflatten_dict(lab)

    return optax.multi_transform(
        {"train": inner, "frozen": optax.set_to_zero()}, labels
    )


def create_train_state(
    cfg: Config, variables: Dict[str, Any], total_steps: int
) -> TrainState:
    params = variables["params"]
    tx = make_optimizer(cfg, total_steps)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
    )


def bev_shape(cfg: Config) -> Tuple[int, int]:
    nx, ny, _ = cfg.model.pts_voxel_layer.grid_size
    osf = cfg.model.bbox_coder.out_size_factor
    return (ny // osf, nx // osf)


def _stop_frozen(params, frozen: Tuple[Tuple[str, ...], ...]):
    """``lax.stop_gradient`` on every frozen param subtree.

    Matches the reference's ``requires_grad_(False)``
    (deepinteraction.py:60-97) EXACTLY: torch never computes gradients for
    frozen leaves (DDP leaves ``p.grad`` None), so grad-clip and grad-norm
    cover trainable params only — and, critically, autodiff never runs
    backward through the frozen trunks at all (their inputs are data).
    Without this, jax.grad materializes the full backward of ResNet-50/FPN
    and the sparse middle encoder only for optax.set_to_zero() to discard
    it — measured as both the dominant train-step time bucket and the
    memory overflow that kept full-size fusion_plusplus training from
    fitting on a 16 GB chip (PERF.md round 4).
    """
    if not frozen:
        return params
    flat = traverse_util.flatten_dict(params)
    flat = {
        k: (jax.lax.stop_gradient(v) if _path_frozen(k, frozen) else v)
        for k, v in flat.items()
    }
    return traverse_util.unflatten_dict(flat)


def make_train_step(cfg: Config, model, total_steps: int):
    """Returns ``step_fn(state, batch, rng) -> (state, metrics)``, jittable.

    ``batch`` carries the detector inputs (models/detector.py docstring) plus
    ``gt_boxes`` [B, G, 9], ``gt_labels`` [B, G] int32, ``gt_mask`` [B, G].
    """
    tx = make_optimizer(cfg, total_steps)
    frozen = frozen_paths(cfg)
    bshape = bev_shape(cfg)
    dcfg = cfg.model.pts_bbox_head
    ccfg = cfg.model.bbox_coder
    acfg = cfg.model.assigner

    def step_fn(state: TrainState, batch: Dict[str, Any], rng) -> Tuple[TrainState, Dict]:
        def loss_fn(params):
            preds, mutated = model.apply(
                {"params": _stop_frozen(params, frozen), "batch_stats": state.batch_stats},
                batch,
                True,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            losses = detection_loss(
                preds,
                batch["gt_boxes"],
                batch["gt_labels"],
                batch["gt_mask"],
                dcfg,
                ccfg,
                acfg,
                bshape,
            )
            return losses["loss_total"], (losses, mutated.get("batch_stats", {}))

        (_, (losses, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # frozen branches keep their running BN statistics (reference
        # track_running_stats=False semantics, deepinteraction.py:85-97)
        if new_bs:
            flat_new = traverse_util.flatten_dict(new_bs)
            flat_old = traverse_util.flatten_dict(state.batch_stats)
            new_bs = traverse_util.unflatten_dict(
                {
                    k: (flat_old[k] if _path_frozen(k, frozen) and k in flat_old else v)
                    for k, v in flat_new.items()
                }
            )
        else:
            new_bs = state.batch_stats
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
        )
        metrics = dict(losses)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return step_fn
