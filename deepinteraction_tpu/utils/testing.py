"""Synthetic batch builders for tests, dry-runs, and benchmarks.

Produces inputs matching the detector's static-shape batch contract
(models/detector.py docstring) without needing nuScenes on disk. Geometry is
plausible: points inside the configured pc_range, pinhole lidar2img matrices
with alternating forward/backward-facing views.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..configs import Config


def fast_init_variables(model, batch, seed: int = 0):
    """Variables with init-like statistics WITHOUT compiling ``model.init``.

    ``jax.eval_shape`` traces the init (no compile, no device work), then each
    leaf is filled host-side by name heuristics: norm scales / running vars
    get ones, biases / running means get zeros, everything else small
    Gaussian fan-in-ish noise. Used by the driver dry-run and benchmarks
    where exact init values don't matter but a full ``model.init`` compile
    (55 s on TPU, minutes on the throttled CPU host — CLAUDE.md) does.
    """
    import jax
    import jax.numpy as jnp

    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), batch, False)
    )
    rng = np.random.default_rng(seed)
    flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)

    def fill(path, leaf):
        name = str(path[-1]).lower()
        if "scale" in name or "var" in name:
            return jnp.ones(leaf.shape, leaf.dtype)
        if "bias" in name or "mean" in name:
            return jnp.zeros(leaf.shape, leaf.dtype)
        fan_in = int(np.prod(leaf.shape[:-1])) if leaf.ndim >= 2 else 1
        std = 1.0 / max(1.0, float(fan_in)) ** 0.5
        return jnp.asarray(
            rng.normal(scale=std, size=leaf.shape).astype(np.float32),
            dtype=leaf.dtype,
        )

    return jax.tree_util.tree_unflatten(
        treedef, [fill(p, l) for p, l in flat]
    )


def make_synthetic_batch(
    cfg: Config, b: int = 1, seed: int = 0, with_gt: bool = False
) -> Dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    d = cfg.data
    v = d.num_views
    h, w = d.padded_img_shape
    n = d.max_points
    pcr = cfg.model.pts_voxel_layer.point_cloud_range

    pts = np.empty((b, n, 5), np.float32)
    pts[..., 0] = rng.uniform(pcr[0] * 0.9, pcr[3] * 0.9, size=(b, n))
    pts[..., 1] = rng.uniform(pcr[1] * 0.9, pcr[4] * 0.9, size=(b, n))
    pts[..., 2] = rng.uniform(pcr[2] * 0.8, pcr[5] * 0.8, size=(b, n))
    pts[..., 3] = rng.uniform(0.0, 255.0, size=(b, n))
    pts[..., 4] = 0.0
    mask = rng.uniform(size=(b, n)) > 0.3

    imgs = rng.normal(size=(b, v, h, w, 3)).astype(np.float32)

    l2i = np.zeros((b, v, 4, 4), np.float32)
    focal = 0.6 * w
    for i in range(v):
        intr = np.eye(4, dtype=np.float32)
        intr[0, 0] = focal
        intr[1, 1] = focal
        intr[0, 2] = w / 2
        intr[1, 2] = h / 2
        ang = 2.0 * np.pi * i / v
        # camera looks outward at azimuth `ang`; rows of lidar2cam are the
        # camera axes in the lidar frame: x right, y down, z forward
        rot = np.eye(4, dtype=np.float32)
        c, s = np.cos(ang), np.sin(ang)
        rot[0, :3] = (s, -c, 0.0)
        rot[1, :3] = (0.0, 0.0, -1.0)
        rot[2, :3] = (c, s, 0.0)
        l2i[:, i] = intr @ rot
    eye = np.broadcast_to(np.eye(4, dtype=np.float32), (b, 4, 4)).copy()

    c2l = np.linalg.inv(l2i.astype(np.float64)).astype(np.float32)  # intr folded in
    batch = {
        "points": pts,
        "points_mask": mask,
        "images": imgs,
        "lidar2img": l2i,
        "img2lidar": np.linalg.inv(l2i),
        "cam2lidar": c2l,
        "lidar_aug": eye,
        "lidar_aug_inv": eye,
    }
    if with_gt:
        g = d.max_gt_boxes
        gt = np.zeros((b, g, 9), np.float32)
        gt[..., 0] = rng.uniform(pcr[0] * 0.7, pcr[3] * 0.7, size=(b, g))
        gt[..., 1] = rng.uniform(pcr[1] * 0.7, pcr[4] * 0.7, size=(b, g))
        gt[..., 2] = rng.uniform(-2.0, 0.0, size=(b, g))
        gt[..., 3:6] = rng.uniform(0.5, 4.0, size=(b, g, 3))
        gt[..., 6] = rng.uniform(-np.pi, np.pi, size=(b, g))
        gt[..., 7:9] = rng.normal(scale=0.5, size=(b, g, 2))
        n_real = max(2, g // 2)
        batch["gt_boxes"] = gt
        batch["gt_labels"] = rng.integers(
            0, cfg.model.pts_bbox_head.num_classes, size=(b, g)
        ).astype(np.int32)
        batch["gt_mask"] = (np.arange(g)[None] < n_real) & np.ones((b, 1), bool)
    return batch
