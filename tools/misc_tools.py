"""Misc tools: print_config, fuse_conv_bn, visualize_results, browse_dataset
(reference tools/misc/*).

    python tools/misc_tools.py print_config fusion_base
    python tools/misc_tools.py fuse_conv_bn fusion_base --checkpoint ck/ --out fused/
    python tools/misc_tools.py visualize_results --detections det.pkl --infos val.pkl --out viz/
    python tools/misc_tools.py browse_dataset tiny --infos train.pkl --out viz/
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def print_config(args):
    from tools.train import get_config

    cfg = get_config(args.config)
    print(json.dumps(dataclasses.asdict(cfg), indent=2, default=str))


def fuse(args):
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
    )
    import jax.numpy as jnp

    from deepinteraction_tpu.models.detector import DeepInteraction
    from deepinteraction_tpu.train.checkpoint import load_params, save_checkpoint
    from deepinteraction_tpu.train.step import create_train_state
    from deepinteraction_tpu.utils.fuse_bn import fuse_conv_bn
    from deepinteraction_tpu.utils.testing import make_synthetic_batch
    from tools.train import get_config

    cfg = get_config(args.config)
    model = DeepInteraction(cfg.model, cfg.data.padded_img_shape)
    batch = {k: jnp.asarray(v) for k, v in make_synthetic_batch(cfg, b=1).items()}
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    state = create_train_state(cfg, variables, 1)
    if args.checkpoint:
        state = load_params(args.checkpoint, state)
    params, stats, n = fuse_conv_bn(state.params, state.batch_stats)
    print(f"fused {n} conv+bn pairs")
    save_checkpoint(args.out, state.replace(params=params, batch_stats=stats), 0)


def _draw_bev(ax, boxes, color, label=None):
    import numpy as np

    for b in boxes:
        x, y, dx, dy, yaw = b[0], b[1], b[3], b[4], b[6]
        c, s = np.cos(yaw), np.sin(yaw)
        corners = np.array(
            [[dx / 2, dy / 2], [dx / 2, -dy / 2], [-dx / 2, -dy / 2], [-dx / 2, dy / 2], [dx / 2, dy / 2]]
        )
        rot = corners @ np.array([[c, s], [-s, c]])
        ax.plot(rot[:, 0] + x, rot[:, 1] + y, color=color, linewidth=0.7, label=label)
        label = None


def visualize_results(args):
    import pickle

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from deepinteraction_tpu.data.dataset import load_infos

    with open(args.detections, "rb") as f:
        det = pickle.load(f)
    infos = {i["token"]: i for i in load_infos(args.infos)}
    os.makedirs(args.out, exist_ok=True)
    for token, frame in list(zip(det["tokens"], det["frames"]))[: args.limit]:
        fig, ax = plt.subplots(figsize=(8, 8))
        info = infos.get(token)
        if info is not None and len(info.get("gt_boxes", ())):
            _draw_bev(ax, info["gt_boxes"], "tab:green", "gt")
        keep = frame.scores > args.score_thr
        _draw_bev(ax, frame.boxes[keep], "tab:red", "pred")
        ax.set_xlim(-60, 60)
        ax.set_ylim(-60, 60)
        ax.set_aspect("equal")
        ax.legend(loc="upper right")
        fig.savefig(os.path.join(args.out, f"{token}.png"), dpi=100, bbox_inches="tight")
        plt.close(fig)
    print("wrote", min(len(det["tokens"]), args.limit), "BEV plots to", args.out)


def browse_dataset(args):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from deepinteraction_tpu.data import NuScenesDataset
    from tools.train import get_config

    cfg = get_config(args.config)
    ds = NuScenesDataset(cfg, args.infos, train=True, use_cbgs=False)
    os.makedirs(args.out, exist_ok=True)
    for i in range(min(len(ds), args.limit)):
        s = ds[i]
        fig, ax = plt.subplots(figsize=(8, 8))
        pts = s["points"][s["points_mask"]]
        ax.scatter(pts[:, 0], pts[:, 1], s=0.2, c=pts[:, 2], cmap="viridis")
        if "gt_boxes" in s:
            _draw_bev(ax, s["gt_boxes"][s["gt_mask"]], "tab:red", "gt")
        ax.set_aspect("equal")
        fig.savefig(os.path.join(args.out, f"sample{i}.png"), dpi=100, bbox_inches="tight")
        plt.close(fig)
    print("wrote", min(len(ds), args.limit), "pipeline visualizations to", args.out)


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    pc = sub.add_parser("print_config")
    pc.add_argument("config", choices=["fusion_base", "fusion_plusplus", "lidar_only", "tiny", "tiny_lidar"])
    pc.set_defaults(fn=print_config)

    fb = sub.add_parser("fuse_conv_bn")
    fb.add_argument("config", choices=["fusion_base", "fusion_plusplus", "lidar_only", "tiny", "tiny_lidar"])
    fb.add_argument("--checkpoint", default=None)
    fb.add_argument("--out", required=True)
    fb.set_defaults(fn=fuse)

    vr = sub.add_parser("visualize_results")
    vr.add_argument("--detections", required=True)
    vr.add_argument("--infos", required=True)
    vr.add_argument("--out", required=True)
    vr.add_argument("--score-thr", type=float, default=0.1)
    vr.add_argument("--limit", type=int, default=20)
    vr.set_defaults(fn=visualize_results)

    bd = sub.add_parser("browse_dataset")
    bd.add_argument("config", choices=["fusion_base", "fusion_plusplus", "lidar_only", "tiny", "tiny_lidar"])
    bd.add_argument("--infos", required=True)
    bd.add_argument("--out", required=True)
    bd.add_argument("--limit", type=int, default=10)
    bd.set_defaults(fn=browse_dataset)

    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
