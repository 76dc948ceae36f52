"""Convert a reference torch checkpoint (.pth) to an orbax checkpoint.

Counterpart of the reference's warm-start path (``load_from =
'pretrained/r50_fpn_voxel_0075.pth'``, config L273): converts the torch
state_dict into our parameter tree and saves it so tools/train.py
--load-from can consume it.

    python tools/convert_torch_ckpt.py fusion_base ckpt.pth out_dir/
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", choices=["fusion_base", "fusion_plusplus", "lidar_only", "tiny", "tiny_lidar"])
    p.add_argument("torch_ckpt")
    p.add_argument("out_dir")
    p.add_argument("--strict", action="store_true", help="fail on any unmatched key")
    args = p.parse_args()

    import numpy as np
    import torch

    import jax

    # env var alone is not reliably honored when a TPU plugin is registered
    # (see tools/train.py); make `JAX_PLATFORMS=cpu` authoritative
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    cache_dir = os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)

    import jax.numpy as jnp

    from deepinteraction_tpu.models.detector import DeepInteraction
    from deepinteraction_tpu.train.checkpoint import save_checkpoint
    from deepinteraction_tpu.train.step import create_train_state
    from deepinteraction_tpu.utils.testing import make_synthetic_batch
    from deepinteraction_tpu.utils.torch_convert import convert_state_dict, load_into_tree

    from tools.train import get_config

    ckpt = torch.load(args.torch_ckpt, map_location="cpu")
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}

    flat, unmatched = convert_state_dict(sd)
    print(f"converted {len(flat)} leaves; {len(unmatched)} source keys unmatched")
    for k in unmatched[:40]:
        print("  unmatched:", k)
    if unmatched and args.strict:
        sys.exit(1)

    cfg = get_config(args.config)
    model = DeepInteraction(cfg.model, cfg.data.padded_img_shape)
    batch = {k: jnp.asarray(v) for k, v in make_synthetic_batch(cfg, b=1).items()}
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), batch, False))
    target = jax.tree_util.tree_map(lambda s: np.zeros(s.shape, s.dtype), shapes)

    variables, missing, shape_errors = load_into_tree(target, flat)
    print(f"{len(missing)} target leaves left at init; {len(shape_errors)} shape errors")
    for k, src, dst in shape_errors[:40]:
        print(f"  SHAPE {k}: ckpt {src} vs model {dst}")
    if shape_errors and args.strict:
        sys.exit(1)

    state = create_train_state(cfg, variables, total_steps=1)
    save_checkpoint(args.out_dir, state, step=0)
    print("saved orbax checkpoint to", args.out_dir)


if __name__ == "__main__":
    main()
