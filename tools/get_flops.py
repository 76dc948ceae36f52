"""Model FLOPs/param counter (reference tools/analysis_tools/get_flops.py).

Uses XLA's own cost model (``compiled.cost_analysis()``) instead of a
module-hook counter, so fused/optimized FLOPs are what's reported.

    python tools/get_flops.py tiny
    python tools/get_flops.py fusion_base          # full-size trace (slow host)
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", choices=["fusion_base", "fusion_plusplus", "lidar_only", "tiny", "tiny_pp", "tiny_lidar"])
    p.add_argument("--train", action="store_true", help="count the training step")
    args = p.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
    )
    import jax.numpy as jnp

    from deepinteraction_tpu.models.detector import DeepInteraction
    from deepinteraction_tpu.utils.testing import make_synthetic_batch
    from tools.train import get_config

    cfg = get_config(args.config)
    model = DeepInteraction(cfg.model, cfg.data.padded_img_shape)
    batch = {
        k: jnp.asarray(v)
        for k, v in make_synthetic_batch(cfg, b=1, with_gt=args.train).items()
    }
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), batch, False))
    n_params = sum(
        int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(shapes["params"])
    )

    variables = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    if args.train:
        from deepinteraction_tpu.train.step import create_train_state, make_train_step

        state = create_train_state(cfg, variables, 10)
        fn = make_train_step(cfg, model, 10)
        lowered = jax.jit(fn).lower(state, batch, jax.random.PRNGKey(0))
    else:
        lowered = jax.jit(lambda v, b: model.apply(v, b, False)).lower(variables, batch)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = cost.get("flops", float("nan"))
    print(f"params: {n_params/1e6:.2f} M")
    print(f"flops:  {flops/1e9:.2f} GFLOPs per {'step' if args.train else 'forward'}")
    for k in ("bytes accessed", "transcendentals"):
        if k in cost:
            print(f"{k}: {cost[k]:.3e}")


if __name__ == "__main__":
    main()
