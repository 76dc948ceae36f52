"""Dump the optimized HLO of a model program (eval forward or train step).

Compiles abstractly (ShapeDtypeStructs — no device data, no execution) with
``--xla_dump_to`` set, so the after-optimization module text lands on disk
for fusion-level analysis (pairs with tools/analyze_trace.py: the trace
names ops like ``fusion.294``; the dump says what they compute).

    python tools/dump_hlo.py fusion_plusplus --train --outdir /tmp/xdump
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default="fusion_plusplus")
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--outdir", default="/tmp/xdump")
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_dump_to={args.outdir} --xla_dump_hlo_as_text"
    ).strip()
    # fresh cache dir: a cache hit would skip the compile and thus the dump
    os.environ["JAX_COMPILATION_CACHE_DIR"] = os.path.join(args.outdir, "cache")

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from deepinteraction_tpu.utils.backend import require_live_backend

    require_live_backend()

    import jax.numpy as jnp

    from deepinteraction_tpu.inference import get_bboxes
    from deepinteraction_tpu.models.detector import DeepInteraction
    from deepinteraction_tpu.utils.testing import make_synthetic_batch
    from tools.train import get_config

    cfg = get_config(args.config)
    abstract = lambda tree: jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)), tree
    )

    if args.train:
        from deepinteraction_tpu.configs import apply_overrides
        from deepinteraction_tpu.ops.hungarian import default_lap_impl
        from deepinteraction_tpu.train.step import create_train_state, make_train_step

        cfg = apply_overrides(cfg, {"model.assigner.lap_impl": default_lap_impl()})
        model = DeepInteraction(cfg.model, cfg.data.padded_img_shape)
        batch = make_synthetic_batch(cfg, b=1, seed=0, with_gt=True)
        shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), batch, False))
        variables = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes
        )
        state = create_train_state(cfg, variables, total_steps=1000)
        step_fn = jax.jit(
            make_train_step(cfg, model, total_steps=1000), donate_argnums=0
        )
        lowered = step_fn.lower(
            abstract(state), abstract(batch), abstract(jax.random.PRNGKey(0))
        )
    else:
        model = DeepInteraction(
            cfg.model, cfg.data.padded_img_shape, num_proposals=cfg.test_num_proposals
        )
        batch = make_synthetic_batch(cfg, b=1, seed=0)
        dcfg = cfg.model.pts_bbox_head

        def forward(variables, batch):
            preds = model.apply(variables, batch, False)
            return get_bboxes(preds, dcfg, cfg.model.bbox_coder, cfg.test_num_proposals)

        shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), batch, False))
        lowered = jax.jit(forward).lower(shapes, abstract(batch))

    print("lowered; compiling (dump ->", args.outdir, ")", flush=True)
    compiled = lowered.compile()
    import glob

    txts = sorted(glob.glob(os.path.join(args.outdir, "*after_optimizations.txt")))
    print("dumped:", *txts[-3:], sep="\n  ", flush=True)
    if not txts:
        # axon compiles server-side: --xla_dump_to lands nothing locally.
        # The executable still carries its optimized module.
        out = os.path.join(args.outdir, "after_optimizations.as_text.txt")
        os.makedirs(args.outdir, exist_ok=True)
        with open(out, "w") as f:
            f.write(compiled.as_text())
        print("wrote", out, os.path.getsize(out) // 2**20, "MB", flush=True)


if __name__ == "__main__":
    main()
