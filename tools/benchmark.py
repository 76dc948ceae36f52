"""Inference FPS benchmark CLI (reference tools/analysis_tools/benchmark.py).

Measures the jitted fusion forward on real (or synthetic) data with warmup
and blocking timing — frames/sec/chip is the framework's north-star number.

    python tools/benchmark.py fusion_base --infos data/nuscenes_infos_val.pkl
    python tools/benchmark.py fusion_base --synthetic   # no dataset needed
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", choices=["fusion_base", "fusion_plusplus", "lidar_only", "tiny", "tiny_pp", "tiny_lidar"])
    p.add_argument("--infos", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--samples", type=int, default=50)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--cfg-options", nargs="*", default=[])
    args = p.parse_args()

    import jax

    # mirror JAX_PLATFORMS into the config + persistent compile cache
    # (see tools/train.py)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from deepinteraction_tpu.utils.backend import require_live_backend

    require_live_backend()  # bounded probe: a dead TPU tunnel fails loudly
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
    )
    import jax.numpy as jnp
    import numpy as np

    from deepinteraction_tpu.configs import apply_overrides
    from deepinteraction_tpu.inference import get_bboxes
    from deepinteraction_tpu.models.detector import DeepInteraction
    from deepinteraction_tpu.utils.testing import fast_init_variables, make_synthetic_batch

    from tools.train import get_config

    cfg = get_config(args.config)
    if args.cfg_options:
        cfg = apply_overrides(cfg, dict(kv.split("=", 1) for kv in args.cfg_options))

    model = DeepInteraction(
        cfg.model, cfg.data.padded_img_shape, num_proposals=cfg.test_num_proposals
    )
    dcfg = cfg.model.pts_bbox_head

    @jax.jit
    def forward(variables, batch):
        preds = model.apply(variables, batch, False)
        return get_bboxes(preds, dcfg, cfg.model.bbox_coder, cfg.test_num_proposals)

    if args.synthetic or not args.infos:
        batches = [
            {
                k: jnp.asarray(v)
                for k, v in make_synthetic_batch(cfg, b=args.batch, seed=s).items()
            }
            for s in range(min(args.samples, 4))
        ]
    else:
        from deepinteraction_tpu.data import DataLoader, NuScenesDataset

        ds = NuScenesDataset(cfg, args.infos, train=False)
        dl = DataLoader(ds, args.batch, num_workers=4)
        batches = []
        for b in dl.epoch(0, shuffle=False):
            b.pop("token"), b.pop("pad_count", None)
            batches.append({k: jnp.asarray(v) for k, v in b.items()})
            if len(batches) >= args.samples:
                break
        dl.close()

    # eval_shape + zeros leaves: a full-size jitted model.init can crash the
    # axon worker (CLAUDE.md); timing is init-value-independent
    variables = fast_init_variables(model, batches[0])

    # honest fence: under the axon tunnel block_until_ready returns before
    # the device finishes — a host transfer of a scalar is the only fence
    fence = lambda o: np.asarray(o.scores).sum()

    t0 = time.time()
    fence(forward(variables, batches[0]))
    print(f"compile: {time.time() - t0:.1f}s")
    for i in range(args.warmup):
        fence(forward(variables, batches[i % len(batches)]))

    t0 = time.time()
    for i in range(args.samples):
        fence(forward(variables, batches[i % len(batches)]))
    dt = (time.time() - t0) / args.samples
    print(
        f"{args.samples} iters, batch {args.batch}: "
        f"{dt * 1e3:.1f} ms/iter, {args.batch / dt:.2f} frames/sec/chip "
        f"on {jax.devices()[0].platform}"
    )


if __name__ == "__main__":
    main()
