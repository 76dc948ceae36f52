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
    p.add_argument(
        "--train",
        action="store_true",
        help="time the full jitted train step (fwd + targets + bwd + AdamW) "
        "instead of the eval forward; reference has no train-FPS harness, "
        "this keeps PERF.md's train numbers reproducible in-repo",
    )
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
    overrides = dict(kv.split("=", 1) for kv in args.cfg_options)
    if args.train and "model.assigner.lap_impl" not in overrides:
        # scipy's callback LAP raises UNIMPLEMENTED under the axon tunnel
        # (tools/train.py does the same auto-detect)
        from deepinteraction_tpu.ops.hungarian import default_lap_impl

        overrides["model.assigner.lap_impl"] = default_lap_impl()
        print("lap_impl:", overrides["model.assigner.lap_impl"])
    if overrides:
        cfg = apply_overrides(cfg, overrides)

    if args.train:
        model = DeepInteraction(cfg.model, cfg.data.padded_img_shape)
    else:
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
                for k, v in make_synthetic_batch(
                    cfg, b=args.batch, seed=s, with_gt=args.train
                ).items()
            }
            # train mode holds fewer distinct batches on device: the ++
            # train program leaves only ~0.5 GB of HBM headroom and each
            # synthetic batch is a few hundred MB (runtime OOM otherwise)
            for s in range(min(args.samples, 2 if args.train else 4))
        ]
    else:
        from deepinteraction_tpu.data import DataLoader, NuScenesDataset

        ds = NuScenesDataset(cfg, args.infos, train=args.train)
        dl = DataLoader(ds, args.batch, num_workers=4)
        # same train-mode resident-batch cap as the synthetic path: the ++
        # train program leaves only ~0.5 GB of HBM headroom (ADVICE r4)
        limit = min(args.samples, 2) if args.train else args.samples
        batches = []
        for b in dl.epoch(0, shuffle=False):
            b.pop("token"), b.pop("pad_count", None)
            batches.append({k: jnp.asarray(v) for k, v in b.items()})
            if len(batches) >= limit:
                break
        dl.close()

    # eval_shape + zeros leaves: a full-size jitted model.init can crash the
    # axon worker (CLAUDE.md); timing is init-value-independent
    variables = fast_init_variables(model, batches[0])

    if args.train:
        from deepinteraction_tpu.train.step import create_train_state, make_train_step

        state = create_train_state(cfg, variables, total_steps=1000)
        # donate the state like the real trainer (tools/train.py:164):
        # XLA aliases params/opt-state in/out (~0.75 GB at 62.7M params)
        step_fn = jax.jit(make_train_step(cfg, model, total_steps=1000), donate_argnums=0)
        rng = jax.random.PRNGKey(0)

        def run(i):
            nonlocal state
            state, metrics = step_fn(state, batches[i % len(batches)], rng)
            # honest fence (axon): host transfer of a scalar
            return np.asarray(metrics["loss_total"]).sum()

        t0 = time.time()
        loss0 = run(0)
        print(f"compile: {time.time() - t0:.1f}s  loss_total={loss0:.2f}")
    else:
        # honest fence: under the axon tunnel block_until_ready returns
        # before the device finishes — a host transfer of a scalar is the
        # only fence
        def run(i):
            return np.asarray(forward(variables, batches[i % len(batches)]).scores).sum()

        t0 = time.time()
        run(0)
        print(f"compile: {time.time() - t0:.1f}s")

    for i in range(args.warmup):
        run(i)

    t0 = time.time()
    for i in range(args.samples):
        run(i)
    dt = (time.time() - t0) / args.samples
    kind = "train steps/sec/chip" if args.train else "frames/sec/chip"
    print(
        f"{args.samples} iters, batch {args.batch}: "
        f"{dt * 1e3:.1f} ms/iter, {args.batch / dt:.2f} {kind} "
        f"on {jax.devices()[0].platform}"
    )


if __name__ == "__main__":
    main()
