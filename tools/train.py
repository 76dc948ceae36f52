"""Training CLI.

TPU-native counterpart of the reference's tools/train.py: config selection
+ dot-path overrides (--cfg-options), deterministic seeding, data-parallel
mesh, cyclic AdamW, per-epoch checkpoints, text + TensorBoard-format JSON
logging with the reference's loss-dict keys.

Usage:
    python tools/train.py fusion_base --work-dir work_dirs/base \
        --infos data/nuscenes_infos_train.pkl \
        --cfg-options optim.total_epochs=6 data.samples_per_device=2
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Train DeepInteraction-TPU")
    p.add_argument("config", choices=["fusion_base", "fusion_plusplus", "lidar_only", "tiny", "tiny_pp", "tiny_lidar"])
    p.add_argument("--infos", required=True, help="train info pkl")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--load-from", default=None, help="params-only warm start dir")
    p.add_argument("--resume-from", default=None, help="full-state resume dir")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument(
        "--profile-steps",
        type=int,
        default=0,
        help="capture a jax.profiler trace of N steps into <work_dir>/trace",
    )
    p.add_argument("--tensorboard", action="store_true")
    p.add_argument(
        "--eval-infos",
        default=None,
        help="val info pkl; evaluate every epoch (reference evaluation "
        "interval=1, config Fusion_0075_refactor.py:12)",
    )
    p.add_argument(
        "--cfg-options",
        nargs="*",
        default=[],
        help="dot-path overrides, e.g. optim.lr=1e-4",
    )
    return p.parse_args()


def get_config(name: str):
    from deepinteraction_tpu.configs import (
        fusion_base_config,
        fusion_plusplus_config,
        tiny_config,
        tiny_pp_config,
    )

    from deepinteraction_tpu.configs import lidar_only_config, tiny_lidar_config

    return {
        "fusion_base": fusion_base_config,
        "fusion_plusplus": fusion_plusplus_config,
        "lidar_only": lidar_only_config,
        "tiny": tiny_config,
        "tiny_pp": tiny_pp_config,
        "tiny_lidar": tiny_lidar_config,
    }[name]()


def main():
    args = parse_args()
    import jax

    # JAX_PLATFORMS in the env alone is not reliably honored on this runtime
    # (the axon plugin registers regardless); mirror it into the config so
    # `JAX_PLATFORMS=cpu python tools/train.py ...` really runs on CPU
    # instead of hanging on a stale TPU tunnel.
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    from deepinteraction_tpu.utils.backend import require_live_backend

    require_live_backend()  # bounded probe: a dead TPU tunnel fails loudly
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from deepinteraction_tpu.configs import apply_overrides
    from deepinteraction_tpu.data import DataLoader, NuScenesDataset
    from deepinteraction_tpu.models.detector import DeepInteraction
    from deepinteraction_tpu.parallel.input import globalize_batch
    from deepinteraction_tpu.parallel.mesh import make_mesh
    from deepinteraction_tpu.train.checkpoint import (
        load_params,
        restore_checkpoint,
        save_checkpoint,
    )
    from deepinteraction_tpu.train.step import create_train_state, make_train_step
    from deepinteraction_tpu.utils.testing import make_synthetic_batch

    # multi-host: one process per host, jax.distributed handles the rest
    if "JAX_COORDINATOR_ADDRESS" in os.environ:
        jax.distributed.initialize()

    cfg = get_config(args.config)
    overrides = dict(kv.split("=", 1) for kv in args.cfg_options)
    if "model.assigner.lap_impl" not in overrides:
        from deepinteraction_tpu.ops.hungarian import default_lap_impl

        overrides["model.assigner.lap_impl"] = default_lap_impl()
        print("lap_impl:", overrides["model.assigner.lap_impl"])
    if overrides:
        cfg = apply_overrides(cfg, overrides)
    work_dir = args.work_dir or cfg.work_dir
    os.makedirs(work_dir, exist_ok=True)
    with open(os.path.join(work_dir, "config.json"), "w") as f:
        json.dump({"config": args.config, "overrides": overrides}, f)

    dataset = NuScenesDataset(
        cfg, args.infos, train=True, use_cbgs=cfg.data.use_cbgs, seed=args.seed
    )
    n_dev = len(jax.devices())
    batch_size = cfg.data.samples_per_device * n_dev  # GLOBAL batch
    # each process loads only its local devices' share; the global batch is
    # assembled by globalize_batch (make_array_from_process_local_data) —
    # a host-local device_put would feed every host identical data
    local_bs = cfg.data.samples_per_device * jax.local_device_count()
    loader = DataLoader(
        dataset,
        local_bs,
        num_workers=args.num_workers,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )
    steps_per_epoch = max(len(dataset) // batch_size, 1)
    total_steps = steps_per_epoch * cfg.optim.total_epochs

    model = DeepInteraction(cfg.model, cfg.data.padded_img_shape)
    rng = jax.random.PRNGKey(args.seed)
    # params don't depend on batch size; init with the LOCAL batch so a big
    # slice doesn't replicate a global-size batch onto every device
    init_batch = {
        k: jnp.asarray(v[:local_bs] if hasattr(v, "shape") else v)
        for k, v in make_synthetic_batch(cfg, b=local_bs, with_gt=True).items()
    }
    variables = jax.jit(lambda r, b: model.init(r, b, False))(rng, init_batch)
    state = create_train_state(cfg, variables, total_steps)

    if args.resume_from:
        state = restore_checkpoint(args.resume_from, state)
        print(f"resumed from {args.resume_from} at step {int(state.step)}")
    elif args.load_from:
        state = load_params(args.load_from, state)
        print(f"warm-started params from {args.load_from}")

    mesh = make_mesh(data=n_dev)
    repl = NamedSharding(mesh, P())
    state = jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), state)
    step_fn = jax.jit(make_train_step(cfg, model, total_steps), donate_argnums=0)

    log_path = os.path.join(work_dir, "train_log.jsonl")
    tb_writer = None
    if args.tensorboard:
        try:
            import tensorflow as tf

            tb_writer = tf.summary.create_file_writer(os.path.join(work_dir, "tb"))
        except ImportError:
            print("tensorboard logging requested but tensorflow unavailable")

    start_epoch = int(state.step) // steps_per_epoch
    for epoch in range(start_epoch, cfg.optim.total_epochs):
        t_data = time.time()
        for it, batch in enumerate(loader.epoch(epoch)):
            if args.profile_steps and int(state.step) == 5:
                jax.profiler.start_trace(os.path.join(work_dir, "trace"))
            if args.profile_steps and int(state.step) == 5 + args.profile_steps:
                jax.profiler.stop_trace()
                print("wrote profiler trace to", os.path.join(work_dir, "trace"))
            batch = globalize_batch(
                mesh, {k: v for k, v in batch.items() if k != "token"}
            )
            data_time = time.time() - t_data
            rng, sub = jax.random.split(rng)
            t0 = time.time()
            state, metrics = step_fn(state, batch, sub)
            if (it + 1) % cfg.optim.log_interval_steps == 0:
                # float() forces a host transfer of the scalar, which is the
                # only honest fence on axon (block_until_ready returns early;
                # CLAUDE.md) — so `time` below is true step latency, not
                # dispatch latency
                metrics = {k: float(v) for k, v in metrics.items()}
                metrics.update(
                    epoch=epoch,
                    iter=it + 1,
                    step=int(state.step),
                    time=time.time() - t0,
                    data_time=data_time,
                )
                print(
                    f"Epoch[{epoch}][{it+1}/{steps_per_epoch}] "
                    f"loss={metrics['loss_total']:.4f} "
                    f"heatmap={metrics['loss_heatmap']:.4f} "
                    f"matched_ious={metrics['matched_ious']:.4f}"
                )
                with open(log_path, "a") as f:
                    f.write(json.dumps(metrics) + "\n")
                if tb_writer is not None:
                    with tb_writer.as_default(step=metrics["step"]):
                        import tensorflow as tf

                        for k, v in metrics.items():
                            if isinstance(v, float):
                                tf.summary.scalar(k, v)
            t_data = time.time()
        if (epoch + 1) % cfg.optim.checkpoint_interval_epochs == 0:
            save_checkpoint(os.path.join(work_dir, "ckpts"), state, int(state.step))
            print(f"saved checkpoint at epoch {epoch}")
        if args.eval_infos:
            metrics = _evaluate(
                cfg, model, state, args.eval_infos, args.num_workers, work_dir
            )
            if metrics is not None:  # process 0 only
                metrics["epoch"] = epoch
                print("eval:", json.dumps(metrics, sort_keys=True))
                with open(os.path.join(work_dir, "eval_log.jsonl"), "a") as f:
                    f.write(json.dumps(metrics) + "\n")
    loader.close()


def _evaluate(cfg, train_model, state, infos, num_workers, work_dir=None):
    """Per-epoch val evaluation with the train-time proposal count.

    Sharded like the reference's distributed test (tools/test.py:221-226):
    batches spread over this process's local devices, the val split stride-
    sharded across processes, predictions gathered to process 0 (which alone
    returns the metric dict; other processes return None).
    """
    import jax
    import numpy as np

    from deepinteraction_tpu.data import DataLoader, NuScenesDataset
    from deepinteraction_tpu.eval.nuscenes_metrics import evaluate_detections
    from deepinteraction_tpu.eval.results import (
        ego_origin_in_lidar,
        gt_frame_from_info,
        predictions_to_frame,
    )
    from deepinteraction_tpu.inference import get_bboxes
    from deepinteraction_tpu.parallel.input import gather_results, local_mesh
    from deepinteraction_tpu.parallel.mesh import shard_batch

    dataset = NuScenesDataset(cfg, infos, train=False)
    batch_size = cfg.data.samples_per_device * jax.local_device_count()
    loader = DataLoader(
        dataset,
        batch_size,
        num_workers=num_workers,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    dcfg = cfg.model.pts_bbox_head
    mesh = local_mesh()

    @jax.jit
    def forward(variables, batch):
        preds = train_model.apply(variables, batch, False)
        return get_bboxes(preds, dcfg, cfg.model.bbox_coder, dcfg.num_proposals)

    frames, tokens = [], []
    for batch in loader.epoch(0, shuffle=False):
        pad = batch.pop("pad_count", 0)
        toks = batch.pop("token")
        det = jax.tree_util.tree_map(
            np.asarray, forward(variables, shard_batch(mesh, batch))
        )
        for i in range(len(toks) - pad):
            frames.append(
                predictions_to_frame(
                    det.boxes[i], det.scores[i], det.labels[i], det.keep[i],
                    cfg.data.class_names,
                )
            )
            tokens.append(toks[i])
    loader.close()
    tmpdir = os.path.join(work_dir or ".", "eval_gather")
    gathered = gather_results(list(zip(tokens, frames)), tmpdir)
    if gathered is None:
        return None  # non-zero process
    tokens = [t for t, _ in gathered]
    frames = [f for _, f in gathered]
    by_tok = {i["token"]: i for i in dataset.infos}
    gts = [gt_frame_from_info(by_tok[t]) for t in tokens]
    for pf, t in zip(frames, tokens):
        pf.ego_translation = ego_origin_in_lidar(by_tok[t])
    return evaluate_detections(gts, frames, cfg.data.class_names)


if __name__ == "__main__":
    main()
