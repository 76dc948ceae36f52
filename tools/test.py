"""Evaluation CLI: checkpoint -> nuScenes val metrics (NDS / mAP / TP errors).

Counterpart of the reference's tools/test.py: bumps num_proposals to 400 at
test time (reference tools/test.py:155), runs the jitted fusion forward over
the val split, decodes boxes on-device, and evaluates with the built-in
devkit-free metric implementation (eval/nuscenes_metrics.py).
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Evaluate DeepInteraction-TPU")
    p.add_argument("config", choices=["fusion_base", "fusion_plusplus", "lidar_only", "tiny", "tiny_pp", "tiny_lidar"])
    p.add_argument("--infos", required=True, help="val info pkl")
    p.add_argument("--checkpoint", default=None, help="orbax checkpoint dir")
    p.add_argument("--out", default=None, help="write raw detections pkl here")
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument(
        "--tta",
        action="store_true",
        help="double-flip test-time augmentation + weighted box fusion "
        "(the -large/-e path; forces batch 1)",
    )
    p.add_argument("--cfg-options", nargs="*", default=[])
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    # mirror JAX_PLATFORMS into the config (env alone is not reliably
    # honored on this runtime — see tools/train.py)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from deepinteraction_tpu.utils.backend import require_live_backend

    require_live_backend()  # bounded probe: a dead TPU tunnel fails loudly
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    import jax.numpy as jnp
    import numpy as np

    from deepinteraction_tpu.configs import apply_overrides
    from deepinteraction_tpu.data import DataLoader, NuScenesDataset
    from deepinteraction_tpu.eval.nuscenes_metrics import evaluate_detections
    from deepinteraction_tpu.eval.results import gt_frame_from_info, predictions_to_frame
    from deepinteraction_tpu.inference import get_bboxes
    from deepinteraction_tpu.models.detector import DeepInteraction
    from deepinteraction_tpu.train.checkpoint import load_params
    from deepinteraction_tpu.train.step import create_train_state
    from deepinteraction_tpu.utils.testing import make_synthetic_batch

    from tools.train import get_config

    # multi-host: shard the val split across processes and gather to rank 0
    # (reference tools/test.py:221-226 multi_gpu_test + collect_results)
    if "JAX_COORDINATOR_ADDRESS" in os.environ:
        jax.distributed.initialize()

    cfg = get_config(args.config)
    if args.cfg_options:
        cfg = apply_overrides(cfg, dict(kv.split("=", 1) for kv in args.cfg_options))

    dataset = NuScenesDataset(cfg, args.infos, train=False)
    n_ldev = jax.local_device_count()
    # TTA runs unsharded (single device) but batched: per-device batch size
    batch_size = (
        cfg.data.samples_per_device if args.tta
        else cfg.data.samples_per_device * n_ldev
    )
    loader = DataLoader(
        dataset,
        batch_size,
        num_workers=args.num_workers,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )

    # test-time proposal bump (reference tools/test.py:155)
    model = DeepInteraction(
        cfg.model, cfg.data.padded_img_shape, num_proposals=cfg.test_num_proposals
    )
    init_batch = {
        k: jnp.asarray(v)
        for k, v in make_synthetic_batch(cfg, b=batch_size).items()
    }
    variables = jax.jit(lambda r, b: model.init(r, b, False))(
        jax.random.PRNGKey(0), init_batch
    )
    if args.checkpoint:
        state = create_train_state(cfg, variables, total_steps=1)
        state = load_params(args.checkpoint, state)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        print(f"loaded params from {args.checkpoint}")

    dcfg = cfg.model.pts_bbox_head
    from deepinteraction_tpu.parallel.input import gather_results, local_mesh
    from deepinteraction_tpu.parallel.mesh import shard_batch

    # batches spread over this process's local devices; eval stays
    # embarrassingly parallel (no cross-process collectives in the forward)
    mesh = local_mesh()

    @jax.jit
    def forward(variables, batch):
        preds = model.apply(variables, batch, False)
        return get_bboxes(preds, dcfg, cfg.model.bbox_coder, cfg.test_num_proposals)

    pred_frames, tokens = [], []
    t0 = time.time()
    n_frames = 0
    for batch in loader.epoch(0, shuffle=False):
        pad = batch.pop("pad_count", 0)
        toks = batch.pop("token")
        # tta stays unsharded (flip_batch runs host-side per variant)
        arrays = (
            {k: jnp.asarray(v) for k, v in batch.items()}
            if args.tta
            else shard_batch(mesh, batch)
        )
        b = len(toks) - pad
        if args.tta:
            from deepinteraction_tpu.eval.nuscenes_metrics import DetectionFrame
            from deepinteraction_tpu.eval.results import default_attribute
            from deepinteraction_tpu.eval.tta import tta_inference

            fused = tta_inference(forward, variables, arrays)
            for i in range(b):
                boxes, scores, labels = fused[i]
                names = np.asarray([cfg.data.class_names[int(j)] for j in labels])
                vel = boxes[:, 7:9]
                pred_frames.append(
                    DetectionFrame(
                        boxes=boxes[:, :7],
                        velocity=vel,
                        names=names,
                        scores=scores,
                        attributes=np.asarray(
                            [
                                default_attribute(n, float(np.linalg.norm(v)))
                                for n, v in zip(names, vel)
                            ]
                        ),
                    )
                )
                tokens.append(toks[i])
        else:
            det = jax.tree_util.tree_map(np.asarray, forward(variables, arrays))
            for i in range(b):
                pred_frames.append(
                    predictions_to_frame(
                        det.boxes[i], det.scores[i], det.labels[i], det.keep[i],
                        cfg.data.class_names,
                    )
                )
                tokens.append(toks[i])
        n_frames += b
        if n_frames % 100 < batch_size:
            print(f"{n_frames}/{len(dataset)} frames, "
                  f"{n_frames / (time.time() - t0):.2f} fps")
    loader.close()

    gathered = gather_results(
        list(zip(tokens, pred_frames)), os.path.join("/tmp", "di_test_gather")
    )
    if gathered is None:
        return None  # non-zero process; rank 0 owns metrics and --out
    tokens = [t for t, _ in gathered]
    pred_frames = [f for _, f in gathered]

    if args.out:
        with open(args.out, "wb") as f:
            pickle.dump({"tokens": tokens, "frames": pred_frames}, f)

    info_by_token = {i["token"]: i for i in dataset.infos}
    gt_frames = [gt_frame_from_info(info_by_token[t]) for t in tokens]
    # devkit range filter measures from the ego pose, not the lidar mount
    from deepinteraction_tpu.eval.results import ego_origin_in_lidar

    for pf, t in zip(pred_frames, tokens):
        pf.ego_translation = ego_origin_in_lidar(info_by_token[t])
    metrics = evaluate_detections(gt_frames, pred_frames, cfg.data.class_names)
    print(json.dumps(metrics, indent=2, sort_keys=True))
    return metrics


if __name__ == "__main__":
    main()
