"""Benchmark: DeepInteraction-base full fusion forward, frames/sec/chip.

Counterpart of the reference's ``tools/analysis_tools/benchmark.py`` (FPS
with warmup + synchronized timing, reference L64-91), but the whole forward
— dual voxelization, sparse middle encoder, ResNet+FPN, MMRI fusion, MMPI
decoding, box decode — is ONE jitted XLA program with zero host round-trips
(the reference crosses the device boundary for cv2 depth completion every
forward, SURVEY §3.1).

Prints one JSON line: frames/sec/chip vs the BASELINE.json target of
15 fps/chip. The detail block carries the roofline join (VERDICT r3 #2):
XLA cost-model flops + bytes per frame, achieved TFLOP/s and GB/s, MFU and
HBM utilization against the chip's peaks, and the same for the
fusion_plusplus flagship (skipped with DI_BENCH_PP=0).
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

from deepinteraction_tpu.configs import fusion_base_config, fusion_plusplus_config
from deepinteraction_tpu.inference import get_bboxes
from deepinteraction_tpu.models.detector import DeepInteraction
from deepinteraction_tpu.utils.testing import make_synthetic_batch

BASELINE_FPS = 15.0  # BASELINE.json: ">=15 frames/sec/chip on v5p"
WARMUP = 3
ITERS = 10

# chip peaks for the MFU/roofline join (bf16 MXU peak, HBM bandwidth).
# v5e: 197 TFLOP/s bf16, 16 GB HBM @ 819 GB/s. v5p: 459 TFLOP/s, 2765 GB/s.
CHIP_PEAKS = {
    "v5 lite": (197e12, 819e9),
    "v5e": (197e12, 819e9),
    "v5p": (459e12, 2765e9),
    "v4": (275e12, 1228e9),
}


def chip_peaks() -> tuple:
    kind = getattr(jax.devices()[0], "device_kind", "").lower()
    for key, peaks in CHIP_PEAKS.items():
        if key in kind:
            return peaks
    return (float("nan"), float("nan"))


def measure(cfg) -> dict:
    """Compile + time one config's eval forward; join with the cost model."""
    batch = {
        k: jnp.asarray(v) for k, v in make_synthetic_batch(cfg, b=1, seed=0).items()
    }
    model = DeepInteraction(
        cfg.model, cfg.data.padded_img_shape, num_proposals=cfg.test_num_proposals
    )

    t0 = time.time()
    # NB: never run a full-size model.init eagerly on the TPU (axon worker
    # crash) — build zero leaves from eval_shape instead.
    variables = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), batch, False))
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), variables
    )
    init_s = time.time() - t0

    dcfg = cfg.model.pts_bbox_head

    @jax.jit
    def forward(variables, batch):
        preds = model.apply(variables, batch, False)
        return get_bboxes(preds, dcfg, cfg.model.bbox_coder, cfg.test_num_proposals)

    # NB: under the axon tunnel block_until_ready returns before the device
    # finishes; a host transfer (np.asarray) is the only honest fence.
    fence = lambda o: np.asarray(o.scores).sum()

    t0 = time.time()
    fence(forward(variables, batch))
    compile_s = time.time() - t0

    for _ in range(WARMUP):
        fence(forward(variables, batch))

    t0 = time.time()
    for _ in range(ITERS):
        fence(forward(variables, batch))
    per_frame = (time.time() - t0) / ITERS

    # roofline join: XLA's own cost model for the compiled program
    flops = bytes_ = float("nan")
    try:
        cost = forward.lower(variables, batch).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", float("nan")))
        bytes_ = float(cost.get("bytes accessed", float("nan")))
    except Exception as e:  # cost model is diagnostic, never fail the bench
        print(f"bench.py: cost_analysis unavailable ({e})", file=sys.stderr)

    peak_flops, peak_bw = chip_peaks()
    out = {
        "fps": 1.0 / per_frame,
        "ms_per_frame": per_frame * 1e3,
        "compile_s": round(compile_s, 1),
        "init_s": round(init_s, 1),
        "flops_per_frame": flops,
        "bytes_per_frame": bytes_,
        "achieved_tflops": flops / per_frame / 1e12,
        "achieved_gbps": bytes_ / per_frame / 1e9,
        "mfu": flops / per_frame / peak_flops,
        "hbm_util": bytes_ / per_frame / peak_bw,
    }
    return {
        k: (round(v, 4) if isinstance(v, float) and np.isfinite(v) else v)
        for k, v in out.items()
    }


def measure_train(cfg, warmup: int = 1, iters: int = 3) -> dict:
    """Time the full jitted train step (forward + Hungarian targets + loss +
    backward + cyclic AdamW, branch freezing) — the other half of "matching
    the reference on perf" (VERDICT r4 #4: train numbers were PERF.md prose
    only, invisible to round-over-round machine tracking)."""
    import dataclasses

    from deepinteraction_tpu.configs import apply_overrides
    from deepinteraction_tpu.ops.hungarian import default_lap_impl
    from deepinteraction_tpu.train.step import create_train_state, make_train_step
    from deepinteraction_tpu.utils.testing import fast_init_variables

    # scipy's callback LAP raises UNIMPLEMENTED under the axon tunnel
    cfg = apply_overrides(cfg, {"model.assigner.lap_impl": default_lap_impl()})
    model = DeepInteraction(cfg.model, cfg.data.padded_img_shape)
    batch = {
        k: jnp.asarray(v)
        for k, v in make_synthetic_batch(cfg, b=1, seed=0, with_gt=True).items()
    }
    variables = fast_init_variables(model, batch)
    state = create_train_state(cfg, variables, total_steps=1000)
    # donate the state like the real trainer (tools/train.py): XLA aliases
    # params/opt-state in/out — the ++ train program needs the headroom
    step_fn = jax.jit(make_train_step(cfg, model, total_steps=1000), donate_argnums=0)
    rng = jax.random.PRNGKey(0)

    def run():
        nonlocal state
        state, metrics = step_fn(state, batch, rng)
        return float(np.asarray(metrics["loss_total"]))  # honest axon fence

    t0 = time.time()
    loss0 = run()
    compile_s = time.time() - t0
    for _ in range(warmup):
        run()
    t0 = time.time()
    for _ in range(iters):
        run()
    per_step = (time.time() - t0) / iters
    return {
        "ms_per_step": round(per_step * 1e3, 1),
        "steps_per_sec": round(1.0 / per_step, 4),
        "compile_s": round(compile_s, 1),
        "loss_total_step0": round(loss0, 2),
        "lap_impl": cfg.model.assigner.lap_impl,
    }


def main() -> None:
    from deepinteraction_tpu.utils.backend import require_live_backend

    try:
        require_live_backend()
    except RuntimeError as e:
        print(f"bench.py: {e}", file=sys.stderr, flush=True)
        raise SystemExit(3)

    base = measure(fusion_base_config())

    pp = None
    if os.environ.get("DI_BENCH_PP", "1") == "1":
        try:
            pp = measure(fusion_plusplus_config())
        except Exception as e:  # the flagship line is detail, not the headline
            print(f"bench.py: fusion_plusplus measurement failed ({e})", file=sys.stderr)

    # train-step timing for both shipped configs (detail, never the headline;
    # DI_BENCH_TRAIN=0 skips when the bench budget is tight)
    base_train = pp_train = None
    if os.environ.get("DI_BENCH_TRAIN", "1") == "1":
        try:
            base_train = measure_train(fusion_base_config())
        except Exception as e:
            print(f"bench.py: fusion_base train measurement failed ({e})", file=sys.stderr)
        try:
            pp_train = measure_train(fusion_plusplus_config())
        except Exception as e:
            print(f"bench.py: fusion_plusplus train measurement failed ({e})", file=sys.stderr)

    detail = {
        "batch": 1,
        "device": str(jax.devices()[0].platform),
        "device_kind": getattr(jax.devices()[0], "device_kind", "unknown"),
        "fusion_base": base,
        "fusion_plusplus": pp,
        "fusion_base_train": base_train,
        "fusion_plusplus_train": pp_train,
    }
    print(
        json.dumps(
            {
                "metric": "deepinteraction_base_fusion_forward_fps_per_chip",
                "value": round(base["fps"], 3),
                "unit": "frames/sec/chip",
                "vs_baseline": round(base["fps"] / BASELINE_FPS, 3),
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
