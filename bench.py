"""Benchmark: DeepInteraction-base full fusion forward, frames/sec/chip.

Counterpart of the reference's ``tools/analysis_tools/benchmark.py`` (FPS
with warmup + synchronized timing, reference L64-91), but the whole forward
— dual voxelization, sparse middle encoder, ResNet+FPN, MMRI fusion, MMPI
decoding, box decode — is ONE jitted XLA program with zero host round-trips
(the reference crosses the device boundary for cv2 depth completion every
forward, SURVEY §3.1).

Prints one JSON line: frames/sec/chip vs the BASELINE.json target of
15 fps/chip.
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

from deepinteraction_tpu.configs import fusion_base_config
from deepinteraction_tpu.inference import get_bboxes
from deepinteraction_tpu.models.detector import DeepInteraction
from deepinteraction_tpu.utils.testing import make_synthetic_batch

BASELINE_FPS = 15.0  # BASELINE.json: ">=15 frames/sec/chip on v5p"
WARMUP = 3
ITERS = 10


def main() -> None:
    from deepinteraction_tpu.utils.backend import require_live_backend

    try:
        require_live_backend()
    except RuntimeError as e:
        print(f"bench.py: {e}", file=sys.stderr, flush=True)
        raise SystemExit(3)
    cfg = fusion_base_config()
    batch_np = make_synthetic_batch(cfg, b=1, seed=0)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    model = DeepInteraction(
        cfg.model, cfg.data.padded_img_shape, num_proposals=cfg.test_num_proposals
    )

    t0 = time.time()
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
        out = forward(variables, batch)
        fence(out)
    per_frame = (time.time() - t0) / ITERS
    fps = 1.0 / per_frame

    print(
        json.dumps(
            {
                "metric": "deepinteraction_base_fusion_forward_fps_per_chip",
                "value": round(fps, 3),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
                "detail": {
                    "batch": 1,
                    "num_proposals": cfg.test_num_proposals,
                    "compile_s": round(compile_s, 1),
                    "init_s": round(init_s, 1),
                    "device": str(jax.devices()[0].platform),
                },
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
