"""Capture a device trace of a model's eval forward (+ box decode).

Usage (on the TPU env):
    python tools/trace_model.py fusion_plusplus --outdir /tmp/trace_pp
    python tools/trace_model.py fusion_base --iters 3

The reference's FPS harness is tools/analysis_tools/benchmark.py:64-91;
this is its trace-capturing sibling: it compiles the jitted forward,
reports warm per-iter wall time (honest axon fence: numpy readback of a
scalar), writes a profiler trace of ``--iters`` steady-state iterations,
then re-times steady state. Parse the trace with
``tools/analyze_trace.py``.
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default="fusion_plusplus")
    ap.add_argument("--outdir", default=None, help="trace output dir")
    ap.add_argument("--iters", type=int, default=3, help="traced iterations")
    ap.add_argument("--train", action="store_true", help="trace the train step instead")
    ap.add_argument(
        "--zeros",
        action="store_true",
        help="zeros-leaf variables (bench.py's init) instead of fast_init "
        "noise — isolates value-dependent axon worker crashes",
    )
    args = ap.parse_args()
    outdir = args.outdir or f"/tmp/trace_{args.config}"

    from deepinteraction_tpu.utils.backend import require_live_backend

    require_live_backend()
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )

    import jax.numpy as jnp
    import numpy as np

    from deepinteraction_tpu.inference import get_bboxes
    from deepinteraction_tpu.models.detector import DeepInteraction
    from deepinteraction_tpu.utils.testing import fast_init_variables, make_synthetic_batch
    from tools.train import get_config

    cfg = get_config(args.config)

    if args.train:
        # full jitted train step (forward + Hungarian targets + loss +
        # backward + AdamW) — same program as tools/benchmark.py --train
        from deepinteraction_tpu.configs import apply_overrides
        from deepinteraction_tpu.ops.hungarian import default_lap_impl
        from deepinteraction_tpu.train.step import create_train_state, make_train_step

        cfg = apply_overrides(cfg, {"model.assigner.lap_impl": default_lap_impl()})
        model = DeepInteraction(cfg.model, cfg.data.padded_img_shape)
        batch = {
            k: jnp.asarray(v)
            for k, v in make_synthetic_batch(cfg, b=1, seed=0, with_gt=True).items()
        }
        variables = fast_init_variables(model, batch)
        state = create_train_state(cfg, variables, total_steps=1000)
        step_fn = jax.jit(
            make_train_step(cfg, model, total_steps=1000), donate_argnums=0
        )
        rng = jax.random.PRNGKey(0)
        state_box = [state]

        def forward(_v, batch):
            new_state, metrics = step_fn(state_box[0], batch, rng)
            state_box[0] = new_state
            return metrics

        fence = lambda m: float(np.asarray(m["loss_total"]))
    else:
        model = DeepInteraction(
            cfg.model, cfg.data.padded_img_shape, num_proposals=cfg.test_num_proposals
        )
        dcfg = cfg.model.pts_bbox_head

        @jax.jit
        def forward(variables, batch):
            preds = model.apply(variables, batch, False)
            return get_bboxes(preds, dcfg, cfg.model.bbox_coder, cfg.test_num_proposals)

        batch = {k: jnp.asarray(v) for k, v in make_synthetic_batch(cfg, b=1, seed=0).items()}
        if args.zeros:
            shapes = jax.eval_shape(
                lambda: model.init(jax.random.PRNGKey(0), batch, False)
            )
            variables = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), shapes
            )
        else:
            variables = fast_init_variables(model, batch)
        fence = lambda o: np.asarray(o.scores).sum()

    t0 = time.time()
    fence(forward(variables, batch))
    print(f"compile+run: {time.time() - t0:.1f}s", flush=True)
    for _ in range(2):
        t0 = time.time()
        fence(forward(variables, batch))
        print(f"warm: {time.time() - t0:.3f}s", flush=True)

    jax.profiler.start_trace(outdir)
    for _ in range(args.iters):
        fence(forward(variables, batch))
    jax.profiler.stop_trace()
    print("trace written to", outdir, flush=True)
    t0 = time.time()
    for _ in range(5):
        fence(forward(variables, batch))
    print(f"steady-state: {(time.time() - t0) / 5 * 1e3:.1f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
