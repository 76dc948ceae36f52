"""Staged minimal repro for the Pallas-locatt-in-train axon worker crash.

Round-2 finding (PERF.md): the fused Pallas local-attention kernel
(ops/local_attention_pallas.py) runs fine in every EVAL program, including
full-size fusion_base/fusion_plusplus, but embedding it in the FULL-SIZE
fusion_base TRAIN program reproducibly hard-crashes the axon TPU worker
("TPU worker process crashed" on the first executed step). The production
fallback (`local_attention_auto`) therefore keeps training on the XLA
formulation; SURVEY §2.2 wants the Pallas kernel live under train, so this
script isolates WHICH ingredient kills it.

Each stage runs in a fresh subprocess (a worker crash poisons the parent
process's jax — CLAUDE.md), smallest first:

  1  eval-shape fwd of the kernel alone                 [expect OK]
  2  jax.value_and_grad through the kernel alone        [expect OK —
     the custom VJP backward is pure XLA]
  3  stage 2 with ~8 GB of live HBM ballast             [memory-pressure
     proxy: kernel + near-full HBM co-residency]
  4  tiny-config FULL train step, Pallas forced in      [small end-to-end]
  5  full-size fusion_base train step, Pallas forced    [the known crash]
  6  full-size ENCODER-ONLY fwd+bwd, Pallas forced      [split-program
     probe: train-scale program without the decoder half — if this runs,
     the total-program-scale root cause is confirmed from the other side
     and staged two-program training is a viable mitigation]
  7  tiny train step, banded sparse-conv kernel forced  [second Mosaic
     kernel, small]
  8  full-size train step, banded kernel forced         [second kernel's
     known crash, recorded]

Usage:
    python tools/repro/locatt_train_crash.py            # run all stages
    python tools/repro/locatt_train_crash.py --stage 3  # one stage, in-proc

A stage that crashes the worker exits non-zero (or the 50-min timeout
fires if the runtime hangs instead); the driver records rc per stage and
keeps going, so one run yields the full bisection table.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

# fusion_base BEV local-attention shapes (models/mmri_encoder.py): 6 calls
# of [B, 112, 200, 128] with kernel 9 per forward at B=1 — stage 1-3 use
# one call at the real shape.
SHAPE = (6, 112, 200, 128)
KERNEL = 9


def _setup_jax():
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
    )
    return jax


def stage1():
    jax = _setup_jax()
    import jax.numpy as jnp
    import numpy as np

    from deepinteraction_tpu.ops.local_attention_pallas import local_attention_fused

    q = jnp.asarray(np.random.default_rng(0).normal(size=SHAPE), jnp.float32)
    out = jax.jit(lambda q: local_attention_fused(q, q, q, KERNEL))(q)
    print("stage1 ok:", float(jnp.sum(out)))


def stage2():
    jax = _setup_jax()
    import jax.numpy as jnp
    import numpy as np

    from deepinteraction_tpu.ops.local_attention_pallas import local_attention_fused

    q = jnp.asarray(np.random.default_rng(0).normal(size=SHAPE), jnp.float32)

    @jax.jit
    def f(q):
        return jax.value_and_grad(
            lambda q: jnp.sum(local_attention_fused(q, q, q, KERNEL))
        )(q)

    val, grad = f(q)
    print("stage2 ok:", float(val), float(jnp.sum(grad)))


def stage3():
    jax = _setup_jax()
    import jax.numpy as jnp
    import numpy as np

    from deepinteraction_tpu.ops.local_attention_pallas import local_attention_fused

    # ~8 GB of live ballast on a 16 GB chip: does the kernel (100 MB VMEM
    # budget) survive heavy HBM co-residency + allocator pressure?
    ballast = [
        jax.device_put(jnp.zeros((512, 1024, 1024), jnp.float32))  # 2 GB
        for _ in range(4)
    ]
    q = jnp.asarray(np.random.default_rng(0).normal(size=SHAPE), jnp.float32)

    @jax.jit
    def f(q):
        return jax.value_and_grad(
            lambda q: jnp.sum(local_attention_fused(q, q, q, KERNEL))
        )(q)

    val, grad = f(q)
    print("stage3 ok:", float(val), float(jnp.sum(grad)), len(ballast))


def _train_step(config_name: str, samples: int = 1, kernel: str = "locatt"):
    """Full train step with a Mosaic kernel FORCED into the train graph."""
    if kernel == "locatt":
        assert os.environ.get("DI_PALLAS_LOCATT_TRAIN") == "1", (
            "driver must set DI_PALLAS_LOCATT_TRAIN=1 before jax import"
        )
    else:
        assert os.environ.get("DI_SPARSE_TRAIN_IMPL") == "banded"
    jax = _setup_jax()
    import numpy as np

    from deepinteraction_tpu.configs import apply_overrides
    from deepinteraction_tpu.models.detector import DeepInteraction
    from deepinteraction_tpu.ops.hungarian import default_lap_impl
    from deepinteraction_tpu.train.step import create_train_state, make_train_step
    from deepinteraction_tpu.utils.testing import fast_init_variables, make_synthetic_batch

    from tools.train import get_config

    cfg = get_config(config_name)
    cfg = apply_overrides(cfg, {"model.assigner.lap_impl": default_lap_impl()})
    model = DeepInteraction(cfg.model, cfg.data.padded_img_shape)
    import jax.numpy as jnp

    batch = {
        k: jnp.asarray(v)
        for k, v in make_synthetic_batch(cfg, b=1, seed=0, with_gt=True).items()
    }
    variables = fast_init_variables(model, batch)
    state = create_train_state(cfg, variables, total_steps=100)
    step_fn = jax.jit(make_train_step(cfg, model, total_steps=100))
    rng = jax.random.PRNGKey(0)
    for i in range(samples):
        state, metrics = step_fn(state, batch, rng)
        print(f"{config_name} step {i}: loss={np.asarray(metrics['loss_total']):.2f}")


def stage6():
    """SPLIT-program probe (VERDICT r4 #8): full-size fusion_base ENCODER
    fwd+bwd with the Pallas kernel forced in, decoder half absent. If this
    survives where stage 5 crashes, the 'total program scale' root cause
    is confirmed from the other side, and staged (two-program) training is
    a viable mitigation on this runtime."""
    assert os.environ.get("DI_PALLAS_LOCATT_TRAIN") == "1"
    jax = _setup_jax()
    import numpy as np

    from deepinteraction_tpu.models.detector import DeepInteraction
    from deepinteraction_tpu.utils.testing import fast_init_variables, make_synthetic_batch
    from tools.train import get_config

    import jax.numpy as jnp

    cfg = get_config("fusion_base")
    model = DeepInteraction(cfg.model, cfg.data.padded_img_shape)
    batch = {
        k: jnp.asarray(v)
        for k, v in make_synthetic_batch(cfg, b=1, seed=0, with_gt=True).items()
    }
    variables = fast_init_variables(model, batch)
    params = variables["params"]
    consts = {k: v for k, v in variables.items() if k != "params"}

    @jax.jit
    def f(params):
        def loss(p):
            new_img, (pts_conv, new_pts) = model.apply(
                {"params": p, **consts},
                batch,
                True,
                encoder_only=True,
                rngs={"dropout": jax.random.PRNGKey(0)},
            )
            return (
                jnp.sum(new_img.astype(jnp.float32) ** 2)
                + jnp.sum(new_pts.astype(jnp.float32) ** 2)
            )

        return jax.value_and_grad(loss)(params)

    val, grad = f(params)
    gn = jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(x.astype(jnp.float32) ** 2), grad, 0.0
    )
    print("stage6 ok:", float(val), float(np.asarray(gn)))


def _banded_env():
    os.environ["DI_SPARSE_TRAIN_IMPL"] = "banded"
    os.environ["DI_SPARSE_IMPL"] = "banded"


STAGES = {
    1: stage1,
    2: stage2,
    3: stage3,
    4: lambda: _train_step("tiny", samples=2),
    5: lambda: _train_step("fusion_base", samples=2),
    6: stage6,
    # banded-conv Mosaic kernel analogs (VERDICT r4 #8: extend the repro to
    # the second kernel). 7 = tiny (expect ok), 8 = full size (the crash).
    7: lambda: (_banded_env(), _train_step("tiny", samples=2, kernel="banded"))[-1],
    8: lambda: (
        _banded_env(),
        _train_step("fusion_base", samples=2, kernel="banded"),
    )[-1],
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", type=int, default=0, help="0 = drive all stages")
    args = p.parse_args()

    if args.stage:
        if args.stage in (4, 5, 6):
            os.environ["DI_PALLAS_LOCATT_TRAIN"] = "1"
        STAGES[args.stage]()
        return

    results = {}
    for s in sorted(STAGES):
        env = dict(os.environ)
        if s in (4, 5, 6):
            env["DI_PALLAS_LOCATT_TRAIN"] = "1"
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--stage", str(s)],
                env=env,
                cwd=REPO,
                capture_output=True,
                text=True,
                timeout=3000,
            )
            rc, out = proc.returncode, proc.stdout + proc.stderr
        except subprocess.TimeoutExpired as e:
            # A hanging stage must not lose the per-stage table: record a
            # sentinel rc and keep bisecting (ADVICE r4).
            rc = "timeout"
            out = ((e.stdout or b"").decode(errors="replace") if isinstance(e.stdout, bytes) else (e.stdout or "")) + (
                (e.stderr or b"").decode(errors="replace") if isinstance(e.stderr, bytes) else (e.stderr or "")
            )
        results[s] = rc
        tail = out.strip().splitlines()[-3:]
        print(f"--- stage {s}: rc={rc} ({time.time()-t0:.0f}s)")
        for line in tail:
            print("   ", line)
    print("bisection:", results)


if __name__ == "__main__":
    main()
