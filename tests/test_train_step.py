"""Full training step: loss path, grads, freeze masking, DP sharding.

The reference never tests its training machinery (SURVEY §4); here the
complete step (Hungarian targets inside jit, cyclic AdamW, branch freezing)
runs on a virtual 8-device CPU mesh (conftest.py).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepinteraction_tpu.configs import tiny_config
from deepinteraction_tpu.models.detector import DeepInteraction
from deepinteraction_tpu.train.step import (
    _path_frozen,
    bev_shape,
    create_train_state,
    frozen_paths,
    make_train_step,
)
from deepinteraction_tpu.utils.testing import make_synthetic_batch


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    # exercise the freeze path (the shipped configs freeze both branches)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, freeze_img=True, freeze_pts=True)
    )
    model = DeepInteraction(cfg.model, cfg.data.padded_img_shape)
    batch = {
        k: jnp.asarray(v)
        for k, v in make_synthetic_batch(cfg, b=2, with_gt=True, seed=3).items()
    }
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    state = create_train_state(cfg, variables, total_steps=10)
    step_fn = jax.jit(make_train_step(cfg, model, total_steps=10))
    new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    return cfg, state, new_state, metrics


def test_loss_finite(setup):
    _, _, _, metrics = setup
    for k, v in metrics.items():
        assert np.isfinite(np.asarray(v)).all(), f"{k} not finite"
    assert float(metrics["loss_total"]) > 0.0
    assert float(metrics["loss_heatmap"]) > 0.0


def test_frozen_params_unchanged(setup):
    from flax import traverse_util

    cfg, state, new_state, _ = setup
    frozen = frozen_paths(cfg)
    assert frozen  # config freezes both branches
    before = traverse_util.flatten_dict(state.params)
    after = traverse_util.flatten_dict(new_state.params)
    n_frozen = 0
    for path, b in before.items():
        if _path_frozen(path, frozen):
            n_frozen += 1
            np.testing.assert_array_equal(
                np.asarray(b), np.asarray(after[path]), err_msg="/".join(path)
            )
    assert n_frozen > 0
    # the reference's freeze set pins warm-started head components too
    # (deepinteraction.py:71-97): decoder0 / pred0 / class_encoding /
    # heatmap_head (but NOT heatmap_head_img) / shared_conv_pts
    for sub in ("decoder0", "pred0", "class_encoding", "heatmap_head_0"):
        assert _path_frozen(("pts_bbox_head", sub, "x"), frozen), sub
    assert _path_frozen(("imgpts_neck", "shared_conv_pts", "x"), frozen)
    assert not _path_frozen(("pts_bbox_head", "heatmap_head_img_0", "x"), frozen)
    assert not _path_frozen(("pts_bbox_head", "mmpi0_img", "x"), frozen)


def test_trainable_params_move(setup):
    from flax import traverse_util

    cfg, state, new_state, _ = setup
    frozen = frozen_paths(cfg)
    before = traverse_util.flatten_dict(state.params)
    after = traverse_util.flatten_dict(new_state.params)
    moved = sum(
        1
        for path, b in before.items()
        if not _path_frozen(path, frozen)
        and not np.allclose(np.asarray(b), np.asarray(after[path]))
    )
    assert moved > 0


def test_frozen_batch_stats_unchanged(setup):
    from flax import traverse_util

    cfg, state, new_state, _ = setup
    frozen = frozen_paths(cfg)
    before = traverse_util.flatten_dict(state.batch_stats)
    after = traverse_util.flatten_dict(new_state.batch_stats)
    checked = 0
    for path, b in before.items():
        if _path_frozen(path, frozen):
            checked += 1
            np.testing.assert_array_equal(
                np.asarray(b), np.asarray(after[path]), err_msg="/".join(path)
            )
    assert checked > 0


def test_tiny_overfit_converges():
    """~60 steps on ONE fixed synthetic batch must substantially reduce the
    loss and raise matched IoU (VERDICT r2 weak #5: finiteness + freeze
    invariants alone cannot catch a sign error in a loss term or the
    target assignment). Reference loss semantics:
    deepinteraction_decoder.py:484-547."""
    n_steps = 60
    cfg = tiny_config()  # nothing frozen: every loss term must pull
    model = DeepInteraction(cfg.model, cfg.data.padded_img_shape)
    batch = {
        k: jnp.asarray(v)
        for k, v in make_synthetic_batch(cfg, b=1, with_gt=True, seed=5).items()
    }
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    state = create_train_state(cfg, variables, total_steps=n_steps)
    step_fn = jax.jit(make_train_step(cfg, model, total_steps=n_steps))
    rng = jax.random.PRNGKey(1)
    losses, ious = [], []
    for _ in range(n_steps):
        rng, key = jax.random.split(rng)
        state, metrics = step_fn(state, batch, key)
        losses.append(float(metrics["loss_total"]))
        ious.append(float(metrics["matched_ious"]))
    assert np.isfinite(losses).all()
    first, last = np.mean(losses[:5]), np.mean(losses[-5:])
    assert last < 0.7 * first, f"no convergence: {first:.3f} -> {last:.3f}"
    assert np.mean(ious[-5:]) > np.mean(ious[:5]), (
        f"matched IoU did not improve: {np.mean(ious[:5]):.3f} -> "
        f"{np.mean(ious[-5:]):.3f}"
    )


def test_tiny_pp_train_step_smoke():
    """One jitted train step on the ++ variant. This is the only test that
    traces the train-only ``nn.remat(FusionLayerImg/Pts, static_argnums=
    (5, 7))`` path (models/fusion_transformer.py) — a future signature
    reorder of the layer __call__ would silently mis-pin the static args
    with no other test failing (ADVICE r4)."""
    from deepinteraction_tpu.configs import tiny_pp_config

    cfg = tiny_pp_config()
    model = DeepInteraction(cfg.model, cfg.data.padded_img_shape)
    batch = {
        k: jnp.asarray(v)
        for k, v in make_synthetic_batch(cfg, b=1, with_gt=True, seed=7).items()
    }
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    state = create_train_state(cfg, variables, total_steps=10)
    step_fn = jax.jit(make_train_step(cfg, model, total_steps=10))
    new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss_total"]))
    assert float(metrics["loss_total"]) > 0.0
    assert int(new_state.step) == 1


def test_dryrun_multichip():
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(len(jax.devices()))


def test_dryrun_golden_catches_regression(tmp_path):
    """The driver dry run asserts loss/grad-norm against committed goldens
    (VERDICT r4 #5); a deliberately perturbed value must fail the check."""
    import json
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import check_dryrun_golden

    p = tmp_path / "golden.json"
    p.write_text(json.dumps({"8": {"loss_total": 100.0, "grad_norm": 50.0}}))
    assert check_dryrun_golden(8, 100.5, 51.0, str(p)) == "golden: matched"
    with pytest.raises(AssertionError, match="loss_total"):
        check_dryrun_golden(8, 150.0, 50.0, str(p))  # garbage-but-finite loss
    with pytest.raises(AssertionError, match="grad_norm"):
        check_dryrun_golden(8, 100.0, 80.0, str(p))
    assert "no entry" in check_dryrun_golden(4, 100.0, 50.0, str(p))
    assert "no file" in check_dryrun_golden(8, 100.0, 50.0, str(tmp_path / "x.json"))
