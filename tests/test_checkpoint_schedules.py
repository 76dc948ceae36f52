"""Checkpoint save/restore round-trips + cyclic schedules + NMS inference."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepinteraction_tpu.configs import tiny_config
from deepinteraction_tpu.train.schedules import cyclic_cosine


def test_cyclic_cosine_endpoints():
    # reference: lr 1e-4, target_ratio (10, 1e-4), 40% up
    s = cyclic_cosine(1e-4, 10.0, 1e-4, 0.4, 1000)
    np.testing.assert_allclose(float(s(0)), 1e-4, rtol=1e-5)
    np.testing.assert_allclose(float(s(400)), 1e-3, rtol=1e-3)  # peak = 10x
    np.testing.assert_allclose(float(s(1000)), 1e-8, rtol=1e-2)  # end = 1e-4x
    # monotone up then down
    ups = [float(s(t)) for t in range(0, 401, 100)]
    downs = [float(s(t)) for t in range(400, 1001, 150)]
    assert all(a < b for a, b in zip(ups, ups[1:]))
    assert all(a > b for a, b in zip(downs, downs[1:]))


def test_checkpoint_roundtrip(tmp_path):
    import optax

    from deepinteraction_tpu.train.checkpoint import (
        load_params,
        publish,
        restore_checkpoint,
        save_checkpoint,
    )
    from deepinteraction_tpu.train.step import TrainState

    params = {"layer": {"kernel": jnp.arange(6.0).reshape(2, 3)}}
    bs = {"layer": {"mean": jnp.ones(3)}}
    tx = optax.adam(1e-3)
    state = TrainState(
        step=jnp.asarray(7, jnp.int32),
        params=params,
        batch_stats=bs,
        opt_state=tx.init(params),
    )
    d = str(tmp_path / "ck")
    save_checkpoint(d, state, 7)

    target = jax.tree_util.tree_map(jnp.zeros_like, state)
    restored = restore_checkpoint(d, target)
    assert int(restored.step) == 7
    np.testing.assert_allclose(
        np.asarray(restored.params["layer"]["kernel"]),
        np.asarray(params["layer"]["kernel"]),
    )
    # load_params keeps params/batch_stats but not step/opt_state
    warm = load_params(d, target)
    assert int(warm.step) == 0
    np.testing.assert_allclose(np.asarray(warm.batch_stats["layer"]["mean"]), 1.0)

    out = publish(d, target, str(tmp_path / "pub.npz"))
    data = np.load(out)
    assert "params/layer/kernel" in data
    assert not any(k.startswith("opt_state") for k in data.files)


def test_get_bboxes_with_nms():
    from deepinteraction_tpu.inference import get_bboxes

    cfg = tiny_config()
    dcfg = dataclasses.replace(cfg.model.pts_bbox_head, nms_type="circle")
    p = dcfg.num_proposals
    rng = np.random.default_rng(0)
    preds = {
        "center": jnp.asarray(rng.uniform(2, 14, (1, p, 2)).astype(np.float32)),
        "height": jnp.zeros((1, p, 1)),
        "dim": jnp.zeros((1, p, 3)),
        "rot": jnp.asarray(np.tile([0.0, 1.0], (1, p, 1)).astype(np.float32)),
        "vel": jnp.zeros((1, p, 2)),
        "heatmap": jnp.asarray(rng.normal(size=(1, p, dcfg.num_classes)).astype(np.float32)),
        "query_heatmap_score": jnp.ones((1, p, dcfg.num_classes)) * 0.5,
        # class 8 (pedestrian): the only nuScenes task with NMS enabled
        # (classes 0-7 use radius -1 = keep everything)
        "query_labels": jnp.full((1, p), 8, jnp.int32),
    }
    # duplicate proposal pair: same center -> circle NMS must drop one
    for k in ("center", "heatmap"):
        preds[k] = preds[k].at[0, 1].set(preds[k][0, 0])
    det = get_bboxes(preds, dcfg, cfg.model.bbox_coder, p)
    keep = np.asarray(det.keep[0])
    assert keep.sum() < p  # at least the duplicate got suppressed
    assert not (keep[0] and keep[1])

    dcfg_rot = dataclasses.replace(cfg.model.pts_bbox_head, nms_type="rotate")
    det2 = get_bboxes(preds, dcfg_rot, cfg.model.bbox_coder, p)
    keep2 = np.asarray(det2.keep[0])
    assert not (keep2[0] and keep2[1])
