"""LiDAR-only detector (cameras disabled, num_mmpi=0): the TransFusion-L
lineage the reference warm-starts from (BASELINE config #2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepinteraction_tpu.configs import tiny_lidar_config
from deepinteraction_tpu.inference import get_bboxes
from deepinteraction_tpu.models.detector import DeepInteraction
from deepinteraction_tpu.targets.assign import detection_loss
from deepinteraction_tpu.train.step import bev_shape
from deepinteraction_tpu.utils.testing import make_synthetic_batch


@pytest.fixture(scope="module")
def outputs():
    cfg = tiny_lidar_config()
    batch = {
        k: jnp.asarray(v)
        for k, v in make_synthetic_batch(cfg, b=1, with_gt=True, seed=2).items()
    }
    model = DeepInteraction(cfg.model, cfg.data.padded_img_shape)
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    preds = model.apply(variables, batch, False)
    return cfg, batch, variables, preds


def test_no_image_params(outputs):
    cfg, _, variables, _ = outputs
    keys = set(variables["params"].keys())
    assert "img_backbone" not in keys and "imgpts_neck" not in keys
    assert "shared_conv" in keys and "pts_bbox_head" in keys


def test_forward_shapes_single_layer(outputs):
    cfg, _, _, preds = outputs
    p = cfg.model.pts_bbox_head.num_proposals
    assert preds["center"].shape == (1, p, 2)  # one output layer (no MMPI)
    assert preds["on_image_masks"].shape[0] == 0
    for k, v in preds.items():
        assert np.isfinite(np.asarray(v)).all(), k


def test_loss_and_boxes(outputs):
    cfg, batch, _, preds = outputs
    losses = detection_loss(
        preds,
        batch["gt_boxes"],
        batch["gt_labels"],
        batch["gt_mask"],
        cfg.model.pts_bbox_head,
        cfg.model.bbox_coder,
        cfg.model.assigner,
        bev_shape(cfg),
    )
    assert np.isfinite(float(losses["loss_total"]))
    assert "layer_0_loss_cls" in losses
    det = get_bboxes(
        preds, cfg.model.pts_bbox_head, cfg.model.bbox_coder,
        cfg.model.pts_bbox_head.num_proposals,
    )
    assert np.isfinite(np.asarray(det.boxes)).all()
