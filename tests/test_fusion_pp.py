"""DeepInteraction++ path: FusionTransformer neck (MSDA + polar I2P),
V2 MMPI blocks, look-forward center update, per-layer loss masks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepinteraction_tpu.configs import tiny_pp_config
from deepinteraction_tpu.models.detector import DeepInteraction
from deepinteraction_tpu.targets.assign import detection_loss
from deepinteraction_tpu.train.step import bev_shape
from deepinteraction_tpu.utils.testing import make_synthetic_batch


@pytest.fixture(scope="module")
def pp_outputs():
    cfg = tiny_pp_config()
    batch = {
        k: jnp.asarray(v)
        for k, v in make_synthetic_batch(cfg, b=1, with_gt=True, seed=5).items()
    }
    model = DeepInteraction(cfg.model, cfg.data.padded_img_shape)
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    preds = model.apply(variables, batch, False)
    return cfg, batch, preds


def test_pp_forward_shapes(pp_outputs):
    cfg, _, preds = pp_outputs
    d = cfg.model.pts_bbox_head
    p, nl, ncls = d.num_proposals, d.num_mmpi, d.num_classes
    assert preds["center"].shape == (1, p * nl, 2)
    assert preds["heatmap"].shape == (1, p * nl, ncls)
    # ++ emits one cumulative mask per MMPI layer (v1: one per image layer)
    assert preds["on_image_masks"].shape == (nl, 1, p)


def test_pp_masks_cumulative(pp_outputs):
    _, _, preds = pp_outputs
    m = np.asarray(preds["on_image_masks"])
    for li in range(1, m.shape[0]):
        # a query on-image at layer li must have been on-image at li-1
        assert not np.any(m[li] & ~m[li - 1])


def test_pp_outputs_finite(pp_outputs):
    _, _, preds = pp_outputs
    for k, v in preds.items():
        assert np.isfinite(np.asarray(v)).all(), f"{k} not finite"


def test_pp_loss_path(pp_outputs):
    cfg, batch, preds = pp_outputs
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
    assert float(losses["loss_heatmap"]) > 0
