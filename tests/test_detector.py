import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepinteraction_tpu.configs import tiny_config
from deepinteraction_tpu.models.detector import DeepInteraction


def make_tiny_batch(rng, cfg, b=1):
    d = cfg.data
    v = d.num_views
    h, w = d.padded_img_shape
    n = d.max_points
    pts = rng.uniform(-7, 7, size=(b, n, 5)).astype(np.float32)
    pts[..., 2] = rng.uniform(-4.0, 2.0, size=(b, n))
    mask = rng.uniform(size=(b, n)) > 0.3
    imgs = rng.normal(size=(b, v, h, w, 3)).astype(np.float32)
    l2i = np.zeros((b, v, 4, 4), np.float32)
    for i in range(v):
        m = np.eye(4, dtype=np.float32)
        m[0, 0] = 40.0
        m[1, 1] = 40.0
        m[0, 2] = w / 2
        m[1, 2] = h / 2
        rot = np.eye(4, dtype=np.float32)
        if i % 2 == 1:
            rot[0, 0] = -1
            rot[2, 2] = -1
        l2i[:, i] = m @ rot
    eye = np.broadcast_to(np.eye(4, dtype=np.float32), (b, 4, 4)).copy()
    return {
        "points": jnp.asarray(pts),
        "points_mask": jnp.asarray(mask),
        "images": jnp.asarray(imgs),
        "lidar2img": jnp.asarray(l2i),
        "img2lidar": jnp.asarray(np.linalg.inv(l2i)),
        "lidar_aug": jnp.asarray(eye),
        "lidar_aug_inv": jnp.asarray(eye),
    }


@pytest.fixture(scope="module")
def detector_outputs():
    cfg = tiny_config()
    rng = np.random.default_rng(0)
    batch = make_tiny_batch(rng, cfg)
    model = DeepInteraction(cfg.model, cfg.data.padded_img_shape)
    vars_ = model.init(jax.random.PRNGKey(0), batch, False)
    preds = model.apply(vars_, batch, False)
    return cfg, preds


def test_detector_forward_shapes(detector_outputs):
    cfg, preds = detector_outputs
    p = cfg.model.pts_bbox_head.num_proposals
    layers = cfg.model.pts_bbox_head.num_mmpi
    ncls = cfg.model.pts_bbox_head.num_classes
    assert preds["center"].shape == (1, p * layers, 2)
    assert preds["heatmap"].shape == (1, p * layers, ncls)
    assert preds["height"].shape == (1, p * layers, 1)
    assert preds["dim"].shape == (1, p * layers, 3)
    assert preds["rot"].shape == (1, p * layers, 2)
    assert preds["vel"].shape == (1, p * layers, 2)
    assert preds["dense_heatmap"].shape[0] == 1
    assert preds["query_heatmap_score"].shape == (1, p, ncls)
    assert preds["query_labels"].shape == (1, p)


def test_detector_outputs_finite(detector_outputs):
    _, preds = detector_outputs
    for k, v in preds.items():
        arr = np.asarray(v)
        assert np.isfinite(arr).all(), f"{k} has non-finite values"


def test_dense_bf16_knob_runs_and_tracks_f32(monkeypatch):
    """DI_DENSE_BF16=1 (bf16 activations in ResNet/FPN/SECOND/SECONDFPN,
    eval only) produces finite outputs that track the f32 graph. Not
    bit-exact by design — the quality gate for the default lives in PERF.md."""
    cfg = tiny_config()
    rng = np.random.default_rng(2)
    batch = make_tiny_batch(rng, cfg)
    model = DeepInteraction(cfg.model, cfg.data.padded_img_shape)
    monkeypatch.delenv("DI_DENSE_BF16", raising=False)
    vars_ = model.init(jax.random.PRNGKey(0), batch, False)
    ref = model.apply(vars_, batch, False)
    monkeypatch.setenv("DI_DENSE_BF16", "1")
    out = model.apply(vars_, batch, False)
    for k in ("center", "dim", "rot", "height"):
        a, b = np.asarray(out[k]), np.asarray(ref[k])
        assert np.isfinite(a).all(), k
        # bf16 has ~3 decimal digits; the decoder output should stay close
        np.testing.assert_allclose(a, b, rtol=0.15, atol=0.15)
