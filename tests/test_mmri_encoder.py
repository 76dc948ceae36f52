import jax
import jax.numpy as jnp
import numpy as np

from deepinteraction_tpu.configs import tiny_config
from deepinteraction_tpu.models.mmri_encoder import MMRIEncoder


def _tiny_batch(rng, cfg):
    b, v = 1, cfg.model.pts_bbox_head.num_views
    n = 512
    kp, p = cfg.model.pts_pillar_layer.max_voxels[0], cfg.model.pts_pillar_layer.max_num_points
    pts = rng.uniform(-7, 7, size=(b, n, 5)).astype(np.float32)
    pts[..., 2] = rng.uniform(-4.0, 2.0, size=(b, n))
    # simple pinhole-ish projection matrices
    l2i = np.zeros((b, v, 4, 4), np.float32)
    for i in range(v):
        l2i[:, i] = np.eye(4)
        l2i[:, i, 0, 0] = 30.0  # fx
        l2i[:, i, 1, 1] = 30.0
        l2i[:, i, 0, 2] = 32.0
        l2i[:, i, 1, 2] = 16.0
        # look along +x for view 0, -x for view 1
        rot = np.eye(4, dtype=np.float32)
        if i == 1:
            rot[0, 0] = -1
            rot[2, 2] = -1
        l2i[:, i] = l2i[:, i] @ rot
    pillars = np.zeros((b, kp, p, 5), np.float32)
    counts = np.zeros((b, kp), np.int32)
    coords = np.zeros((b, kp, 3), np.int32)
    valid = np.zeros((b, kp), bool)
    # a few occupied pillars
    for j in range(10):
        pillars[0, j, :3] = pts[0, j * 3 : j * 3 + 3]
        counts[0, j] = 3
        coords[0, j] = [0, j % 16, (j * 3) % 16]
        valid[0, j] = True
    eye = np.broadcast_to(np.eye(4, dtype=np.float32), (b, 4, 4)).copy()
    return {
        "points": jnp.asarray(pts),
        "points_mask": jnp.ones((b, n), bool),
        "pillars": jnp.asarray(pillars),
        "pillar_counts": jnp.asarray(counts),
        "pillar_coords": jnp.asarray(coords),
        "pillar_valid": jnp.asarray(valid),
        "lidar2img": jnp.asarray(l2i),
        "img2lidar": jnp.asarray(np.linalg.inv(l2i)),
        "lidar_aug": jnp.asarray(eye),
        "lidar_aug_inv": jnp.asarray(eye),
    }


def test_mmri_encoder_shapes_and_finite():
    cfg = tiny_config()
    mcfg = cfg.model
    rng = np.random.default_rng(0)
    batch = _tiny_batch(rng, cfg)
    b, v = 1, mcfg.pts_bbox_head.num_views
    hc, wc = 8, 16  # stride-4 feature map of 32x64 images
    img_feats = jnp.asarray(rng.normal(size=(b, v, hc, wc, mcfg.imgpts_neck.in_channels_img)).astype(np.float32))
    pts_feats = jnp.asarray(rng.normal(size=(b, 16, 16, mcfg.imgpts_neck.in_channels_pts)).astype(np.float32))

    enc = MMRIEncoder(
        mcfg.imgpts_neck,
        mcfg.pts_voxel_layer.point_cloud_range,
        (32, 64),
    )
    vars_ = enc.init(jax.random.PRNGKey(0), img_feats, pts_feats, batch, False)
    new_img, (pts_conv, new_pts) = enc.apply(vars_, img_feats, pts_feats, batch, False)
    c = mcfg.imgpts_neck.hidden_channel
    assert new_img.shape == (b, v, hc, wc, c)
    assert pts_conv.shape == (b, 16, 16, c)
    assert new_pts.shape == (b, 16, 16, c)
    for t in (new_img, pts_conv, new_pts):
        assert np.isfinite(np.asarray(t)).all()
