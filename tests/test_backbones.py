import jax
import jax.numpy as jnp
import numpy as np

from deepinteraction_tpu.configs import tiny_config
from deepinteraction_tpu.models.fpn import FPN
from deepinteraction_tpu.models.resnet import ResNet
from deepinteraction_tpu.models.second import SECOND, SECONDFPN
from deepinteraction_tpu.models.sparse_encoder import SparseEncoder
from deepinteraction_tpu.ops.voxelize import voxelize, hard_simple_vfe


def test_resnet_fpn_shapes():
    model = ResNet(depth=18)
    x = jnp.zeros((2, 64, 64, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(vars_, x)
    assert [o.shape for o in outs] == [
        (2, 16, 16, 64),
        (2, 8, 8, 128),
        (2, 4, 4, 256),
        (2, 2, 2, 512),
    ]
    neck = FPN(out_channels=64, num_outs=5)
    nvars = neck.init(jax.random.PRNGKey(0), outs)
    feats = neck.apply(nvars, outs)
    assert len(feats) == 5
    assert feats[0].shape == (2, 16, 16, 64)
    assert feats[4].shape == (2, 1, 1, 64)


def test_second_and_fpn():
    m = SECOND(out_channels=(64, 128), layer_nums=(2, 2), layer_strides=(1, 2))
    x = jnp.zeros((1, 16, 16, 256))
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    assert outs[0].shape == (1, 16, 16, 64)
    assert outs[1].shape == (1, 8, 8, 128)
    neck = SECONDFPN(out_channels=(128, 128), upsample_strides=(1, 2))
    nv = neck.init(jax.random.PRNGKey(0), outs)
    feats = neck.apply(nv, outs)
    assert feats[0].shape == (1, 16, 16, 256)
    assert feats[1].shape == (1, 16, 16, 128)
    assert feats[2].shape == (1, 16, 16, 128)


def test_sparse_encoder_end_to_end_shapes():
    cfg = tiny_config().model
    rng = np.random.default_rng(0)
    pts = rng.uniform(-7, 7, size=(2, 800, 5)).astype(np.float32)
    pts[..., 2] = rng.uniform(-4.5, 2.5, size=(2, 800))

    def vox(p):
        return voxelize(
            p,
            jnp.ones(p.shape[0], bool),
            voxel_size=cfg.pts_voxel_layer.voxel_size,
            point_cloud_range=cfg.pts_voxel_layer.point_cloud_range,
            max_num_points=cfg.pts_voxel_layer.max_num_points,
            max_voxels=cfg.pts_voxel_layer.max_voxels[0],
        )

    out = jax.vmap(vox)(jnp.asarray(pts))
    feats = jax.vmap(hard_simple_vfe)(out.voxels, out.num_points)
    valid = (
        jnp.arange(cfg.pts_voxel_layer.max_voxels[0])[None, :] < out.num_voxels[:, None]
    )
    enc = SparseEncoder(cfg.pts_middle_encoder)
    vars_ = enc.init(jax.random.PRNGKey(0), feats, out.coords, valid, False)
    bev = enc.apply(vars_, feats, out.coords, valid, False)
    # sparse_shape (41,128,128): xy 128->64->32->16, z 41->21->11->5->2
    assert bev.shape == (2, 16, 16, 2 * cfg.pts_middle_encoder.output_channels)
    assert np.isfinite(np.asarray(bev)).all()
    assert np.abs(np.asarray(bev)).sum() > 0
