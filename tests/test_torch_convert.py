"""torch->flax weight conversion: name mapping + layout adaptation.

No released .pth is available in this environment, so coverage is
structural: a synthetic state_dict with the reference's naming produces
leaves that land in the real target tree with the right shapes, and the
report surfaces anything unmatched.
"""

import numpy as np
import pytest

from deepinteraction_tpu.utils.torch_convert import (
    convert_state_dict,
    load_into_tree,
    unflatten,
)


def test_conv_and_bn_mapping():
    sd = {
        "img_backbone.conv1.weight": np.zeros((64, 3, 7, 7), np.float32),
        "img_backbone.bn1.weight": np.ones((64,), np.float32),
        "img_backbone.bn1.bias": np.zeros((64,), np.float32),
        "img_backbone.bn1.running_mean": np.zeros((64,), np.float32),
        "img_backbone.bn1.running_var": np.ones((64,), np.float32),
        "img_backbone.bn1.num_batches_tracked": np.zeros((), np.int64),
        "img_backbone.layer1.0.conv2.weight": np.zeros((64, 64, 3, 3), np.float32),
        "img_backbone.layer1.0.downsample.0.weight": np.zeros((256, 64, 1, 1), np.float32),
        "img_backbone.layer1.0.downsample.1.weight": np.ones((256,), np.float32),
    }
    flat, unmatched = convert_state_dict(sd)
    assert not unmatched
    assert flat["params:img_backbone/conv1/kernel"].shape == (7, 7, 3, 64)
    assert flat["params:img_backbone/bn1/scale"].shape == (64,)
    assert flat["batch_stats:img_backbone/bn1/mean"].shape == (64,)
    assert flat["batch_stats:img_backbone/bn1/var"].shape == (64,)
    assert flat["params:img_backbone/layer1_0/downsample_conv/kernel"].shape == (1, 1, 64, 256)
    assert flat["params:img_backbone/layer1_0/downsample_bn/scale"].shape == (256,)
    assert "num_batches" not in str(flat.keys())


def test_spconv_and_packed_mha():
    w = np.arange(16 * 3 * 3 * 3 * 5, dtype=np.float32).reshape(16, 3, 3, 3, 5)
    sd = {
        "pts_middle_encoder.conv_input.0.weight": w,
        "pts_bbox_head.decoder.0.self_attn.in_proj_weight": np.random.rand(384, 128).astype(np.float32),
        "pts_bbox_head.decoder.0.self_attn.in_proj_bias": np.random.rand(384).astype(np.float32),
        "pts_bbox_head.decoder.0.self_attn.out_proj.weight": np.random.rand(128, 128).astype(np.float32),
    }
    flat, unmatched = convert_state_dict(sd)
    assert not unmatched
    sp = flat["params:pts_middle_encoder/conv_input/w"]
    assert sp.shape == (27, 5, 16)
    # tap order: (dz, dy, dx) row-major; tap d, in i, out o = torch[o, dz, dy, dx, i]
    np.testing.assert_allclose(sp[13, 2, 7], w[7, 1, 1, 1, 2])
    q = flat["params:pts_bbox_head/decoder0/self_attn/q_proj/kernel"]
    assert q.shape == (128, 128)
    assert flat["params:pts_bbox_head/decoder0/self_attn/q_proj/bias"].shape == (128,)
    assert flat["params:pts_bbox_head/decoder0/self_attn/out_proj/kernel"].shape == (128, 128)


def test_second_sequential_indexing():
    # blocks.0 = [ZeroPad, Conv, BN, ReLU, Conv, BN, ReLU, ...]
    sd = {
        "pts_backbone.blocks.0.0.weight": np.zeros((1,), np.float32),  # ZeroPad: dropped
        "pts_backbone.blocks.0.1.weight": np.zeros((128, 256, 3, 3), np.float32),
        "pts_backbone.blocks.0.2.weight": np.ones((128,), np.float32),
        "pts_backbone.blocks.0.2.running_mean": np.zeros((128,), np.float32),
        "pts_backbone.blocks.0.4.weight": np.zeros((128, 128, 3, 3), np.float32),
        "pts_backbone.blocks.0.5.bias": np.zeros((128,), np.float32),
    }
    flat, unmatched = convert_state_dict(sd)
    assert not unmatched
    assert flat["params:pts_backbone/block0_conv0/kernel"].shape == (3, 3, 256, 128)
    assert "params:pts_backbone/block0_bn0/scale" in flat
    assert "batch_stats:pts_backbone/block0_bn0/mean" in flat
    assert flat["params:pts_backbone/block0_conv1/kernel"].shape == (3, 3, 128, 128)
    assert "params:pts_backbone/block0_bn1/bias" in flat


def test_load_into_real_tree():
    """Converted frozen-branch leaves land in the real model tree."""
    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    import jax.numpy as jnp

    from deepinteraction_tpu.configs import tiny_config
    from deepinteraction_tpu.models.detector import DeepInteraction
    from deepinteraction_tpu.utils.testing import make_synthetic_batch

    cfg = tiny_config()
    model = DeepInteraction(cfg.model, cfg.data.padded_img_shape)
    batch = {k: jnp.asarray(v) for k, v in make_synthetic_batch(cfg, b=1).items()}
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), batch, False))
    target = jax.tree_util.tree_map(lambda s: np.zeros(s.shape, s.dtype), shapes)

    # resnet18 layer1.0.conv1: 64 -> 64 3x3 (tiny config uses depth 18)
    sd = {
        "img_backbone.layer1.0.conv1.weight": np.full((64, 64, 3, 3), 2.0, np.float32),
        "img_backbone.layer1.0.bn1.weight": np.full((64,), 3.0, np.float32),
    }
    flat, unmatched = convert_state_dict(sd)
    assert not unmatched
    new_tree, missing, shape_errors = load_into_tree(target, flat)
    assert not shape_errors
    assert (
        new_tree["params"]["img_backbone"]["layer1_0"]["conv1"]["kernel"] == 2.0
    ).all()
    assert (new_tree["params"]["img_backbone"]["layer1_0"]["bn1"]["scale"] == 3.0).all()
    # everything else reported missing (we only supplied 2 tensors)
    assert len(missing) > 100


def test_swin_mapping():
    sd = {
        "img_backbone.patch_embed.projection.weight": np.zeros((96, 3, 4, 4), np.float32),
        "img_backbone.patch_embed.norm.weight": np.ones((96,), np.float32),
        "img_backbone.stages.0.blocks.1.attn.w_msa.qkv.weight": np.zeros((288, 96), np.float32),
        "img_backbone.stages.0.blocks.1.attn.w_msa.relative_position_bias_table": np.zeros((169, 3), np.float32),
        "img_backbone.stages.0.blocks.1.attn.w_msa.relative_position_index": np.zeros((49, 49), np.int64),
        "img_backbone.stages.0.blocks.1.ffn.layers.0.0.weight": np.zeros((384, 96), np.float32),
        "img_backbone.stages.0.blocks.1.ffn.layers.1.weight": np.zeros((96, 384), np.float32),
        "img_backbone.stages.0.downsample.reduction.weight": np.zeros((192, 384), np.float32),
        "img_backbone.stages.0.downsample.norm.weight": np.ones((384,), np.float32),
        "img_backbone.norm2.weight": np.ones((384,), np.float32),
    }
    flat, unmatched = convert_state_dict(sd)
    assert not unmatched
    assert flat["params:img_backbone/patch_embed/kernel"].shape == (4, 4, 3, 96)
    assert "params:img_backbone/patch_norm/scale" in flat
    assert flat["params:img_backbone/stage0_block1/attn/qkv/kernel"].shape == (96, 288)
    assert flat["params:img_backbone/stage0_block1/attn/rel_pos_bias"].shape == (169, 3)
    assert not any("relative_position_index" in k for k in flat)
    assert flat["params:img_backbone/stage0_block1/fc1/kernel"].shape == (96, 384)
    assert flat["params:img_backbone/stage0_block1/fc2/kernel"].shape == (384, 96)
    assert flat["params:img_backbone/merge0/reduction/kernel"].shape == (384, 192)
    assert "params:img_backbone/merge0/norm/scale" in flat
    assert "params:img_backbone/out_norm2/scale" in flat
