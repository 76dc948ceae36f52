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


def _my_subtree_keys(tree, prefix):
    """Joined 'coll:path' keys of a variables tree filtered by path prefix."""
    import jax

    out = {}
    for coll in tree:
        for p, leaf in jax.tree_util.tree_flatten_with_path(tree[coll])[0]:
            path = "/".join(str(getattr(k, "key", k)) for k in p)
            if path.startswith(prefix):
                out[f"{coll}:{path}"] = leaf
    return out


def test_pp_neck_and_decode_head_mapping():
    """Complete ++ conversion coverage (FusionTransformerv4 neck + the V2
    MMPI decode_head): reference keys harvested from the REFERENCE's own
    modules where instantiable via ref_shims (MMRI_I2P_Polar, the V2 RCNN
    blocks); mmcv-owned container keys (attentions.N/ffns.N/norms.N, MSDA
    leaves, nested FFN layers.0.0/layers.1) written per mmcv 1.x naming.
    Asserts: zero unmatched source keys, zero missing target leaves in the
    imgpts_neck + mmpi-core subtrees, zero shape errors."""
    import os
    import sys

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ref_shims import load_reference, load_reference_fusion_v4

    from deepinteraction_tpu.configs import fusion_plusplus_config
    from deepinteraction_tpu.models.detector import DeepInteraction
    from deepinteraction_tpu.utils.testing import make_synthetic_batch

    # FULL config: eval_shape is abstract (no allocation), and the
    # reference's DynamicConv hard-codes its inner dims for the 128-ch
    # models, so only the full dims line up shape-exactly.
    cfg = fusion_plusplus_config()
    model = DeepInteraction(cfg.model, cfg.data.padded_img_shape)
    batch = {k: jnp.asarray(v) for k, v in make_synthetic_batch(cfg, b=1).items()}
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), batch, False))
    target = jax.tree_util.tree_map(lambda s: np.zeros(s.shape, s.dtype), shapes)

    n = cfg.model.imgpts_neck
    c, h, lv, pts_n = n.hidden_channel, n.num_heads, n.num_levels, n.deform_num_points

    sd = {}

    # -- real reference modules: harvest their actual state-dict keys --
    V4 = load_reference_fusion_v4()
    DU = load_reference("models/utils/decoder_utils.py", "ref_du_conv")
    import torch

    polar = V4.MMRI_I2P_Polar(embed_dims=c, dropout=0.0)
    for i in range(n.num_layers):
        for k, v in polar.state_dict().items():
            sd[f"imgpts_neck.pts_fusion_blocks.{i}.attentions.1.{k}"] = v.numpy()

    dcfg = cfg.model.pts_bbox_head
    tc = {"grid_size": [32, 32, 8], "out_size_factor": 8,
          "pc_range": [-10.0, -10.0], "voxel_size": [0.625, 0.625]}
    for i in range(dcfg.num_mmpi):
        if i % 2 == 0:
            blk = DU.ImageRCNNBlockV2(6, dcfg.num_proposals, 4, tc, None,
                                      dcfg.hidden_channel, dcfg.num_heads, 0.0)
        else:
            blk = DU.PointRCNNBlockV2(dcfg.hidden_channel, dcfg.num_heads, 0.0, None)
        for k, v in blk.state_dict().items():
            sd[f"pts_bbox_head.decode_head.{i}.{k}"] = v.numpy()

    # -- mmcv-owned containers: keys per mmcv bricks naming --
    def lin(o, i):
        return np.zeros((o, i), np.float32), np.zeros((o,), np.float32)

    def put_lin(key, o, i):
        w, b = lin(o, i)
        sd[key + ".weight"] = w
        sd[key + ".bias"] = b

    def put_msda(prefix, levels):
        put_lin(f"{prefix}.sampling_offsets", h * levels * pts_n * 2, c)
        put_lin(f"{prefix}.attention_weights", h * levels * pts_n, c)
        put_lin(f"{prefix}.value_proj", c, c)
        put_lin(f"{prefix}.output_proj", c, c)

    def put_ffn(prefix):
        put_lin(f"{prefix}.layers.0.0", 4 * c, c)
        put_lin(f"{prefix}.layers.1", c, 4 * c)

    def put_ln(prefix):
        sd[f"{prefix}.weight"] = np.zeros((c,), np.float32)
        sd[f"{prefix}.bias"] = np.zeros((c,), np.float32)

    # neck convs (torch [O, I, kh, kw]); in-channels read off our tree
    mine = _my_subtree_keys(target, "imgpts_neck")
    for conv in ("shared_conv_pts", "multi_scale_conv_img", "multi_scale_conv_pts"):
        kh, kw, ci, co = mine[f"params:imgpts_neck/{conv}/kernel"].shape
        sd[f"imgpts_neck.{conv}.weight"] = np.zeros((co, ci, kh, kw), np.float32)
        sd[f"imgpts_neck.{conv}.bias"] = np.zeros((co,), np.float32)

    for i in range(n.num_layers):
        img, pts = f"imgpts_neck.img_fusion_blocks.{i}", f"imgpts_neck.pts_fusion_blocks.{i}"
        for blk in (img, pts):
            sd[f"{blk}.scale"] = np.zeros((1,), np.float32)
            put_msda(f"{blk}.attentions.0", lv)
            for k in range(4):
                put_ln(f"{blk}.norms.{k}")
        put_msda(f"{img}.attentions.1.Local", 1)
        put_ffn(f"{img}.ffns.0")
        put_ffn(f"{img}.ffns.1")
        # pts attentions.2: packed-MHA MMRI_I2P (kdim == vdim == embed)
        sd[f"{pts}.attentions.2.learnedAlign.in_proj_weight"] = np.zeros((3 * c, c), np.float32)
        sd[f"{pts}.attentions.2.learnedAlign.in_proj_bias"] = np.zeros((3 * c,), np.float32)
        put_lin(f"{pts}.attentions.2.learnedAlign.out_proj", c, c)
        put_ffn(f"{pts}.ffns.0")

    flat, unmatched = convert_state_dict(sd)
    assert not unmatched, f"unmatched source keys: {unmatched[:8]}"

    new_tree, missing, shape_errors = load_into_tree(target, flat)
    assert not shape_errors, shape_errors[:8]
    # every neck + mmpi-core target leaf must be covered
    neck_missing = [m for m in missing if "imgpts_neck" in m]
    core_missing = [m for m in missing if "/core/" in m]
    assert not neck_missing, neck_missing[:8]
    assert not core_missing, core_missing[:8]


def test_v1_decode_head_mapping():
    """v1 MMPI decode_head blocks (ImageRCNNBlock/PointRCNNBlock) convert
    into the mmpi{i}_{img,pts}/core subtrees with full coverage."""
    import os
    import sys

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ref_shims import load_reference

    from deepinteraction_tpu.configs import fusion_base_config
    from deepinteraction_tpu.models.detector import DeepInteraction
    from deepinteraction_tpu.utils.testing import make_synthetic_batch

    cfg = fusion_base_config()
    model = DeepInteraction(cfg.model, cfg.data.padded_img_shape)
    batch = {k: jnp.asarray(v) for k, v in make_synthetic_batch(cfg, b=1).items()}
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), batch, False))
    target = jax.tree_util.tree_map(lambda s: np.zeros(s.shape, s.dtype), shapes)

    DU = load_reference("models/utils/decoder_utils.py", "ref_du_conv1")
    dcfg = cfg.model.pts_bbox_head
    tc = {"grid_size": [32, 32, 8], "out_size_factor": 8,
          "pc_range": [-10.0, -10.0], "voxel_size": [0.625, 0.625]}
    sd = {}
    for i in range(dcfg.num_mmpi):
        if i % 2 == 0:
            blk = DU.ImageRCNNBlock(6, dcfg.num_proposals, 4, tc, None,
                                    dcfg.hidden_channel, dcfg.num_heads, 0.0)
        else:
            blk = DU.PointRCNNBlock(dcfg.hidden_channel, dcfg.num_heads, 0.0, None)
        for k, v in blk.state_dict().items():
            sd[f"pts_bbox_head.decode_head.{i}.{k}"] = v.numpy()

    flat, unmatched = convert_state_dict(sd)
    assert not unmatched, f"unmatched source keys: {unmatched[:8]}"
    new_tree, missing, shape_errors = load_into_tree(target, flat)
    assert not shape_errors, shape_errors[:8]
    core_missing = [m for m in missing if "/core/" in m]
    assert not core_missing, core_missing[:8]
