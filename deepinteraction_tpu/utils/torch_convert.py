"""torch checkpoint -> deepinteraction_tpu parameter conversion.

The reference warm-starts from torch checkpoints (``load_from =
'pretrained/r50_fpn_voxel_0075.pth'``, config Fusion_0075_refactor.py:273)
and ships trained .pth files. This module maps a torch ``state_dict`` onto
our flax parameter tree:

- name mapping: one ordered regex-rule table (reference module attribute
  names -> our flax module names);
- layout adaptation: conv [O,I,kh,kw] -> [kh,kw,I,O]; conv1d [O,I,1] ->
  [I,O]; linear [O,I] -> [I,O]; spconv [O,kz,ky,kx,I] -> [kz*ky*kx,I,O]
  (tap order = (dz,dy,dx) row-major, ops/sparse_conv._kernel_offsets);
  packed MHA ``in_proj_weight`` [3C,C] -> split q/k/v transposed;
  BN weight/bias/running_mean/running_var -> scale/bias + batch_stats.

Unmatched source/target keys are returned in the report — conversion is
loud, never silent. (The released checkpoints are not redistributable in
this environment; the mapping is exercised structurally in
tests/test_torch_convert.py and any naming drift surfaces as unmatched
keys, fixable in the RULES table.)
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import numpy as np

# (torch regex, our template). \g<N> backrefs. Targets are
# "collection:path" flat keys with "/" separators.
RULES: List[Tuple[str, str]] = [
    # ---------------- image backbone (mmdet ResNet) ----------------
    (r"img_backbone\.conv1\.weight", "params:img_backbone/conv1/kernel"),
    (r"img_backbone\.bn1\.(.+)", "params:img_backbone/bn1/\\g<1>"),
    (
        r"img_backbone\.layer(\d)\.(\d+)\.conv(\d)\.weight",
        "params:img_backbone/layer\\g<1>_\\g<2>/conv\\g<3>/kernel",
    ),
    (
        r"img_backbone\.layer(\d)\.(\d+)\.bn(\d)\.(.+)",
        "params:img_backbone/layer\\g<1>_\\g<2>/bn\\g<3>/\\g<4>",
    ),
    (
        r"img_backbone\.layer(\d)\.(\d+)\.downsample\.0\.weight",
        "params:img_backbone/layer\\g<1>_\\g<2>/downsample_conv/kernel",
    ),
    (
        r"img_backbone\.layer(\d)\.(\d+)\.downsample\.1\.(.+)",
        "params:img_backbone/layer\\g<1>_\\g<2>/downsample_bn/\\g<3>",
    ),
    # ---------------- image backbone (mmdet SwinTransformer, ++) ----------
    (r"img_backbone\.patch_embed\.projection\.(weight|bias)", "params:img_backbone/patch_embed/\\g<1>"),
    (r"img_backbone\.patch_embed\.norm\.(.+)", "params:img_backbone/patch_norm/\\g<1>"),
    (
        r"img_backbone\.stages\.(\d)\.blocks\.(\d+)\.norm(\d)\.(.+)",
        "params:img_backbone/stage\\g<1>_block\\g<2>/norm\\g<3>/\\g<4>",
    ),
    (
        r"img_backbone\.stages\.(\d)\.blocks\.(\d+)\.attn\.w_msa\.(qkv|proj)\.(weight|bias)",
        "params:img_backbone/stage\\g<1>_block\\g<2>/attn/\\g<3>/\\g<4>",
    ),
    (
        r"img_backbone\.stages\.(\d)\.blocks\.(\d+)\.attn\.w_msa\.relative_position_bias_table",
        "params:img_backbone/stage\\g<1>_block\\g<2>/attn/rel_pos_bias",
    ),
    (
        r"img_backbone\.stages\.\d\.blocks\.\d+\.attn\.w_msa\.relative_position_index",
        lambda m: None,  # recomputed buffer
    ),
    (
        r"img_backbone\.stages\.(\d)\.blocks\.(\d+)\.ffn\.layers\.0\.0\.(weight|bias)",
        "params:img_backbone/stage\\g<1>_block\\g<2>/fc1/\\g<3>",
    ),
    (
        r"img_backbone\.stages\.(\d)\.blocks\.(\d+)\.ffn\.layers\.1\.(weight|bias)",
        "params:img_backbone/stage\\g<1>_block\\g<2>/fc2/\\g<3>",
    ),
    (
        r"img_backbone\.stages\.(\d)\.downsample\.norm\.(.+)",
        "params:img_backbone/merge\\g<1>/norm/\\g<2>",
    ),
    (
        r"img_backbone\.stages\.(\d)\.downsample\.reduction\.weight",
        "params:img_backbone/merge\\g<1>/reduction/kernel",
    ),
    (r"img_backbone\.norm(\d)\.(.+)", "params:img_backbone/out_norm\\g<1>/\\g<2>"),
    # ---------------- image neck (mmdet FPN) ----------------
    (
        r"img_neck\.lateral_convs\.(\d)\.conv\.(weight|bias)",
        "params:img_neck/lateral\\g<1>/\\g<2>",
    ),
    (
        r"img_neck\.fpn_convs\.(\d)\.conv\.(weight|bias)",
        "params:img_neck/fpn\\g<1>/\\g<2>",
    ),
    # ---------------- sparse middle encoder (mmdet3d SparseEncoder,
    # block_type='basicblock') ----------------
    (
        r"pts_middle_encoder\.conv_input\.0\.weight",
        "params:pts_middle_encoder/conv_input/w",
    ),
    (
        r"pts_middle_encoder\.conv_input\.1\.(.+)",
        "params:pts_middle_encoder/conv_input/bn/\\g<1>",
    ),
    (
        r"pts_middle_encoder\.encoder_layers\.encoder_layer(\d)\.(\d+)\.conv(\d)\.weight",
        lambda m: f"params:pts_middle_encoder/stage{int(m.group(1))-1}_block{m.group(2)}/w{m.group(3)}",
    ),
    (
        r"pts_middle_encoder\.encoder_layers\.encoder_layer(\d)\.(\d+)\.norm(\d)\.(.+)",
        lambda m: f"params:pts_middle_encoder/stage{int(m.group(1))-1}_block{m.group(2)}/bn{m.group(3)}/{m.group(4)}",
    ),
    # strided downsample conv at the end of stages 1-3 (index 2 in the stage)
    (
        r"pts_middle_encoder\.encoder_layers\.encoder_layer(\d)\.2\.0\.weight",
        lambda m: f"params:pts_middle_encoder/down{int(m.group(1))-1}_w",
    ),
    (
        r"pts_middle_encoder\.encoder_layers\.encoder_layer(\d)\.2\.1\.(.+)",
        lambda m: f"params:pts_middle_encoder/down{int(m.group(1))-1}_bn/{m.group(2)}",
    ),
    (r"pts_middle_encoder\.conv_out\.0\.weight", "params:pts_middle_encoder/conv_out_w"),
    (r"pts_middle_encoder\.conv_out\.1\.(.+)", "params:pts_middle_encoder/conv_out_bn/\\g<1>"),
    # ---------------- SECOND backbone ----------------
    # blocks.i = Sequential(pad, conv, bn, relu, [conv, bn, relu] * n)
    (
        r"pts_backbone\.blocks\.(\d)\.(\d+)\.weight",
        lambda m: _second_key(int(m.group(1)), int(m.group(2)), "weight"),
    ),
    (
        r"pts_backbone\.blocks\.(\d)\.(\d+)\.(bias|running_mean|running_var)",
        lambda m: _second_key(int(m.group(1)), int(m.group(2)), m.group(3)),
    ),
    # ---------------- SECONDFPN ----------------
    (
        r"pts_neck\.deblocks\.(\d)\.0\.weight",
        "params:pts_neck/deblock\\g<1>_conv/kernel",
    ),
    (
        r"pts_neck\.deblocks\.(\d)\.1\.(.+)",
        "params:pts_neck/deblock\\g<1>_bn/\\g<2>",
    ),
    # ---------------- MMRI encoder v1 ----------------
    (r"imgpts_neck\.shared_conv_img\.(weight|bias)", "params:imgpts_neck/shared_conv_img/\\g<1>"),
    (r"imgpts_neck\.shared_conv_pts\.(weight|bias)", "params:imgpts_neck/shared_conv_pts/\\g<1>"),
    # I2P nn.MultiheadAttention: the v1 encoder builds it with
    # pts_channels == img_channels == hidden (deepinteraction_encoder.py:12),
    # so torch PACKS the in-projection (in_proj_weight) — surfaced by
    # tests/test_reference_golden_fusion_layer.py. The unpacked q/k/v rule
    # is kept for kdim != embed_dim builds.
    (
        r"imgpts_neck\.fusion_blocks\.(\d)\.I2P_block\.learnedAlign\.in_proj_weight",
        "params:imgpts_neck/layer\\g<1>/i2p/in_proj_weight_packed",
    ),
    (
        r"imgpts_neck\.fusion_blocks\.(\d)\.I2P_block\.learnedAlign\.(q|k|v)_proj_weight",
        "params:imgpts_neck/layer\\g<1>/i2p/\\g<2>_proj/kernel",
    ),
    (
        r"imgpts_neck\.fusion_blocks\.(\d)\.I2P_block\.learnedAlign\.in_proj_bias",
        "params:imgpts_neck/layer\\g<1>/i2p/in_proj_bias_packed",
    ),
    (
        r"imgpts_neck\.fusion_blocks\.(\d)\.I2P_block\.learnedAlign\.out_proj\.(weight|bias)",
        "params:imgpts_neck/layer\\g<1>/i2p/out_proj/\\g<2>",
    ),
    # local attention blocks: query/key_project = Sequential(ConvBNReLU x2),
    # value_project = a ConvBNReLU directly (encoder_utils.py:84-126).
    # ConvBNReLU is a MODULE with named children conv/bn — real state_dict
    # keys are e.g. ``query_project.0.conv.weight`` / ``value_project.bn.*``
    # (surfaced by tests/test_reference_golden_fusion_layer.py; the old
    # numeric-index patterns never matched a real checkpoint).
    (
        r"imgpts_neck\.fusion_blocks\.(\d)\.(P_IML|I_IML)\.query_project\.(\d)\.(conv|bn)\.(.+)",
        lambda m: _locatt_key(m, "q"),
    ),
    (
        r"imgpts_neck\.fusion_blocks\.(\d)\.(P_IML|I_IML)\.key_project\.(\d)\.(conv|bn)\.(.+)",
        lambda m: _locatt_key(m, "k"),
    ),
    (
        r"imgpts_neck\.fusion_blocks\.(\d)\.(P_IML|I_IML)\.value_project\.(conv|bn)\.(.+)",
        lambda m: _locatt_value_key(m),
    ),
    (
        r"imgpts_neck\.fusion_blocks\.(\d)\.P2I_block\.Local\.(query_project|key_project)\.(\d)\.(conv|bn)\.(.+)",
        lambda m: _p2i_locatt_key(m),
    ),
    (
        r"imgpts_neck\.fusion_blocks\.(\d)\.P2I_block\.Local\.value_project\.(conv|bn)\.(.+)",
        lambda m: _p2i_locatt_value_key(m),
    ),
    (
        r"imgpts_neck\.fusion_blocks\.(\d)\.(P|I)_(out_proj|integration)\.(conv|bn)\.(.+)",
        lambda m: f"params:imgpts_neck/layer{m.group(1)}/"
        f"{m.group(2).lower()}_{m.group(3)}/{m.group(4)}/{m.group(5)}",
    ),
    # ---------------- FusionTransformerv4 (++ neck) ----------------
    # reference fusion_transformerv4.py:26-141; layer specs
    # Fusion_0075_plusplus.py:210-271. BaseTransformerLayer containers are
    # mmcv-owned naming: attentions.N / ffns.N / norms.N (ModuleList order
    # = operation_order scan); mmcv FFN nests layers.0.0 / layers.1; mmcv
    # MSDA leaves are sampling_offsets/attention_weights/value_proj/
    # output_proj (multi_scale_deform_attn.py).
    (
        r"imgpts_neck\.multi_scale_conv_(img|pts)\.(weight|bias)",
        "params:imgpts_neck/multi_scale_conv_\\g<1>/\\g<2>",
    ),
    (
        r"imgpts_neck\.(img|pts)_fusion_blocks\.(\d)\.scale",
        "params:imgpts_neck/\\g<1>_layer\\g<2>/scale",
    ),
    (
        r"imgpts_neck\.(img|pts)_fusion_blocks\.(\d)\.attentions\.0\."
        r"(sampling_offsets|attention_weights|value_proj|output_proj)\.(weight|bias)",
        "params:imgpts_neck/\\g<1>_layer\\g<2>/self_attn/\\g<3>/\\g<4>",
    ),
    (
        r"imgpts_neck\.img_fusion_blocks\.(\d)\.attentions\.1\.Local\."
        r"(sampling_offsets|attention_weights|value_proj|output_proj)\.(weight|bias)",
        "params:imgpts_neck/img_layer\\g<1>/p2i/local/\\g<2>/\\g<3>",
    ),
    # MMRI_I2P_Polar (pts attentions.1): nn.Transformer with a 0-layer
    # encoder (only its final norm) + 1 custom decoder layer
    (
        r"imgpts_neck\.pts_fusion_blocks\.(\d)\.attentions\.1\.transformer_layers\."
        r"encoder\.norm\.(weight|bias)",
        "params:imgpts_neck/pts_layer\\g<1>/polar_i2p/enc_out_norm/\\g<2>",
    ),
    (
        r"imgpts_neck\.pts_fusion_blocks\.(\d)\.attentions\.1\.transformer_layers\."
        r"decoder\.norm\.(weight|bias)",
        "params:imgpts_neck/pts_layer\\g<1>/polar_i2p/dec_out_norm/\\g<2>",
    ),
    (
        r"imgpts_neck\.pts_fusion_blocks\.(\d)\.attentions\.1\.transformer_layers\."
        r"decoder\.layers\.0\.(self_attn|multihead_attn)\.in_proj_(weight|bias)",
        lambda m: f"params:imgpts_neck/pts_layer{m.group(1)}/polar_i2p/dec_"
        + ("self_attn" if m.group(2) == "self_attn" else "cross_attn")
        + f"/in_proj_{m.group(3)}_packed",
    ),
    (
        r"imgpts_neck\.pts_fusion_blocks\.(\d)\.attentions\.1\.transformer_layers\."
        r"decoder\.layers\.0\.(self_attn|multihead_attn)\.out_proj\.(weight|bias)",
        lambda m: f"params:imgpts_neck/pts_layer{m.group(1)}/polar_i2p/dec_"
        + ("self_attn" if m.group(2) == "self_attn" else "cross_attn")
        + f"/out_proj/{m.group(3)}",
    ),
    (
        r"imgpts_neck\.pts_fusion_blocks\.(\d)\.attentions\.1\.transformer_layers\."
        r"decoder\.layers\.0\.linear(\d)\.(weight|bias)",
        lambda m: f"params:imgpts_neck/pts_layer{m.group(1)}/polar_i2p/dec_ffn/"
        f"fc{int(m.group(2)) - 1}/{m.group(3)}",
    ),
    (
        r"imgpts_neck\.pts_fusion_blocks\.(\d)\.attentions\.1\.transformer_layers\."
        r"decoder\.layers\.0\.norm(\d)\.(weight|bias)",
        "params:imgpts_neck/pts_layer\\g<1>/polar_i2p/dec_norm\\g<2>/\\g<3>",
    ),
    # ++ MMRI_I2P (pts attentions.2): kdim == vdim == embed_dims so torch
    # packs the in-projection (unlike v1's 256-ch kdim, unpacked above)
    (
        r"imgpts_neck\.pts_fusion_blocks\.(\d)\.attentions\.2\.learnedAlign\."
        r"in_proj_(weight|bias)",
        "params:imgpts_neck/pts_layer\\g<1>/i2p/in_proj_\\g<2>_packed",
    ),
    (
        r"imgpts_neck\.pts_fusion_blocks\.(\d)\.attentions\.2\.learnedAlign\."
        r"out_proj\.(weight|bias)",
        "params:imgpts_neck/pts_layer\\g<1>/i2p/out_proj/\\g<2>",
    ),
    (
        r"imgpts_neck\.(img|pts)_fusion_blocks\.(\d)\.ffns\.(\d)\.layers\.0\.0\.(weight|bias)",
        "params:imgpts_neck/\\g<1>_layer\\g<2>/ffn\\g<3>/fc0/\\g<4>",
    ),
    (
        r"imgpts_neck\.(img|pts)_fusion_blocks\.(\d)\.ffns\.(\d)\.layers\.1\.(weight|bias)",
        "params:imgpts_neck/\\g<1>_layer\\g<2>/ffn\\g<3>/fc1/\\g<4>",
    ),
    (
        r"imgpts_neck\.(img|pts)_fusion_blocks\.(\d)\.norms\.(\d)\.(weight|bias)",
        "params:imgpts_neck/\\g<1>_layer\\g<2>/norm\\g<3>/\\g<4>",
    ),
    # ---------------- decoder head ----------------
    (r"pts_bbox_head\.heatmap_head\.0\.conv\.(weight|bias)", "params:pts_bbox_head/heatmap_head_0/conv/\\g<1>"),
    (r"pts_bbox_head\.heatmap_head\.0\.bn\.(.+)", "params:pts_bbox_head/heatmap_head_0/bn/\\g<1>"),
    (r"pts_bbox_head\.heatmap_head\.1\.(weight|bias)", "params:pts_bbox_head/heatmap_head_1/\\g<1>"),
    (r"pts_bbox_head\.heatmap_head_img\.0\.conv\.(weight|bias)", "params:pts_bbox_head/heatmap_head_img_0/conv/\\g<1>"),
    (r"pts_bbox_head\.heatmap_head_img\.0\.bn\.(.+)", "params:pts_bbox_head/heatmap_head_img_0/bn/\\g<1>"),
    (r"pts_bbox_head\.heatmap_head_img\.1\.(weight|bias)", "params:pts_bbox_head/heatmap_head_img_1/\\g<1>"),
    (r"pts_bbox_head\.class_encoding\.(weight|bias)", "params:pts_bbox_head/class_encoding/\\g<1>"),
    # decoder.0 transformer layer
    (
        r"pts_bbox_head\.decoder\.0\.(self_attn|multihead_attn)\.in_proj_(weight|bias)",
        lambda m: "params:pts_bbox_head/decoder0/"
        + ("self_attn" if m.group(1) == "self_attn" else "cross_attn")
        + "/in_proj_" + m.group(2) + "_packed",
    ),
    (
        r"pts_bbox_head\.decoder\.0\.(self_attn|multihead_attn)\.out_proj\.(weight|bias)",
        lambda m: "params:pts_bbox_head/decoder0/"
        + ("self_attn" if m.group(1) == "self_attn" else "cross_attn")
        + "/out_proj/" + m.group(2),
    ),
    (
        r"pts_bbox_head\.decoder\.0\.linear(\d)\.(weight|bias)",
        "params:pts_bbox_head/decoder0/linear\\g<1>/\\g<2>",
    ),
    (
        r"pts_bbox_head\.decoder\.0\.norm(\d)\.(weight|bias)",
        "params:pts_bbox_head/decoder0/norm\\g<1>/\\g<2>",
    ),
    (
        r"pts_bbox_head\.decoder\.0\.(self|cross)_posembed\.position_embedding_head\.0\.(weight|bias)",
        "params:pts_bbox_head/decoder0/\\g<1>_posembed/fc0/\\g<2>",
    ),
    (
        r"pts_bbox_head\.decoder\.0\.(self|cross)_posembed\.position_embedding_head\.1\.(.+)",
        "params:pts_bbox_head/decoder0/\\g<1>_posembed/bn0/\\g<2>",
    ),
    (
        r"pts_bbox_head\.decoder\.0\.(self|cross)_posembed\.position_embedding_head\.3\.(weight|bias)",
        "params:pts_bbox_head/decoder0/\\g<1>_posembed/fc1/\\g<2>",
    ),
    # prediction heads: prediction_heads.0 / pred_head.{i}; each head branch
    # name.{0.conv,0.bn,1}
    (
        r"pts_bbox_head\.prediction_heads\.0\.(\w+)\.0\.conv\.(weight|bias)",
        "params:pts_bbox_head/pred0/\\g<1>/fc0/\\g<2>",
    ),
    (
        r"pts_bbox_head\.prediction_heads\.0\.(\w+)\.0\.bn\.(.+)",
        "params:pts_bbox_head/pred0/\\g<1>/bn0/\\g<2>",
    ),
    (
        r"pts_bbox_head\.prediction_heads\.0\.(\w+)\.1\.(weight|bias)",
        "params:pts_bbox_head/pred0/\\g<1>/out/\\g<2>",
    ),
    (
        r"pts_bbox_head\.pred_head\.(\d)\.(\w+)\.0\.conv\.(weight|bias)",
        "params:pts_bbox_head/mmpi\\g<1>_pred/\\g<2>/fc0/\\g<3>",
    ),
    (
        r"pts_bbox_head\.pred_head\.(\d)\.(\w+)\.0\.bn\.(.+)",
        "params:pts_bbox_head/mmpi\\g<1>_pred/\\g<2>/bn0/\\g<3>",
    ),
    (
        r"pts_bbox_head\.pred_head\.(\d)\.(\w+)\.1\.(weight|bias)",
        "params:pts_bbox_head/mmpi\\g<1>_pred/\\g<2>/out/\\g<3>",
    ),
    # ---------------- MMPI decode_head blocks (v1 + ++ V2) ----------------
    # decode_head.{i}: even = ImageRCNNBlock(V2), odd = PointRCNNBlock(V2)
    # (deepinteraction_decoder.py:105-132 / plusplus_decoder.py:125-148).
    # Point blocks suffix their attribute names with _pts; V2 adds the two
    # scale scalars, self_norm and plain-Sequential ffn/self_ffn
    # (layers.0 / layers.3 Linears). Ours: pts_bbox_head/mmpi{i}_{kind}/core.
    (
        r"pts_bbox_head\.decode_head\.(\d)\.dyconv(_pts)?\.(dynamic_layer|out_layer)\.(weight|bias)",
        lambda m: _mmpi(m.group(1)) + f"/dyconv/{m.group(3)}/{m.group(4)}",
    ),
    (
        r"pts_bbox_head\.decode_head\.(\d)\.dyconv(_pts)?\.norm(\d)\.(weight|bias)",
        lambda m: _mmpi(m.group(1)) + f"/dyconv/norm{m.group(3)}/{m.group(4)}",
    ),
    (
        r"pts_bbox_head\.decode_head\.(\d)\.dyconv_pre_self_attn(_pts)?\.in_proj_(weight|bias)",
        lambda m: _mmpi(m.group(1)) + f"/self_attn/in_proj_{m.group(3)}_packed",
    ),
    (
        r"pts_bbox_head\.decode_head\.(\d)\.dyconv_pre_self_attn(_pts)?\.out_proj\.(weight|bias)",
        lambda m: _mmpi(m.group(1)) + f"/self_attn/out_proj/{m.group(3)}",
    ),
    (
        r"pts_bbox_head\.decode_head\.(\d)\.norm(\d)(_pts)?\.(weight|bias)",
        lambda m: _mmpi(m.group(1)) + f"/norm{m.group(2)}/{m.group(4)}",
    ),
    (
        r"pts_bbox_head\.decode_head\.(\d)\.linear(\d)(_pts)?\.(weight|bias)",
        lambda m: _mmpi(m.group(1)) + f"/linear{m.group(2)}/{m.group(4)}",
    ),
    (
        r"pts_bbox_head\.decode_head\.(\d)\.(scale|self_scale)$",
        lambda m: _mmpi(m.group(1)) + f"/{m.group(2)}",
    ),
    (
        r"pts_bbox_head\.decode_head\.(\d)\.self_norm(_pts)?\.(weight|bias)",
        lambda m: _mmpi(m.group(1)) + f"/self_norm/{m.group(3)}",
    ),
    (
        r"pts_bbox_head\.decode_head\.(\d)\.(self_ffn|ffn)\.layers\.([03])\.(weight|bias)",
        lambda m: _mmpi(m.group(1))
        + ("/self_ffn_fc" if m.group(2) == "self_ffn" else "/ffn_fc")
        + ("0" if m.group(3) == "0" else "1")
        + f"/{m.group(4)}",
    ),
]


def _mmpi(i: str) -> str:
    kind = "img" if int(i) % 2 == 0 else "pts"
    return f"params:pts_bbox_head/mmpi{i}_{kind}/core"


def _second_key(block: int, idx: int, leaf: str) -> str:
    """mmdet3d SECOND block Sequential layout:
    [ZeroPad, Conv, BN, ReLU] + [Conv, BN, ReLU] * layer_num."""
    if idx == 0:
        return None  # ZeroPad2d, no params
    j = idx - 1
    conv_i, kind = divmod(j, 3)[0], j % 3
    if kind == 0 and leaf == "weight":
        return f"params:pts_backbone/block{block}_conv{conv_i}/kernel"
    if kind == 1:
        return f"params:pts_backbone/block{block}_bn{conv_i}/{leaf}"
    return None


def _locatt_key(m, which: str) -> str:
    block, mod = m.group(1), m.group(2)
    seq, inner, leaf = int(m.group(3)), m.group(4), m.group(5)
    name = "p_iml" if mod == "P_IML" else "i_iml"
    return f"params:imgpts_neck/layer{block}/{name}/{which}{seq}/{inner}/{leaf}"


def _locatt_value_key(m) -> str:
    block, mod = m.group(1), m.group(2)
    inner, leaf = m.group(3), m.group(4)
    name = "p_iml" if mod == "P_IML" else "i_iml"
    return f"params:imgpts_neck/layer{block}/{name}/v/{inner}/{leaf}"


def _p2i_locatt_key(m) -> str:
    block = m.group(1)
    which = "q" if m.group(2) == "query_project" else "k"
    seq, inner, leaf = int(m.group(3)), m.group(4), m.group(5)
    return f"params:imgpts_neck/layer{block}/p2i_local/{which}{seq}/{inner}/{leaf}"


def _p2i_locatt_value_key(m) -> str:
    block, inner, leaf = m.group(1), m.group(2), m.group(3)
    return f"params:imgpts_neck/layer{block}/p2i_local/v/{inner}/{leaf}"


def _adapt(value: np.ndarray, src_key: str, dst_key: str) -> Dict[str, np.ndarray]:
    """Layout conversion. Returns {final_flat_key: array} (packed keys may
    expand to several)."""
    v = np.asarray(value)
    coll, path = dst_key.split(":", 1)
    leaf = path.rsplit("/", 1)[-1]

    if leaf == "running_mean":
        return {"batch_stats:" + path.replace("running_mean", "mean"): v}
    if leaf == "running_var":
        return {"batch_stats:" + path.replace("running_var", "var"): v}
    if leaf == "num_batches_tracked":
        return {}

    parent = path.split("/")[-2] if "/" in path else ""
    is_norm = re.fullmatch(r".*(bn|norm)\d*", parent) is not None
    if is_norm:
        if leaf == "weight":
            return {coll + ":" + path[: -len("weight")] + "scale": v}
        return {coll + ":" + path: v}

    # packed torch MHA projections -> q/k/v
    if path.endswith("in_proj_weight_packed"):
        base = path[: -len("in_proj_weight_packed")]
        c = v.shape[0] // 3
        return {
            coll + ":" + base + "q_proj/kernel": v[:c].T,
            coll + ":" + base + "k_proj/kernel": v[c : 2 * c].T,
            coll + ":" + base + "v_proj/kernel": v[2 * c :].T,
        }
    if path.endswith("in_proj_bias_packed"):
        base = path[: -len("in_proj_bias_packed")]
        c = v.shape[0] // 3
        return {
            coll + ":" + base + "q_proj/bias": v[:c],
            coll + ":" + base + "k_proj/bias": v[c : 2 * c],
            coll + ":" + base + "v_proj/bias": v[2 * c :],
        }

    if leaf == "kernel" or (leaf == "weight" and not is_norm) or leaf.startswith("w"):
        tgt = path if leaf != "weight" else path[: -len("weight")] + "kernel"
        if v.ndim == 5:  # spconv [O, kz, ky, kx, I] -> [taps, I, O]
            o = v.shape[0]
            v = v.reshape(o, -1, v.shape[-1]).transpose(1, 2, 0)
            return {coll + ":" + path: v}  # our sparse weights keep their name
        if v.ndim == 4:  # conv2d [O, I, kh, kw] -> [kh, kw, I, O]
            return {coll + ":" + tgt: v.transpose(2, 3, 1, 0)}
        if v.ndim == 3:  # conv1d [O, I, 1] -> dense [I, O]
            return {coll + ":" + tgt: v[..., 0].T}
        if v.ndim == 2:  # linear [O, I] -> [I, O]
            return {coll + ":" + tgt: v.T}
        return {coll + ":" + tgt: v}
    return {coll + ":" + path: v}


def _rewire_box_convention(flat: Dict[str, np.ndarray]) -> None:
    """Rewire dim/rot prediction-head OUTPUT channels from the reference's
    v0.17 box convention to this repo's, in place.

    The reference stores boxes as (x, y, z, w, l, h, yaw') with
    yaw' = -yaw - pi/2 (pre-1.0 mmdet3d; tools/data_converter/
    nuscenes_converter.py:253 ``-rots - np.pi / 2`` and ``dims = box.wlh``);
    this repo stores (x, y, z_bottom, l, w, h, yaw_CCW)
    (data/nuscenes_converter.py:15). Same physical boxes — the raw head
    channels map linearly: dim (log-space) swaps channels (0, 1); rot
    (sin, cos) maps (a, b) -> (-b, -a) since sin(-y'-pi/2) = -cos(y') and
    cos(-y'-pi/2) = -sin(y'). Both maps are self-inverse, so the same
    rewiring converts either direction. Without this, converted reference
    checkpoints would predict mirrored-footprint boxes under our corners/
    IoU/NMS interpretation (tests/test_reference_golden_mmpi.py has the
    geometry argument)."""
    for key in list(flat):
        m = re.fullmatch(r"params:(.*)/(dim|rot)/out/(kernel|bias)", key)
        if not m:
            continue
        v = flat[key]
        if m.group(2) == "dim":
            perm = [1, 0, 2]
            flat[key] = v[..., perm] if v.ndim else v
        else:  # rot: (a, b) -> (-b, -a)
            flat[key] = -v[..., [1, 0]]


def convert_state_dict(
    state_dict: Dict[str, Any]
) -> Tuple[Dict[str, np.ndarray], List[str]]:
    """Returns (flat {"collection:path": array}, unmatched torch keys)."""
    out: Dict[str, np.ndarray] = {}
    unmatched: List[str] = []
    for key, value in state_dict.items():
        key_s = key[len("module."):] if key.startswith("module.") else key
        if key_s.endswith("num_batches_tracked"):
            continue  # torch BN bookkeeping scalar; no JAX counterpart
        hit = False
        for pat, tpl in RULES:
            m = re.fullmatch(pat, key_s)
            if not m:
                continue
            dst = tpl(m) if callable(tpl) else m.expand(tpl)
            if dst is None:
                hit = True
                break
            out.update(_adapt(np.asarray(value), key_s, dst))
            hit = True
            break
        if not hit:
            unmatched.append(key_s)
    _rewire_box_convention(out)
    return out, unmatched


def unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """{"params:a/b/c": v} -> {"params": {"a": {"b": {"c": v}}}}."""
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        coll, path = key.split(":", 1)
        node = tree.setdefault(coll, {})
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def load_into_tree(target: Dict[str, Any], flat: Dict[str, np.ndarray]):
    """Copy converted leaves into a target variables tree (params +
    batch_stats), returning (new_tree, missing_target_keys, shape_errors)."""
    import jax

    converted = dict(flat)
    missing, shape_errors = [], []

    def visit(coll, path, leaf):
        key = f"{coll}:{'/'.join(path)}"
        if key in converted:
            v = converted.pop(key)
            if tuple(v.shape) != tuple(leaf.shape):
                shape_errors.append((key, tuple(v.shape), tuple(leaf.shape)))
                return leaf
            return v.astype(np.asarray(leaf).dtype)
        missing.append(key)
        return leaf

    new_tree = {}
    for coll in target:
        # Rebuild with the ORIGINAL treedef: some modules use literal
        # slashes inside one param name (MMRI_I2P's "q_proj/kernel"), so
        # re-nesting by splitting the joined path would corrupt the tree.
        paths, treedef = jax.tree_util.tree_flatten_with_path(target[coll])
        leaves = []
        for p, leaf in paths:
            keypath = [str(getattr(k, "key", k)) for k in p]
            leaves.append(visit(coll, keypath, leaf))
        new_tree[coll] = jax.tree_util.tree_unflatten(treedef, leaves)
    return new_tree, missing, shape_errors
