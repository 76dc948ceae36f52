"""Test-only import shims so the reference's pure-torch modules load as
oracles (VERDICT round-1 missing #5).

The reference's decoder blocks (decoder_utils.py) and box coder import
mmcv/mmdet3d/mmdet/detectron2 *names*; none of those frameworks exist here.
This installs minimal faithful stand-ins into sys.modules — only what the
blocks under test actually execute (ConvModule's conv->BN1d->ReLU order,
build_conv_layer, the mmcv-FFN residual MLP); everything else is an inert
placeholder. Oracle modules are imported straight from /root/reference at
test time; no reference code is copied into this repo.
"""

from __future__ import annotations

import importlib.util
import sys
import types

import torch
import torch.nn as nn
import torch.nn.functional as F

REF = "/root/reference/projects/mmdet3d_plugin"


def _mod(name: str) -> types.ModuleType:
    m = sys.modules.get(name)
    if m is None:
        m = types.ModuleType(name)
        sys.modules[name] = m
    return m


def build_conv_layer(cfg, *args, **kwargs):
    t = (cfg or {"type": "Conv2d"}).get("type", "Conv2d")
    return {"Conv1d": nn.Conv1d, "Conv2d": nn.Conv2d, "Conv3d": nn.Conv3d}[t](
        *args, **kwargs
    )


def _build_norm(cfg, num_features):
    t = (cfg or {"type": "BN"}).get("type", "BN")
    cls = {"BN1d": nn.BatchNorm1d, "BN": nn.BatchNorm2d, "BN2d": nn.BatchNorm2d,
           "LN": nn.LayerNorm}[t]
    return cls(num_features)


class ConvModule(nn.Module):
    """mmcv ConvModule, conv->norm->act order, bias='auto' semantics."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, groups=1, bias="auto", conv_cfg=None,
                 norm_cfg=None, act_cfg=None, **kwargs):
        super().__init__()
        if bias == "auto":
            bias = norm_cfg is None
        self.conv = build_conv_layer(
            conv_cfg, in_channels, out_channels, kernel_size, stride=stride,
            padding=padding, dilation=dilation, groups=groups, bias=bias)
        self.bn = _build_norm(norm_cfg, out_channels) if norm_cfg else None
        self.activate = nn.ReLU(inplace=True)

    def forward(self, x):
        x = self.conv(x)
        if self.bn is not None:
            x = self.bn(x)
        return self.activate(x)


class TransFFN(nn.Module):
    """mmcv bricks FFN: (Linear -> ReLU -> drop) x (num_fcs-1) -> Linear ->
    drop, residual add."""

    def __init__(self, embed_dims=256, feedforward_channels=1024, num_fcs=2,
                 ffn_drop=0.0, add_identity=True, act_cfg=None, **kwargs):
        super().__init__()
        act = {"ReLU": nn.ReLU, "GELU": nn.GELU}[
            (act_cfg or {"type": "ReLU"}).get("type", "ReLU")
        ]
        layers = []
        c = embed_dims
        for _ in range(num_fcs - 1):
            layers += [nn.Linear(c, feedforward_channels), act(),
                       nn.Dropout(ffn_drop)]
            c = feedforward_channels
        layers += [nn.Linear(c, embed_dims), nn.Dropout(ffn_drop)]
        self.layers = nn.Sequential(*layers)
        self.add_identity = add_identity

    def forward(self, x, identity=None):
        out = self.layers(x)
        if not self.add_identity:
            return out
        return (x if identity is None else identity) + out


def kaiming_init(module, **kwargs):
    if getattr(module, "weight", None) is not None:
        nn.init.kaiming_normal_(module.weight)


def build_norm_layer(cfg, num_features, postfix=""):
    t = (cfg or {"type": "LN"}).get("type", "LN")
    cls = {"LN": nn.LayerNorm, "BN": nn.BatchNorm2d, "BN1d": nn.BatchNorm1d}[t]
    return f"{t.lower()}{postfix}", cls(num_features)


class DropPath(nn.Module):
    """mmcv bricks DropPath (eval = identity; train drops whole samples)."""

    def __init__(self, drop_prob=0.0):
        super().__init__()
        self.drop_prob = drop_prob

    def forward(self, x):
        if self.drop_prob == 0.0 or not self.training:
            return x
        keep = 1.0 - self.drop_prob
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = x.new_empty(shape).bernoulli_(keep)
        return x * mask / keep


def build_dropout(cfg):
    if cfg is None:
        return nn.Identity()
    t = cfg.get("type", "Dropout")
    if t == "DropPath":
        return DropPath(cfg.get("drop_prob", 0.0))
    return nn.Dropout(cfg.get("drop_prob", 0.0))


class BaseModule(nn.Module):
    def __init__(self, init_cfg=None):
        super().__init__()
        self.init_cfg = init_cfg

    def init_weights(self):
        pass


def to_2tuple(x):
    return tuple(x) if isinstance(x, (tuple, list)) else (x, x)


def _unfold_similar_forward(x_ori, x_loc, kH, kW):
    """CPU oracle for the reference CUDA ``similar_forward``
    (models/utils/ops/locatt_ops): logits of each pixel's query against its
    kH x kW zero-padded neighborhood — [B, H, W, kH*kW]."""
    import torch.nn.functional as F

    b, c, h, w = x_ori.shape
    unf = F.unfold(x_loc, (kH, kW), padding=(kH // 2, kW // 2))
    unf = unf.view(b, c, kH * kW, h * w)
    out = (x_ori.view(b, c, 1, h * w) * unf).sum(1)  # [B, K, H*W]
    return out.permute(0, 2, 1).reshape(b, h, w, kH * kW)


def _unfold_weighting_forward(x_ori, x_weight, kH, kW):
    """CPU oracle for ``weighting_forward``: weighted sum of each pixel's
    zero-padded value neighborhood — [B, C, H, W]."""
    import torch.nn.functional as F

    b, c, h, w = x_ori.shape
    unf = F.unfold(x_ori, (kH, kW), padding=(kH // 2, kW // 2))
    unf = unf.view(b, c, kH * kW, h * w)
    wgt = x_weight.reshape(b, 1, h * w, kH * kW).permute(0, 1, 3, 2)
    return (unf * wgt).sum(2).view(b, c, h, w)


class _Registry:
    """mmcv Registry shim that actually STORES classes, so the
    BaseTransformerLayer shim below can build ``attn_cfgs`` by type name
    exactly like mmcv's ``build_attention`` does."""

    def __init__(self):
        self._map = {}

    def register_module(self, *a, **k):
        def deco(cls):
            self._map[cls.__name__] = cls
            return cls

        return deco(a[0]) if (a and isinstance(a[0], type)) else deco

    def get(self, name):
        return self._map[name]

    def build(self, cfg):
        cfg = dict(cfg)
        return self._map[cfg.pop("type")](**cfg)


# shared ATTENTION registry: fusion_transformerv4.py registers its
# DeepInteractionLayer / MMRI_* classes into it at import; TorchMSDA below
# is pre-registered so attn_cfgs with type='MultiScaleDeformableAttention'
# resolve (the reference gets that one from mmcv itself).
ATTENTION = _Registry()
TRANSFORMER_LAYER = _Registry()


class TorchMSDA(nn.Module):
    """mmcv ``MultiScaleDeformableAttention`` re-implemented faithfully on
    ``F.grid_sample`` (the documented ``multi_scale_deformable_attn_pytorch``
    fallback, mmcv multi_scale_deform_attn.py) — same parameter names
    (sampling_offsets / attention_weights / value_proj / output_proj) so
    state_dicts convert through the real torch_convert rules."""

    def __init__(self, embed_dims=256, num_heads=8, num_levels=4, num_points=4,
                 im2col_step=64, dropout=0.1, batch_first=False, norm_cfg=None,
                 init_cfg=None):
        super().__init__()
        assert embed_dims % num_heads == 0
        self.embed_dims = embed_dims
        self.num_heads = num_heads
        self.num_levels = num_levels
        self.num_points = num_points
        self.batch_first = batch_first
        self.dropout = nn.Dropout(dropout)
        self.sampling_offsets = nn.Linear(
            embed_dims, num_heads * num_levels * num_points * 2)
        self.attention_weights = nn.Linear(
            embed_dims, num_heads * num_levels * num_points)
        self.value_proj = nn.Linear(embed_dims, embed_dims)
        self.output_proj = nn.Linear(embed_dims, embed_dims)

    def forward(self, query, key=None, value=None, identity=None,
                query_pos=None, key_padding_mask=None, reference_points=None,
                spatial_shapes=None, level_start_index=None, **kwargs):
        if value is None:
            value = query
        if identity is None:
            identity = query
        if query_pos is not None:
            query = query + query_pos
        if not self.batch_first:
            query = query.permute(1, 0, 2)
            value = value.permute(1, 0, 2)
        bs, nq, _ = query.shape
        nv = value.shape[1]
        h, l, p = self.num_heads, self.num_levels, self.num_points
        hd = self.embed_dims // h

        v = self.value_proj(value)
        if key_padding_mask is not None:
            v = v.masked_fill(key_padding_mask[..., None], 0.0)
        v = v.view(bs, nv, h, hd)
        offsets = self.sampling_offsets(query).view(bs, nq, h, l, p, 2)
        weights = self.attention_weights(query).view(bs, nq, h, l * p)
        weights = weights.softmax(-1).view(bs, nq, h, l, p)

        assert reference_points.shape[-1] == 2
        normalizer = torch.stack(
            [spatial_shapes[..., 1], spatial_shapes[..., 0]], -1).float()
        loc = (reference_points[:, :, None, :, None, :]
               + offsets / normalizer[None, None, None, :, None, :])

        sizes = [int(hh) * int(ww) for hh, ww in spatial_shapes]
        value_list = v.split(sizes, dim=1)
        grids = 2 * loc - 1
        sampled_all = []
        for lvl in range(l):
            hh, ww = int(spatial_shapes[lvl][0]), int(spatial_shapes[lvl][1])
            vl = (value_list[lvl].flatten(2).transpose(1, 2)
                  .reshape(bs * h, hd, hh, ww))
            gl = grids[:, :, :, lvl].transpose(1, 2).flatten(0, 1)  # [bs*h,nq,p,2]
            sampled_all.append(F.grid_sample(
                vl, gl, mode="bilinear", padding_mode="zeros",
                align_corners=False))  # [bs*h, hd, nq, p]
        attn = (weights.transpose(1, 2)
                .reshape(bs * h, 1, nq, l * p))
        out = ((torch.stack(sampled_all, dim=-2).flatten(-2) * attn)
               .sum(-1).view(bs, h * hd, nq).transpose(1, 2))
        out = self.output_proj(out)
        if not self.batch_first:
            out = out.permute(1, 0, 2)
        return self.dropout(out) + identity


class MMCVFFN(nn.Module):
    """mmcv FFN with its REAL parameter naming: ``layers`` is
    Sequential(Sequential(Linear, act, Dropout) x (num_fcs-1), Linear,
    Dropout), so state_dict keys are ``layers.0.0.weight`` / ``layers.1.weight``
    — the names the torch_convert rules match. TransFFN above flattens the
    Sequential (kept: the swin oracle indexes it positionally)."""

    def __init__(self, embed_dims=256, feedforward_channels=1024, num_fcs=2,
                 ffn_drop=0.0, add_identity=True, act_cfg=None, **kwargs):
        super().__init__()
        act = {"ReLU": nn.ReLU, "GELU": nn.GELU}[
            (act_cfg or {"type": "ReLU"}).get("type", "ReLU")
        ]
        blocks = []
        c = embed_dims
        for _ in range(num_fcs - 1):
            blocks.append(
                nn.Sequential(nn.Linear(c, feedforward_channels), act(),
                              nn.Dropout(ffn_drop)))
            c = feedforward_channels
        blocks += [nn.Linear(c, embed_dims), nn.Dropout(ffn_drop)]
        self.layers = nn.Sequential(*blocks)
        self.add_identity = add_identity

    def forward(self, x, identity=None):
        out = self.layers(x)
        if not self.add_identity:
            return out
        return (x if identity is None else identity) + out


class RefBaseTransformerLayer(nn.Module):
    """mmcv ``BaseTransformerLayer.__init__`` semantics (transformer.py):
    builds ``self.attentions`` from attn_cfgs via the ATTENTION registry,
    one LayerNorm per 'norm' op, one FFN per 'ffn' op; the reference's
    DeepInteractionLayer overrides ``forward`` entirely and only relies on
    these attributes (fusion_transformerv4.py:143-218)."""

    def __init__(self, attn_cfgs=None, ffn_cfgs=None, operation_order=None,
                 norm_cfg=None, batch_first=True, init_cfg=None, **kwargs):
        super().__init__()
        self.batch_first = batch_first
        self.operation_order = operation_order
        self.pre_norm = operation_order[0] == "norm"
        if isinstance(attn_cfgs, dict):
            attn_cfgs = [attn_cfgs]
        attns = []
        for cfg in attn_cfgs:
            attns.append(ATTENTION.build(dict(cfg)))
        self.attentions = nn.ModuleList(attns)
        self.embed_dims = self.attentions[0].embed_dims
        num_ffns = operation_order.count("ffn")
        fcfg = dict(ffn_cfgs or {})
        fcfg.pop("type", None)
        self.ffns = nn.ModuleList(
            [MMCVFFN(**fcfg) for _ in range(num_ffns)])
        num_norms = operation_order.count("norm")
        self.norms = nn.ModuleList(
            [nn.LayerNorm(self.embed_dims) for _ in range(num_norms)])


ATTENTION._map["MultiScaleDeformableAttention"] = TorchMSDA


def _identity_3d_transformation(pts, coord_type, img_meta, reverse=False):
    """apply_3d_transformation with no recorded aug flow == identity (the
    encoder-side golden tests feed unaugmented geometry)."""
    return pts


def install() -> None:
    mmcv_cnn = _mod("mmcv.cnn")
    mmcv_cnn.ConvModule = ConvModule
    mmcv_cnn.build_conv_layer = build_conv_layer
    mmcv_cnn.kaiming_init = kaiming_init
    mmcv_cnn.build_norm_layer = build_norm_layer
    mmcv_cnn.constant_init = lambda *a, **k: None
    mmcv_cnn.trunc_normal_init = lambda *a, **k: None
    bricks = _mod("mmcv.cnn.bricks")
    bt = _mod("mmcv.cnn.bricks.transformer")
    bt.FFN = TransFFN
    bt.build_dropout = build_dropout
    bricks.transformer = bt
    wi = _mod("mmcv.cnn.utils.weight_init")
    wi.trunc_normal_ = lambda tensor, *a, **k: tensor
    _mod("mmcv.cnn.utils").weight_init = wi
    mmcv_cnn.utils = sys.modules["mmcv.cnn.utils"]
    _mod("mmcv").cnn = mmcv_cnn

    runner = _mod("mmcv.runner")
    runner.BaseModule = BaseModule
    runner.ModuleList = nn.ModuleList
    runner._load_checkpoint = lambda *a, **k: (_ for _ in ()).throw(
        NotImplementedError("shim: no checkpoints in oracle tests")
    )
    _mod("mmcv.runner.base_module").BaseModule = BaseModule
    runner.base_module = sys.modules["mmcv.runner.base_module"]
    _mod("mmcv").runner = runner
    mmcv_utils = _mod("mmcv.utils")
    mmcv_utils.to_2tuple = to_2tuple
    _mod("mmcv").utils = mmcv_utils

    mmdet_utils = _mod("mmdet.utils")
    import logging

    mmdet_utils.get_root_logger = lambda *a, **k: logging.getLogger("ref")
    _mod("mmdet").utils = mmdet_utils
    mmdet_builder = _mod("mmdet.models.builder")
    mmdet_builder.BACKBONES = _Registry()
    _mod("mmdet.models").builder = mmdet_builder
    _mod("mmdet").models = sys.modules["mmdet.models"]

    m3d = _mod("mmdet3d")
    m3d_models = _mod("mmdet3d.models")
    m3d_fusion = _mod("mmdet3d.models.fusion_layers")
    m3d_fusion.apply_3d_transformation = _identity_3d_transformation
    m3d_core = _mod("mmdet3d.core")
    m3d_core.LiDARInstance3DBoxes = object
    m3d.models = m3d_models
    m3d.core = m3d_core
    m3d_models.fusion_layers = m3d_fusion

    d2 = _mod("detectron2")
    d2_mod = _mod("detectron2.modeling")
    d2_pool = _mod("detectron2.modeling.poolers")
    class _AnyArgs:
        def __init__(self, *a, **k):
            pass

    d2_pool.ROIPooler = _AnyArgs
    d2_struct = _mod("detectron2.structures")
    d2_struct.Boxes = _AnyArgs
    d2.modeling = d2_mod
    d2_mod.poolers = d2_pool
    d2.structures = d2_struct

    mmdet_bbox = _mod("mmdet.core.bbox")
    mmdet_bbox.BaseBBoxCoder = object
    builder = _mod("mmdet.core.bbox.builder")
    builder.BBOX_CODERS = _Registry()
    _mod("mmdet.core").bbox = mmdet_bbox
    mmdet_bbox.builder = builder
    _mod("mmdet").core = sys.modules["mmdet.core"]


def load_reference(relpath: str, name: str):
    """Import a reference source file as a module (shims must be installed)."""
    install()
    spec = importlib.util.spec_from_file_location(name, f"{REF}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference_encoder_utils():
    """Load the reference encoder_utils.py with its relative imports
    satisfied: ``.ip_basic.depth_map_utils`` is the REAL reference cv2
    implementation; ``.ops.locatt_ops`` is the unfold-based CPU oracle for
    the CUDA image-local-attention kernels (semantics documented at
    models/utils/ops/locatt_ops)."""
    install()
    pkgname = "ref_encpkg"
    if pkgname + ".encoder_utils" in sys.modules:
        return sys.modules[pkgname + ".encoder_utils"]
    pkg = _mod(pkgname)
    pkg.__path__ = [f"{REF}/models/utils"]

    ip = _mod(pkgname + ".ip_basic")
    ip.__path__ = [f"{REF}/models/utils/ip_basic"]
    pkg.ip_basic = ip
    spec = importlib.util.spec_from_file_location(
        pkgname + ".ip_basic.depth_map_utils",
        f"{REF}/models/utils/ip_basic/depth_map_utils.py",
    )
    dmu = importlib.util.module_from_spec(spec)
    # legacy alias used by the old reference code
    import numpy as np

    if not hasattr(np, "float"):
        np.float = float
    sys.modules[spec.name] = dmu
    spec.loader.exec_module(dmu)
    ip.depth_map_utils = dmu

    ops = _mod(pkgname + ".ops")
    la = types.ModuleType(pkgname + ".ops.locatt_ops")
    la.localattention = types.SimpleNamespace(
        similar_forward=_unfold_similar_forward,
        weighting_forward=_unfold_weighting_forward,
    )
    sys.modules[la.__name__] = la
    ops.locatt_ops = la
    pkg.ops = ops

    spec = importlib.util.spec_from_file_location(
        pkgname + ".encoder_utils", f"{REF}/models/utils/encoder_utils.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


def _alias_plugin_encoder_utils():
    """Make ``projects.mmdet3d_plugin.models.utils.encoder_utils`` resolve
    to the shimmed reference encoder_utils (necks import it absolutely)."""
    eu = load_reference_encoder_utils()
    parts = [
        "projects",
        "projects.mmdet3d_plugin",
        "projects.mmdet3d_plugin.models",
        "projects.mmdet3d_plugin.models.utils",
    ]
    for i, part in enumerate(parts):
        m = _mod(part)
        m.__path__ = []
        if i:
            setattr(sys.modules[parts[i - 1]], part.rsplit(".", 1)[1], m)
    sys.modules["projects.mmdet3d_plugin.models.utils"].encoder_utils = eu
    sys.modules["projects.mmdet3d_plugin.models.utils.encoder_utils"] = eu


def load_reference_encoder_v1():
    """Load the reference deepinteraction_encoder.py (the v1 MMRI neck,
    models/necks/deepinteraction_encoder.py) so a full composed
    DeepInteractionEncoderLayer runs as an oracle — its blocks (MMRI_I2P,
    LocalContextAttentionBlock via the unfold shim, BEVWarp + real cv2
    depth fill, ConvBNReLU) are the reference's own encoder_utils code."""
    install()
    name = "ref_enc_v1"
    if name in sys.modules:
        return sys.modules[name]
    m3d_builder = _mod("mmdet3d.models.builder")
    if not hasattr(m3d_builder, "NECKS"):
        m3d_builder.NECKS = _Registry()
    sys.modules["mmdet3d.models"].builder = m3d_builder
    _alias_plugin_encoder_utils()
    spec = importlib.util.spec_from_file_location(
        name, f"{REF}/models/necks/deepinteraction_encoder.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference_fusion_v4():
    """Load the reference fusion_transformerv4.py (the ++ neck,
    models/necks/fusion_transformerv4.py) for oracle tests of its pure-torch
    blocks (MMRI_I2P_Polar, TransSinePositionalEncoding).

    flash_attn does not exist here and ``FlashAttention.forward`` asserts
    CUDA + fp16 inputs, so after loading it is REPLACED with an exact fp32
    softmax attention — the same math flash attention computes, minus the
    fp16 rounding (which the golden comparison should not depend on anyway).
    Everything else (packed in-projections, decoder layers, ray geometry,
    grid_sample splat-back) runs the reference's own torch code.
    BaseTransformerLayer and MultiScaleDeformableAttention are FAITHFUL
    shims (RefBaseTransformerLayer / TorchMSDA above), so a full composed
    DeepInteractionLayer runs as an oracle too.
    """
    install()
    name = "ref_fusionv4"
    if name in sys.modules:
        return sys.modules[name]

    reg = _mod("mmcv.cnn.bricks.registry")
    reg.TRANSFORMER_LAYER = TRANSFORMER_LAYER
    reg.ATTENTION = ATTENTION
    sys.modules["mmcv.cnn.bricks"].registry = reg
    bt = sys.modules["mmcv.cnn.bricks.transformer"]

    class _Inert(nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

    bt.BaseTransformerLayer = RefBaseTransformerLayer
    bt.MultiScaleDeformableAttention = TorchMSDA
    bt.build_transformer_layer = lambda *a, **k: _Inert()

    runner = sys.modules["mmcv.runner"]
    runner.auto_fp16 = lambda *a, **k: (lambda fn: fn)

    m3d_builder = _mod("mmdet3d.models.builder")
    m3d_builder.NECKS = _Registry()
    sys.modules["mmdet3d.models"].builder = m3d_builder

    fa = _mod("flash_attn")
    fai = _mod("flash_attn.flash_attn_interface")
    fai.flash_attn_unpadded_kvpacked_func = None  # forward is replaced below
    fa.flash_attn_interface = fai
    fbp = _mod("flash_attn.bert_padding")
    fbp.unpad_input = None
    fbp.pad_input = None
    fbp.index_first_axis = None
    fa.bert_padding = fbp

    _alias_plugin_encoder_utils()

    spec = importlib.util.spec_from_file_location(
        name, f"{REF}/models/necks/fusion_transformerv4.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)

    import math

    def _exact_flash_forward(self, q, kv, causal=False, key_padding_mask=None):
        # q [B, Sq, H, D]; kv [B, Sk, 2, H, D] (batched: no padding mask in
        # the polar path). Exact softmax attention == flash attention math.
        assert not causal and key_padding_mask is None
        k, v = kv[:, :, 0], kv[:, :, 1]
        scale = self.softmax_scale or 1.0 / math.sqrt(q.shape[-1])
        att = torch.einsum("bqhd,bkhd->bhqk", q, k) * scale
        att = att.softmax(dim=-1)
        return torch.einsum("bhqk,bkhd->bqhd", att, v), None

    mod.FlashAttention.forward = _exact_flash_forward
    # torch>=2.0 TransformerDecoderLayer reads .batch_first off the attention
    # module for a fast-path check; the reference's wrapper asserts
    # batch_first in __init__ but never stores it.
    mod.FlashMultiheadAttention.batch_first = True
    # ... and passes is_causal=, which the reference's signature predates.
    _fmha_fwd = mod.FlashMultiheadAttention.forward

    def _fmha_forward(self, q, k, v, is_causal=False, **kw):
        assert not is_causal
        return _fmha_fwd(self, q, k, v, **kw)

    mod.FlashMultiheadAttention.forward = _fmha_forward
    return mod


def load_reference_swin():
    """Load the reference swin.py with ``.swin_utils`` stubbed (only needed
    for the full backbone's patch embed / converter, not SwinBlock)."""
    install()
    pkgname = "ref_swinpkg"
    if pkgname + ".swin" in sys.modules:
        return sys.modules[pkgname + ".swin"]
    pkg = _mod(pkgname)
    pkg.__path__ = [f"{REF}/models/backbones"]
    su = types.ModuleType(pkgname + ".swin_utils")
    su.swin_converter = None
    su.PatchEmbed = object
    su.PatchMerging = object
    sys.modules[su.__name__] = su
    pkg.swin_utils = su
    spec = importlib.util.spec_from_file_location(
        pkgname + ".swin", f"{REF}/models/backbones/swin.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference_swin_full():
    """Load the reference swin.py with its REAL swin_utils (PatchEmbed /
    PatchMerging / AdaptivePadding), so the FULL ``SwinTransformer`` runs as
    a trunk oracle (tools/verify_ckpt.py stage 2, VERDICT r4 #8). A few more
    mmcv names than install() provides are stubbed first — only what the
    swin_utils module-level imports touch; PatchEmbed/PatchMerging execute
    pure torch."""
    install()
    pkgname = "ref_swinfullpkg"
    if pkgname + ".swin" in sys.modules:
        return sys.modules[pkgname + ".swin"]

    mmcv_cnn = sys.modules["mmcv.cnn"]
    if not hasattr(mmcv_cnn, "build_activation_layer"):
        mmcv_cnn.build_activation_layer = lambda cfg: {
            "ReLU": nn.ReLU,
            "GELU": nn.GELU,
        }[(cfg or {"type": "GELU"}).get("type", "GELU")]()
    if not hasattr(mmcv_cnn, "xavier_init"):
        mmcv_cnn.xavier_init = lambda *a, **k: None
    reg = _mod("mmcv.cnn.bricks.registry")
    if not hasattr(reg, "TRANSFORMER_LAYER_SEQUENCE"):
        reg.TRANSFORMER_LAYER_SEQUENCE = _Registry()
    if not hasattr(reg, "TRANSFORMER_LAYER"):
        reg.TRANSFORMER_LAYER = TRANSFORMER_LAYER
    bt = sys.modules["mmcv.cnn.bricks.transformer"]
    for name, val in (
        ("BaseTransformerLayer", RefBaseTransformerLayer),
        ("TransformerLayerSequence", nn.Module),
        ("build_transformer_layer_sequence", lambda *a, **k: None),
    ):
        if not hasattr(bt, name):
            setattr(bt, name, val)
    mmdet_ub = _mod("mmdet.models.utils.builder")
    if not hasattr(mmdet_ub, "TRANSFORMER"):
        mmdet_ub.TRANSFORMER = _Registry()
    _mod("mmdet.models.utils").builder = mmdet_ub

    pkg = _mod(pkgname)
    pkg.__path__ = [f"{REF}/models/backbones"]
    spec_u = importlib.util.spec_from_file_location(
        pkgname + ".swin_utils", f"{REF}/models/backbones/swin_utils.py"
    )
    su = importlib.util.module_from_spec(spec_u)
    sys.modules[spec_u.name] = su
    spec_u.loader.exec_module(su)
    pkg.swin_utils = su
    spec = importlib.util.spec_from_file_location(
        pkgname + ".swin", f"{REF}/models/backbones/swin.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod
