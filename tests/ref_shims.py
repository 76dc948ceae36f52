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
                 ffn_drop=0.0, add_identity=True, **kwargs):
        super().__init__()
        layers = []
        c = embed_dims
        for _ in range(num_fcs - 1):
            layers += [nn.Linear(c, feedforward_channels), nn.ReLU(inplace=True),
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


class _Registry:
    def register_module(self, *a, **k):
        def deco(cls):
            return cls

        return deco(a[0]) if (a and isinstance(a[0], type)) else deco


def install() -> None:
    mmcv_cnn = _mod("mmcv.cnn")
    mmcv_cnn.ConvModule = ConvModule
    mmcv_cnn.build_conv_layer = build_conv_layer
    mmcv_cnn.kaiming_init = kaiming_init
    bricks = _mod("mmcv.cnn.bricks")
    bt = _mod("mmcv.cnn.bricks.transformer")
    bt.FFN = TransFFN
    bricks.transformer = bt
    _mod("mmcv").cnn = mmcv_cnn

    m3d = _mod("mmdet3d")
    m3d_models = _mod("mmdet3d.models")
    m3d_fusion = _mod("mmdet3d.models.fusion_layers")
    m3d_fusion.apply_3d_transformation = lambda *a, **k: (_ for _ in ()).throw(
        NotImplementedError("shim: not exercised by oracle tests")
    )
    m3d_core = _mod("mmdet3d.core")
    m3d_core.LiDARInstance3DBoxes = object
    m3d.models = m3d_models
    m3d.core = m3d_core
    m3d_models.fusion_layers = m3d_fusion

    d2 = _mod("detectron2")
    d2_mod = _mod("detectron2.modeling")
    d2_pool = _mod("detectron2.modeling.poolers")
    d2_pool.ROIPooler = object
    d2_struct = _mod("detectron2.structures")
    d2_struct.Boxes = object
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
