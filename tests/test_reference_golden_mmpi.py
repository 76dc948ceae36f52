"""Golden tests for the MMPI RCNN refinement blocks against the REFERENCE's
own torch modules (decoder_utils.py:632-1090): ImageRCNNBlock / PointRCNNBlock
and their ++ V2 variants, plus the converter-rule path (VERDICT r3 #4 — a
rule regression in any major block must fail a test).

The reference modules execute their own code; only the two CUDA/external
leaves are replaced with faithful stand-ins defined here:

- detectron2 ``ROIPooler``/``ROIAlignV2`` -> `_D2Pooler`, a vectorized torch
  implementation of the ROIAlign kernel spec (aligned=True half-pixel offset,
  sampling_ratio x sampling_ratio bilinear samples per bin, averaged;
  detectron2 layers/csrc/ROIAlign semantics).
- mmdet3d ``LiDARInstance3DBoxes.corners`` -> `_LidarBoxes`, the v0.17 corner
  construction (relative origin (0.5, 0.5, 0), rotation_3d_in_axis axis=2
  einsum — note the ``points @ rot_mat_T`` row-vector form rotates xy by
  MINUS yaw: the historical pre-1.0 mmdet3d clockwise-yaw convention).

Box-convention note: this repo stores boxes as (x, y, z_bottom, l, w, h,
yaw_CCW) (mmdet3d v1.0-style; data/nuscenes_converter.py:15), the reference
as (x, y, z, w, l, h, -yaw-pi/2) (v0.17). Same physical boxes, different
channels: rot (sin, cos) maps as (a, b) -> (-b, -a) and dim swaps (0, 1) —
both self-inverse. ``_to_v017`` applies the map so both frameworks see the
SAME physical boxes; feeding raw identical channels instead would compare
mirrored-footprint geometry (the BEV min/max rect of the point block is
invariant to the mirror, but the per-view image-space rect of the image
block is not). utils/torch_convert.py rewires the dim/rot prediction-head
channels with the same map so converted checkpoints decode correctly.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from ref_shims import load_reference  # noqa: E402

DU = load_reference("models/utils/decoder_utils.py", "ref_decoder_utils_mmpi")
TC = load_reference(
    "core/bbox/coders/transfusion_bbox_coder.py", "ref_transfusion_coder_mmpi"
)

from deepinteraction_tpu.configs.base import (  # noqa: E402
    BBoxCoderConfig,
    DecoderConfig,
)
from deepinteraction_tpu.models.decoder import (  # noqa: E402
    ImageRCNNBlock,
    PointRCNNBlock,
)
from deepinteraction_tpu.targets.coder import TransFusionBBoxCoder  # noqa: E402


# ---------------------------------------------------------------- leaf shims


class _Boxes:
    def __init__(self, tensor):
        self.tensor = tensor


class _D2Pooler(torch.nn.Module):
    """detectron2 ROIPooler with one ROIAlignV2 level (vectorized torch)."""

    def __init__(self, output_size, scales, sampling_ratio):
        super().__init__()
        self.p, self.scale, self.sr = output_size, scales[0], sampling_ratio

    def forward(self, feats, box_lists):
        feat = feats[0][0]  # [C, H, W] (single image per call in the blocks)
        boxes = box_lists[0].tensor
        c, hh, ww = feat.shape
        n, p, sr = boxes.shape[0], self.p, self.sr
        x0 = boxes[:, 0] * self.scale - 0.5
        y0 = boxes[:, 1] * self.scale - 0.5
        x1 = boxes[:, 2] * self.scale - 0.5
        y1 = boxes[:, 3] * self.scale - 0.5
        bw = (x1 - x0) / p
        bh = (y1 - y0) / p
        off = (torch.arange(sr, dtype=feat.dtype) + 0.5) / sr
        bins = torch.arange(p, dtype=feat.dtype)
        sx = x0[:, None, None] + (bins[None, :, None] + off[None, None, :]) * bw[:, None, None]
        sy = y0[:, None, None] + (bins[None, :, None] + off[None, None, :]) * bh[:, None, None]
        xg = sx[:, None, None, :, :].expand(n, p, sr, p, sr)
        yg = sy[:, :, :, None, None].expand(n, p, sr, p, sr)
        # bilinear_interpolate: outside (-1, size) contributes 0; clamp then
        # 4-tap with the high index folded onto size-1 at the border
        inside = (yg >= -1.0) & (yg <= hh) & (xg >= -1.0) & (xg <= ww)
        x = xg.clamp(0.0, ww - 1)
        y = yg.clamp(0.0, hh - 1)
        x0i = x.floor().long().clamp(max=ww - 1)
        y0i = y.floor().long().clamp(max=hh - 1)
        x1i = (x0i + 1).clamp(max=ww - 1)
        y1i = (y0i + 1).clamp(max=hh - 1)
        lx, ly = x - x0i, y - y0i
        hx, hy = 1.0 - lx, 1.0 - ly
        fl = feat.reshape(c, -1)
        v00 = fl[:, (y0i * ww + x0i).reshape(-1)].reshape((c,) + x.shape)
        v01 = fl[:, (y0i * ww + x1i).reshape(-1)].reshape((c,) + x.shape)
        v10 = fl[:, (y1i * ww + x0i).reshape(-1)].reshape((c,) + x.shape)
        v11 = fl[:, (y1i * ww + x1i).reshape(-1)].reshape((c,) + x.shape)
        out = v00 * (hy * hx) + v01 * (hy * lx) + v10 * (ly * hx) + v11 * (ly * lx)
        out = out * inside.to(feat.dtype)
        return out.mean(dim=(3, 5)).permute(1, 0, 2, 3)  # [N, C, p, p]


class _LidarBoxes:
    """mmdet3d v0.17 LiDARInstance3DBoxes: tensor + .corners only."""

    def __init__(self, tensor, box_dim=7):
        self.tensor = tensor
        self.box_dim = box_dim

    @property
    def corners(self):
        t = self.tensor
        dims = t[:, 3:6]
        cn = torch.tensor(
            np.stack(np.unravel_index(np.arange(8), [2] * 3), axis=1),
            dtype=t.dtype,
        )
        cn = cn[[0, 1, 3, 2, 4, 5, 7, 6]] - torch.tensor([0.5, 0.5, 0.0])
        corners = dims.view(-1, 1, 3) * cn.reshape(1, 8, 3)
        angles = t[:, 6]
        rc, rs = torch.cos(angles), torch.sin(angles)
        zeros, ones = torch.zeros_like(rc), torch.ones_like(rc)
        rot_t = torch.stack(
            [
                torch.stack([rc, -rs, zeros]),
                torch.stack([rs, rc, zeros]),
                torch.stack([zeros, zeros, ones]),
            ]
        )  # [3, 3, N]
        corners = torch.einsum("aij,jka->aik", corners, rot_t)
        return corners + t[:, :3].view(-1, 1, 3)


DU.Boxes = _Boxes
DU.LiDARInstance3DBoxes = _LidarBoxes


# ------------------------------------------------------------------ fixtures

C, HEADS, P, V = 128, 8, 16, 2  # DynamicConv hard-codes hidden 128 (ref L589)
FH, FW = 12, 16  # image feature map
OSF_IMG = 4
IH, IW = FH * OSF_IMG, FW * OSF_IMG
TEST_CFG = dict(out_size_factor=8, voxel_size=[0.075, 0.075], pc_range=[-54.0])
BEV_H = BEV_W = 24
# point-block coder: 24-cell BEV grid so corner rects land on the map
PTS_CODER = dict(pc_range=(-7.2, -7.2), voxel_size=(0.075, 0.075), out_size_factor=8)


def _t2n(t):
    return np.asarray(t.detach().numpy())


def _dense(linear):
    return {"kernel": _t2n(linear.weight).T, "bias": _t2n(linear.bias)}


def _ln(ln):
    return {"scale": _t2n(ln.weight), "bias": _t2n(ln.bias)}


def _mha_params(mha):
    c = mha.embed_dim
    w = _t2n(mha.in_proj_weight)
    b = _t2n(mha.in_proj_bias)
    return {
        "q_proj": {"kernel": w[:c].T, "bias": b[:c]},
        "k_proj": {"kernel": w[c : 2 * c].T, "bias": b[c : 2 * c]},
        "v_proj": {"kernel": w[2 * c :].T, "bias": b[2 * c :]},
        "out_proj": _dense(mha.out_proj),
    }


def _dyconv_params(dc):
    return {
        "dynamic_layer": _dense(dc.dynamic_layer),
        "out_layer": _dense(dc.out_layer),
        "norm1": _ln(dc.norm1),
        "norm2": _ln(dc.norm2),
        "norm3": _ln(dc.norm3),
    }


def _core_params_v1(ref, pts=False):
    s = "_pts" if pts else ""
    return {
        "self_attn": _mha_params(getattr(ref, f"dyconv_pre_self_attn{s}")),
        "dyconv": _dyconv_params(getattr(ref, f"dyconv{s}")),
        "norm1": _ln(getattr(ref, f"norm1{s}")),
        "norm2": _ln(getattr(ref, f"norm2{s}")),
        "norm3": _ln(getattr(ref, f"norm3{s}")),
        "linear1": _dense(getattr(ref, f"linear1{s}")),
        "linear2": _dense(getattr(ref, f"linear2{s}")),
    }


def _core_params_v2(ref, pts=False):
    s = "_pts" if pts else ""
    return {
        "self_attn": _mha_params(getattr(ref, f"dyconv_pre_self_attn{s}")),
        "dyconv": _dyconv_params(getattr(ref, f"dyconv{s}")),
        "norm1": _ln(getattr(ref, f"norm1{s}")),
        "norm2": _ln(getattr(ref, f"norm2{s}")),
        "norm3": _ln(getattr(ref, f"norm3{s}")),
        "self_norm": _ln(getattr(ref, f"self_norm{s}")),
        "ffn_fc0": _dense(ref.ffn.layers[0]),
        "ffn_fc1": _dense(ref.ffn.layers[3]),
        "self_ffn_fc0": _dense(ref.self_ffn.layers[0]),
        "self_ffn_fc1": _dense(ref.self_ffn.layers[3]),
        "scale": _t2n(ref.scale),
        "self_scale": _t2n(ref.self_scale),
    }


def _randomize(mod, rng, scale=0.05):
    with torch.no_grad():
        for p_ in mod.parameters():
            p_.data = torch.tensor(
                rng.normal(scale=scale, size=tuple(p_.shape)).astype(np.float32)
            )


def _ref_coder(pc_range=(-54.0, -54.0)):
    return TC.TransFusionBBoxCoder(
        pc_range=list(pc_range),
        out_size_factor=8,
        voxel_size=[0.075, 0.075],
        post_center_range=[-61.2, -61.2, -10.0, 61.2, 61.2, 10.0],
        score_threshold=None,
        code_size=10,
    )


def _res_layer(rng, b, grid_extent):
    """Channels-FIRST torch res_layer dict; grid-unit centers."""
    return {
        "center": rng.uniform(*grid_extent, (b, 2, P)).astype(np.float32),
        "height": rng.uniform(-2.0, 1.0, (b, 1, P)).astype(np.float32),
        "dim": rng.normal(scale=0.3, size=(b, 3, P)).astype(np.float32),
        "rot": rng.normal(size=(b, 2, P)).astype(np.float32),
        "vel": rng.normal(size=(b, 2, P)).astype(np.float32),
        "heatmap": rng.normal(size=(b, 10, P)).astype(np.float32),
    }


def _cams(v=V):
    """Pinhole cameras looking outward (same construction as the polar
    golden test)."""
    base = np.array([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]]).T
    cam2lidar = []
    for i in range(v):
        ang = 2.0 * np.pi * i / max(v, 1) + 0.3
        rz = np.array(
            [
                [np.cos(ang), -np.sin(ang), 0.0],
                [np.sin(ang), np.cos(ang), 0.0],
                [0.0, 0.0, 1.0],
            ]
        )
        m = np.eye(4)
        m[:3, :3] = rz @ base
        m[:3, 3] = [0.4 * np.cos(ang), 0.4 * np.sin(ang), 1.5]
        cam2lidar.append(m)
    cam2lidar = np.stack(cam2lidar)
    k4 = np.tile(np.eye(4), (v, 1, 1))
    k4[:, :3, :3] = np.array(
        [[50.0, 0.0, IW / 2], [0.0, 50.0, IH / 2], [0.0, 0.0, 1.0]]
    )
    return (k4 @ np.linalg.inv(cam2lidar)).astype(np.float32)


def _jax_res_layer(res):
    return {k: jnp.asarray(v.transpose(0, 2, 1)) for k, v in res.items()}


def _to_v017(res):
    """Map channels-first res_layer from this repo's (l, w, h, yaw_CCW) box
    convention to the reference's v0.17 (w, l, h, -yaw-pi/2): rot (a, b) ->
    (-b, -a), dim channels (0, 1) swapped. Self-inverse."""
    out = dict(res)
    out["rot"] = np.stack([-res["rot"][:, 1], -res["rot"][:, 0]], 1)
    out["dim"] = res["dim"][:, [1, 0, 2]]
    return out


def _decoder_cfg(variant):
    return DecoderConfig(
        variant=variant,
        num_views=V,
        out_size_factor_img=OSF_IMG,
        num_proposals=P,
        hidden_channel=C,
        num_heads=HEADS,
        dropout=0.0,
    )


def _run_image_block(variant, seed):
    rng = np.random.default_rng(seed)
    coder_t = _ref_coder()
    cls = DU.ImageRCNNBlock if variant == "v1" else DU.ImageRCNNBlockV2
    ref = cls(
        num_views=V,
        num_proposals=P,
        out_size_factor_img=OSF_IMG,
        test_cfg=TEST_CFG,
        bbox_coder=coder_t,
        hidden_channel=C,
        num_heads=HEADS,
        dropout=0.0,
    ).eval()
    _randomize(ref, rng)
    ref.pooler = _D2Pooler(7, [1.0 / OSF_IMG], 2)

    res = _res_layer(rng, 1, (40.0, 140.0))
    query_feat = rng.normal(size=(1, C, P)).astype(np.float32)
    img_feat = rng.normal(size=(1, V, C, FH * FW)).astype(np.float32)
    lidar2img = _cams()
    img_metas = [
        {"lidar2img": lidar2img, "input_shape": (IH, IW), "img_shape": [(IH, IW, 3)]}
    ]
    with torch.no_grad():
        golden, golden_mask = ref(
            torch.tensor(query_feat),
            {k: torch.tensor(v) for k, v in _to_v017(res).items()},
            None,
            torch.tensor(img_feat),
            img_metas,
            FH,
            FW,
        )
    golden, golden_mask = _t2n(golden), _t2n(golden_mask)
    assert (golden_mask >= 0).sum() >= 4, "fixture: too few on-image queries"
    assert (golden_mask == -1).any(), "fixture: want some off-image queries"

    cfg = _decoder_cfg("v1" if variant == "v1" else "pp")
    mine = ImageRCNNBlock(cfg, TransFusionBBoxCoder(BBoxCoderConfig()), (IH, IW))
    core = _core_params_v1(ref) if variant == "v1" else _core_params_v2(ref)
    eye = np.eye(4, dtype=np.float32)[None]
    out, eff = mine.apply(
        {"params": {"core": core}},
        jnp.asarray(query_feat.transpose(0, 2, 1)),
        _jax_res_layer(res),
        jnp.asarray(img_feat.reshape(1, V, C, FH, FW).transpose(0, 1, 3, 4, 2)),
        {"lidar2img": jnp.asarray(lidar2img)[None], "lidar_aug_inv": jnp.asarray(eye)},
        False,
    )
    np.testing.assert_array_equal(np.asarray(eff), golden_mask.astype(np.int32))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 2, 1), golden, rtol=2e-4, atol=2e-4
    )


def _run_point_block(variant, seed):
    rng = np.random.default_rng(seed)
    coder_t = _ref_coder(PTS_CODER["pc_range"])
    cls = DU.PointRCNNBlock if variant == "v1" else DU.PointRCNNBlockV2
    ref = cls(
        hidden_channel=C, num_heads=HEADS, dropout=0.0, bbox_coder=coder_t
    ).eval()
    _randomize(ref, rng)
    ref.pooler_pts = _D2Pooler(7, [1.0], 2)

    b = 2
    res = _res_layer(rng, b, (6.0, 18.0))
    res["dim"] = rng.normal(scale=0.2, size=(b, 3, P)).astype(np.float32) - 1.0
    query_feat = rng.normal(size=(b, C, P)).astype(np.float32)
    bev = rng.normal(size=(b, C, BEV_H, BEV_W)).astype(np.float32)
    with torch.no_grad():
        golden, _ = ref(
            torch.tensor(query_feat),
            {k: torch.tensor(v) for k, v in _to_v017(res).items()},
            torch.tensor(bev),
            None,
            None,
            None,
            None,
        )
    golden = _t2n(golden)

    cfg = _decoder_cfg("v1" if variant == "v1" else "pp")
    coder_j = TransFusionBBoxCoder(BBoxCoderConfig(pc_range=PTS_CODER["pc_range"]))
    mine = PointRCNNBlock(cfg, coder_j)
    core = (
        _core_params_v1(ref, pts=True)
        if variant == "v1"
        else _core_params_v2(ref, pts=True)
    )
    out, _ = mine.apply(
        {"params": {"core": core}},
        jnp.asarray(query_feat.transpose(0, 2, 1)),
        _jax_res_layer(res),
        jnp.asarray(bev.transpose(0, 2, 3, 1)),
        False,
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 2, 1), golden, rtol=2e-4, atol=2e-4
    )


def test_image_rcnn_block_golden():
    _run_image_block("v1", seed=13)


def test_image_rcnn_block_v2_golden():
    _run_image_block("v2", seed=12)


def test_point_rcnn_block_golden():
    _run_point_block("v1", seed=13)


def test_point_rcnn_block_v2_golden():
    _run_point_block("v2", seed=14)


def test_point_rcnn_v2_converter_rules_match_golden():
    """The torch_convert RULES reproduce the hand-built V2 mapping: convert
    the reference module's state_dict under its real checkpoint prefix
    (pts_bbox_head.decode_head.1.*) and run our block with the result."""
    from deepinteraction_tpu.utils.torch_convert import convert_state_dict

    rng = np.random.default_rng(15)
    coder_t = _ref_coder(PTS_CODER["pc_range"])
    ref = DU.PointRCNNBlockV2(
        hidden_channel=C, num_heads=HEADS, dropout=0.0, bbox_coder=coder_t
    ).eval()
    _randomize(ref, rng)
    ref.pooler_pts = _D2Pooler(7, [1.0], 2)

    res = _res_layer(rng, 1, (6.0, 18.0))
    query_feat = rng.normal(size=(1, C, P)).astype(np.float32)
    bev = rng.normal(size=(1, C, BEV_H, BEV_W)).astype(np.float32)
    with torch.no_grad():
        golden, _ = ref(
            torch.tensor(query_feat),
            {k: torch.tensor(v) for k, v in _to_v017(res).items()},
            torch.tensor(bev),
            None,
            None,
            None,
            None,
        )
    golden = _t2n(golden)

    sd = {
        f"pts_bbox_head.decode_head.1.{k}": v.numpy()
        for k, v in ref.state_dict().items()
    }
    flat, unmatched = convert_state_dict(sd)
    assert not unmatched, unmatched
    prefix = "params:pts_bbox_head/mmpi1_pts/core/"
    core = {}
    for k, v in flat.items():
        assert k.startswith(prefix), k
        node = core
        parts = k[len(prefix) :].split("/")
        for q in parts[:-1]:
            node = node.setdefault(q, {})
        node[parts[-1]] = v

    cfg = _decoder_cfg("pp")
    coder_j = TransFusionBBoxCoder(BBoxCoderConfig(pc_range=PTS_CODER["pc_range"]))
    out, _ = PointRCNNBlock(cfg, coder_j).apply(
        {"params": {"core": core}},
        jnp.asarray(query_feat.transpose(0, 2, 1)),
        _jax_res_layer(res),
        jnp.asarray(bev.transpose(0, 2, 3, 1)),
        False,
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 2, 1), golden, rtol=2e-4, atol=2e-4
    )


def test_image_rcnn_converter_rules_match_golden():
    """Same through-the-rules check for the v1 image block
    (pts_bbox_head.decode_head.0.*)."""
    from deepinteraction_tpu.utils.torch_convert import convert_state_dict

    rng = np.random.default_rng(17)
    coder_t = _ref_coder()
    ref = DU.ImageRCNNBlock(
        num_views=V,
        num_proposals=P,
        out_size_factor_img=OSF_IMG,
        test_cfg=TEST_CFG,
        bbox_coder=coder_t,
        hidden_channel=C,
        num_heads=HEADS,
        dropout=0.0,
    ).eval()
    _randomize(ref, rng)
    ref.pooler = _D2Pooler(7, [1.0 / OSF_IMG], 2)

    res = _res_layer(rng, 1, (40.0, 140.0))
    query_feat = rng.normal(size=(1, C, P)).astype(np.float32)
    img_feat = rng.normal(size=(1, V, C, FH * FW)).astype(np.float32)
    lidar2img = _cams()
    img_metas = [
        {"lidar2img": lidar2img, "input_shape": (IH, IW), "img_shape": [(IH, IW, 3)]}
    ]
    with torch.no_grad():
        golden, golden_mask = ref(
            torch.tensor(query_feat),
            {k: torch.tensor(v) for k, v in _to_v017(res).items()},
            None,
            torch.tensor(img_feat),
            img_metas,
            FH,
            FW,
        )
    golden, golden_mask = _t2n(golden), _t2n(golden_mask)
    assert (golden_mask >= 0).sum() >= 4, "fixture: too few on-image queries"
    assert (golden_mask == -1).any(), "fixture: want some off-image queries"

    sd = {
        f"pts_bbox_head.decode_head.0.{k}": v.numpy()
        for k, v in ref.state_dict().items()
    }
    flat, unmatched = convert_state_dict(sd)
    assert not unmatched, unmatched
    prefix = "params:pts_bbox_head/mmpi0_img/core/"
    core = {}
    for k, v in flat.items():
        assert k.startswith(prefix), k
        node = core
        parts = k[len(prefix) :].split("/")
        for q in parts[:-1]:
            node = node.setdefault(q, {})
        node[parts[-1]] = v

    cfg = _decoder_cfg("v1")
    eye = np.eye(4, dtype=np.float32)[None]
    out, eff = ImageRCNNBlock(
        cfg, TransFusionBBoxCoder(BBoxCoderConfig()), (IH, IW)
    ).apply(
        {"params": {"core": core}},
        jnp.asarray(query_feat.transpose(0, 2, 1)),
        _jax_res_layer(res),
        jnp.asarray(img_feat.reshape(1, V, C, FH, FW).transpose(0, 1, 3, 4, 2)),
        {"lidar2img": jnp.asarray(lidar2img)[None], "lidar_aug_inv": jnp.asarray(eye)},
        False,
    )
    np.testing.assert_array_equal(np.asarray(eff), golden_mask.astype(np.int32))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 2, 1), golden, rtol=2e-4, atol=2e-4
    )


def test_pred_head_convention_rewire_golden():
    """Through-the-rules check for the dim/rot box-convention rewiring
    (utils/torch_convert.py::_rewire_box_convention): convert the reference's
    prediction FFN (decoder_utils.py:498-581) under its checkpoint prefix,
    run both heads on the same features, and assert the two frameworks decode
    the SAME PHYSICAL boxes (identical 8-corner sets), even though the raw
    dim/rot channels differ by the v0.17 <-> v1.0-style convention map."""
    from deepinteraction_tpu.utils.boxes import corners as box_corners
    from deepinteraction_tpu.utils.torch_convert import convert_state_dict

    rng = np.random.default_rng(21)
    heads = dict(
        center=(2, 2), height=(1, 2), dim=(3, 2), rot=(2, 2), vel=(2, 2),
        heatmap=(10, 2),
    )
    ref = DU.FFN(C, heads, head_conv=64).eval()
    _randomize(ref, rng, scale=0.2)

    x = rng.normal(size=(1, C, P)).astype(np.float32)
    with torch.no_grad():
        res_ref = {k: _t2n(v) for k, v in ref(torch.tensor(x)).items()}

    sd = {f"pts_bbox_head.prediction_heads.0.{k}": v.numpy()
          for k, v in ref.state_dict().items()}
    flat, unmatched = convert_state_dict(sd)
    assert not unmatched, unmatched
    inner_prefix = "pts_bbox_head/pred0/"
    variables = {}
    for k, v in flat.items():
        coll, path = k.split(":", 1)
        assert path.startswith(inner_prefix), k
        node = variables.setdefault(coll, {})
        parts = path[len(inner_prefix):].split("/")
        for q in parts[:-1]:
            node = node.setdefault(q, {})
        node[parts[-1]] = v

    from deepinteraction_tpu.models.decoder import PredictionFFN

    # ConvModule(bias='auto') has no conv bias before BN; our Dense keeps a
    # zero bias (load_into_tree leaves it at init for real checkpoints)
    for head in heads:
        variables["params"][head]["fc0"].setdefault(
            "bias", np.zeros(64, np.float32)
        )

    spec = tuple((k, v) for k, v in heads.items())
    mine = PredictionFFN(spec, head_conv=64)
    res_j = mine.apply(variables, jnp.asarray(x.transpose(0, 2, 1)))

    # untouched heads come through the rules bit-compatibly
    for k in ("center", "height", "vel", "heatmap"):
        np.testing.assert_allclose(
            np.asarray(res_j[k]).transpose(0, 2, 1), res_ref[k],
            rtol=1e-5, atol=1e-5,
        )
    # dim/rot are REWIRED: raw channels related by the self-inverse map
    np.testing.assert_allclose(
        np.asarray(res_j["dim"]).transpose(0, 2, 1), res_ref["dim"][:, [1, 0, 2]],
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(res_j["rot"]).transpose(0, 2, 1),
        np.stack([-res_ref["rot"][:, 1], -res_ref["rot"][:, 0]], 1),
        rtol=1e-5, atol=1e-5,
    )

    # ...and the decoded PHYSICAL geometry is identical: same 8-corner sets
    res_j = dict(res_j)
    res_j["center"] = res_j["center"] + 40.0  # keep boxes on-range
    dec = TransFusionBBoxCoder(BBoxCoderConfig()).decode(res_j)
    mine_corners = np.asarray(box_corners(dec.boxes[..., :7]))[0]  # [P, 8, 3]

    coder_t = _ref_coder()
    with torch.no_grad():
        pred = coder_t.decode(
            torch.tensor(res_ref["heatmap"]), torch.tensor(res_ref["rot"]),
            torch.tensor(res_ref["dim"]), torch.tensor(res_ref["center"] + 40.0),
            torch.tensor(res_ref["height"]), torch.tensor(res_ref["vel"]),
        )
    ref_boxes = pred[0]["bboxes"][:, :7]
    ref_corners = _LidarBoxes(ref_boxes).corners.numpy()  # [P, 8, 3]

    def sort_set(c):  # canonical order for set comparison
        idx = np.lexsort((c[..., 2], c[..., 1], c[..., 0]))
        return np.take_along_axis(c, idx[..., None], axis=-2)

    np.testing.assert_allclose(
        sort_set(mine_corners), sort_set(ref_corners), rtol=1e-4, atol=1e-4
    )
