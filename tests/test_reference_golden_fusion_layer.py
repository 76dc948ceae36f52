"""Composed-layer golden tests: one full reference ``DeepInteractionLayer``
(fusion_transformerv4.py:142-218) per branch — the img layer (MSDA self-attn
+ MMRI_P2I cross-attn + dual-branch FFN combine) and the pts layer (MSDA +
MMRI_I2P_Polar + MMRI_I2P) — run as torch oracles with the exact attn_cfgs /
operation_order of Fusion_0075_plusplus.py:218-271, against this repo's
FusionLayerImg / FusionLayerPts with the weights converted through the REAL
torch_convert rules (VERDICT r3 next-round #4).

The reference layer builds from RefBaseTransformerLayer + TorchMSDA
(ref_shims: faithful mmcv BaseTransformerLayer init semantics + the
documented grid_sample MSDA fallback); MMRI_P2I / MMRI_I2P / MMRI_I2P_Polar
are the reference's own torch modules. Known deviations are avoided by
construction, as in the single-block goldens: BEVWarp points are filtered
to unique (view, pixel) cells (torch last-write vs our closest-depth),
I2P runs without group_attn (our fixed-K masked attention equals plain
masked MHA when max_keys covers every key), and conftest pins the parity
sampling modes (DI_I2P_SAMPLE=bilinear, DI_MSDA_*_POINTS=0).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ref_shims import (  # noqa: E402
    load_reference_encoder_v1,
    load_reference_fusion_v4,
)
from test_reference_golden_polar import _cams  # noqa: E402

V4 = load_reference_fusion_v4()

from deepinteraction_tpu.configs.base import MMRIEncoderConfig  # noqa: E402
from deepinteraction_tpu.models.fusion_transformer import (  # noqa: E402
    FusionLayerImg,
    FusionLayerPts,
)
from deepinteraction_tpu.models.mmri_encoder import MMRIEncoderLayer  # noqa: E402
from deepinteraction_tpu.utils.torch_convert import (  # noqa: E402
    convert_state_dict,
    load_into_tree,
)

C = 64  # polar's flash-attn wrapper asserts head_dim (C/8) % 8 == 0
V = 2
H0, W0 = 12, 16  # img level 0 (input_shape = 4x: matches _cams intrinsics)
H1, W1 = 6, 8
HB, WB = 12, 12  # BEV level 0
HB1, WB1 = 6, 6
IH, IW = 4 * H0, 4 * W0
PC_RANGE = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
NP_PILLAR = 5  # points per pillar


def _cfg():
    return MMRIEncoderConfig(
        variant="pp",
        hidden_channel=C,
        num_heads=8,
        num_levels=2,
        deform_num_points=4,
        dropout=0.0,
        i2p_max_keys=NP_PILLAR * V,
        use_polar_i2p=True,
    )


def _randomize(ref, rng, scale=0.05):
    with torch.no_grad():
        for p in ref.parameters():
            p.data = torch.tensor(
                rng.normal(scale=scale, size=tuple(p.shape)).astype(np.float32)
            )
        for n, b in ref.named_buffers():
            if "running_mean" in n:
                b.data = torch.tensor(
                    rng.normal(size=tuple(b.shape)).astype(np.float32)
                )
            elif "running_var" in n:
                b.data = torch.tensor(
                    rng.uniform(0.5, 2.0, tuple(b.shape)).astype(np.float32)
                )


def _ref_points_torch(h, w, levels):
    ys = (np.arange(h) + 0.5) / h
    xs = (np.arange(w) + 0.5) / w
    gx, gy = np.meshgrid(xs, ys)
    ref = np.stack([gx.reshape(-1), gy.reshape(-1)], -1).astype(np.float32)
    return np.broadcast_to(ref[None, :, None, :], (1, h * w, levels, 2)).copy()


def _unique_cell_points(rng, l2i, n=140):
    """Random lidar points whose (view, level-0 pixel) cells are unique, so
    the reference's last-write depth scatter and our closest-depth scatter
    resolve identically (same filter as test_bevwarp_golden)."""
    pts = np.empty((n, 3), np.float32)
    pts[:, 0] = rng.uniform(-30, 30, n)
    pts[:, 1] = rng.uniform(-30, 30, n)
    pts[:, 2] = rng.uniform(-3, 1, n)
    cells = {}
    keep = np.ones(n, bool)
    for i in range(n):
        hom = np.append(pts[i], 1.0)
        for view in range(V):
            cam = l2i[view] @ hom
            if cam[2] <= 1e-5:
                continue
            x, y = cam[0] / cam[2], cam[1] / cam[2]
            gx, gy = (x / IW - 0.5) * 2, (y / IH - 0.5) * 2
            if not (-1 < gx < 1 and -1 < gy < 1):
                continue
            cell = (view, int(y / IH * H0), int(x / IW * W0))
            if cell in cells:
                keep[i] = keep[cells[cell]] = False
            else:
                cells[cell] = i
    out = pts[keep]
    assert len(out) > 50
    return out


def _pillars(rng, nv=7):
    pil = np.zeros((nv, NP_PILLAR, 4), np.float32)
    pil[..., 0] = rng.uniform(-30, 30, (nv, NP_PILLAR))
    pil[..., 1] = rng.uniform(-30, 30, (nv, NP_PILLAR))
    pil[..., 2] = rng.uniform(-3, 1, (nv, NP_PILLAR))
    counts = rng.integers(1, NP_PILLAR + 1, size=nv).astype(np.int32)
    counts[3] = 0  # empty pillar: reference zeroes its output
    coords = np.zeros((nv, 4), np.int64)  # (b, z, y, x) — unique BEV cells
    flat = rng.choice(HB * WB, size=nv, replace=False)
    coords[:, 2] = flat // WB
    coords[:, 3] = flat % WB
    return pil, counts, coords


def _shared_scene(seed):
    rng = np.random.default_rng(seed)
    l2i, c2l, _ = _cams(V)
    pts = _unique_cell_points(rng, l2i)
    pil, counts, coords = _pillars(rng)
    img0 = rng.normal(size=(V, C, H0, W0)).astype(np.float32)
    img1 = rng.normal(size=(V, C, H1, W1)).astype(np.float32)
    bev0 = rng.normal(size=(1, C, HB, WB)).astype(np.float32)
    bev1 = rng.normal(size=(1, C, HB1, WB1)).astype(np.float32)
    img_metas = [
        {
            "lidar2img": l2i,
            "cam_intrinsic": _cams(V)[2],
            "cam2lidar": c2l,
            "input_shape": (IH, IW),
        }
    ]
    pts_metas = {
        "pts": [torch.tensor(pts)],
        "pillars": torch.tensor(pil),
        "pillar_coors": torch.tensor(coords),
        "pillars_num_points": torch.tensor(counts),
    }
    eye = np.eye(4, dtype=np.float32)[None]
    batch = {
        "points": jnp.asarray(pts[None]),
        "points_mask": jnp.ones((1, len(pts)), bool),
        "lidar2img": jnp.asarray(l2i[None]),
        "img2lidar": jnp.asarray(
            np.linalg.inv(l2i.astype(np.float64))[None].astype(np.float32)
        ),
        "cam2lidar": jnp.asarray(c2l[None]),
        "lidar_aug": jnp.asarray(eye),
        "lidar_aug_inv": jnp.asarray(eye),
        "pillars": jnp.asarray(pil[None]),
        "pillar_counts": jnp.asarray(counts[None]),
        "pillar_coords": jnp.asarray(coords[:, 1:].astype(np.int32)[None]),
        "pillar_valid": jnp.ones((1, len(pil)), bool),
    }
    return rng, img_metas, pts_metas, batch, (img0, img1, bev0, bev1)


def _ffn_cfg():
    return dict(
        type="FFN",
        embed_dims=C,
        feedforward_channels=4 * C,
        num_fcs=2,
        ffn_drop=0.0,
        act_cfg=dict(type="ReLU", inplace=True),
    )


def _converted_variables(mine_init_vars, ref, torch_prefix, flax_prefix):
    """state_dict -> REAL converter rules -> this repo's variables tree."""
    sd = {f"{torch_prefix}.{k}": v.numpy() for k, v in ref.state_dict().items()}
    flat, unmatched = convert_state_dict(sd)
    assert not unmatched, unmatched
    rel = {}
    for k, v in flat.items():
        coll, path = k.split(":", 1)
        assert path.startswith(flax_prefix), k
        rel[f"{coll}:{path[len(flax_prefix):]}"] = v
    new_vars, missing, shape_errors = load_into_tree(mine_init_vars, rel)
    assert not shape_errors, shape_errors
    assert not missing, missing
    return new_vars


def test_img_fusion_layer_golden():
    rng, img_metas, pts_metas, batch, (img0, img1, bev0, _) = _shared_scene(11)

    ref = V4.DeepInteractionLayer(
        attn_cfgs=[
            dict(
                type="MultiScaleDeformableAttention",
                embed_dims=C,
                num_levels=2,
                batch_first=True,
            ),
            dict(type="MMRI_P2I", embed_dims=C, batch_first=True),
        ],
        ffn_cfgs=_ffn_cfg(),
        operation_order=(
            "self_attn", "norm", "cross_attn", "norm",
            "ffn", "norm", "ffn", "norm",
        ),
    ).eval()
    _randomize(ref, rng)

    ms_query = torch.tensor(
        np.concatenate(
            [
                img0.reshape(V, C, -1).transpose(0, 2, 1),
                img1.reshape(V, C, -1).transpose(0, 2, 1),
            ],
            axis=1,
        )
    )
    shapes = torch.tensor([[H0, W0], [H1, W1]], dtype=torch.long)
    start = torch.tensor([0, H0 * W0], dtype=torch.long)
    ref_pts = torch.tensor(_ref_points_torch(H0, W0, 2))
    with torch.no_grad():
        golden = ref(
            torch.tensor(img0),
            torch.tensor(bev0),
            ms_query,
            ref_pts,
            shapes,
            start,
            img_metas,
            pts_metas,
        ).numpy()  # [V, C, H0, W0]

    cfg = _cfg()
    mine = FusionLayerImg(cfg, PC_RANGE, (IH, IW))
    img_map = jnp.asarray(img0.transpose(0, 2, 3, 1))[None]  # [1, V, H, W, C]
    pts_map = jnp.asarray(bev0.transpose(0, 2, 3, 1))
    ms_tokens = jnp.asarray(ms_query.numpy())
    refj = jnp.broadcast_to(
        jnp.asarray(_ref_points_torch(H0, W0, 2)), (V, H0 * W0, 2, 2)
    )
    args = (img_map, pts_map, ms_tokens, refj, [(H0, W0), (H1, W1)], batch, False)
    variables = mine.init(jax.random.PRNGKey(0), *args)
    variables = _converted_variables(
        variables, ref, "imgpts_neck.img_fusion_blocks.0",
        "imgpts_neck/img_layer0/",
    )
    out = mine.apply(variables, *args)  # [1, V, H, W, C]
    np.testing.assert_allclose(
        np.asarray(out)[0].transpose(0, 3, 1, 2), golden, rtol=2e-3, atol=2e-3
    )


def test_pts_fusion_layer_golden():
    rng, img_metas, pts_metas, batch, (img0, _, bev0, bev1) = _shared_scene(12)

    ref = V4.DeepInteractionLayer(
        attn_cfgs=[
            dict(
                type="MultiScaleDeformableAttention",
                embed_dims=C,
                num_levels=2,
                batch_first=True,
            ),
            dict(
                type="MMRI_I2P_Polar",
                embed_dims=C,
                dropout=0.0,
                batch_first=True,
                pc_range=list(PC_RANGE),
            ),
            # group_attn off: our fixed-K masked attention equals plain
            # masked MHA when max_keys >= P*V (documented deviation)
            dict(type="MMRI_I2P", embed_dims=C, dropout=0.0, batch_first=True),
        ],
        ffn_cfgs=_ffn_cfg(),
        operation_order=(
            "self_attn", "norm", "cross_attn", "norm", "cross_attn", "norm",
            "ffn", "norm",
        ),
    ).eval()
    # torch's TransformerEncoder fast-path indexes layers[0]; the polar
    # block's encoder has ZERO layers (only a final norm) — same patch as
    # test_reference_golden_polar.py
    import types as _types

    def _enc_forward(self, src, mask=None, src_key_padding_mask=None, **kw):
        out = src
        for mod in self.layers:
            out = mod(out, src_mask=mask)
        return self.norm(out) if self.norm is not None else out

    enc = ref.attentions[1].transformer_layers.encoder
    enc.forward = _types.MethodType(_enc_forward, enc)
    _randomize(ref, rng)

    ms_query = torch.tensor(
        np.concatenate(
            [
                bev0.reshape(1, C, -1).transpose(0, 2, 1),
                bev1.reshape(1, C, -1).transpose(0, 2, 1),
            ],
            axis=1,
        )
    )
    shapes = torch.tensor([[HB, WB], [HB1, WB1]], dtype=torch.long)
    start = torch.tensor([0, HB * WB], dtype=torch.long)
    ref_pts = torch.tensor(_ref_points_torch(HB, WB, 2))
    with torch.no_grad():
        golden = ref(
            torch.tensor(bev0),
            torch.tensor(img0),
            ms_query,
            ref_pts,
            shapes,
            start,
            img_metas,
            pts_metas,
        ).numpy()  # [1, C, HB, WB]

    cfg = _cfg()
    mine = FusionLayerPts(cfg, PC_RANGE, (IH, IW))
    pts_map = jnp.asarray(bev0.transpose(0, 2, 3, 1))
    img_map = jnp.asarray(img0.transpose(0, 2, 3, 1))[None]
    ms_tokens = jnp.asarray(ms_query.numpy())
    refj = jnp.asarray(_ref_points_torch(HB, WB, 2))
    args = (pts_map, img_map, ms_tokens, refj, [(HB, WB), (HB1, WB1)], batch, False)
    variables = mine.init(jax.random.PRNGKey(0), *args)
    variables = _converted_variables(
        variables, ref, "imgpts_neck.pts_fusion_blocks.0",
        "imgpts_neck/pts_layer0/",
    )
    out = mine.apply(variables, *args)  # [1, HB, WB, C]
    np.testing.assert_allclose(
        np.asarray(out)[0].transpose(2, 0, 1), golden[0], rtol=2e-3, atol=2e-3
    )


def test_v1_encoder_layer_golden():
    """One full composed v1 DeepInteractionEncoderLayer
    (deepinteraction_encoder.py:8-33): I2P + P_IML + P projections, P2I
    (BEVWarp + locatt) + I_IML + I projections — through the converter
    rules (checkpoint prefix imgpts_neck.fusion_blocks.N)."""
    rng, img_metas, pts_metas, batch, (img0, _, bev0, _) = _shared_scene(13)
    E1 = load_reference_encoder_v1()
    ref = E1.DeepInteractionEncoderLayer(C).eval()
    _randomize(ref, rng)

    with torch.no_grad():
        golden_img, golden_lidar = ref(
            torch.tensor(img0), torch.tensor(bev0), img_metas, pts_metas
        )  # [V, C, H0, W0], [1, C, HB, WB]

    cfg = MMRIEncoderConfig(
        variant="v1",
        hidden_channel=C,
        local_attn_kernel=9,
        i2p_max_keys=NP_PILLAR * V,
        dropout=0.0,
    )
    mine = MMRIEncoderLayer(cfg, PC_RANGE, (IH, IW))
    img_map = jnp.asarray(img0.transpose(0, 2, 3, 1))[None]
    pts_map = jnp.asarray(bev0.transpose(0, 2, 3, 1))
    args = (img_map, pts_map, batch, False)
    variables = mine.init(jax.random.PRNGKey(0), *args)
    variables = _converted_variables(
        variables, ref, "imgpts_neck.fusion_blocks.0", "imgpts_neck/layer0/"
    )
    out_img, out_lidar = mine.apply(variables, *args)
    np.testing.assert_allclose(
        np.asarray(out_img)[0].transpose(0, 3, 1, 2),
        golden_img.numpy(),
        rtol=2e-3,
        atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out_lidar)[0].transpose(2, 0, 1),
        golden_lidar.numpy()[0],
        rtol=2e-3,
        atol=2e-3,
    )
