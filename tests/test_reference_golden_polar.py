"""Golden tests for the ++ polar-ray I2P block against the REFERENCE's own
torch module (fusion_transformerv4.py:488-640), extending the encoder-side
oracle coverage (VERDICT r2 #5 / ADVICE r2 #1).

The reference module runs via ref_shims.load_reference_fusion_v4: its
flash-attention core is replaced with exact fp32 softmax attention (same
math, no fp16); geometry, projections, decoder-layer structure, sine
positions, and the grid_sample splat-back are the reference's own code.
apply_3d_transformation is identity (unaugmented inputs), so lidar_aug is
the identity matrix on our side.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ref_shims import load_reference_fusion_v4  # noqa: E402

V4 = load_reference_fusion_v4()

from deepinteraction_tpu.configs.base import MMRIEncoderConfig  # noqa: E402
from deepinteraction_tpu.models.fusion_transformer import (  # noqa: E402
    PolarI2P,
    sine_pos_2d,
)


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


def _cams(v=2):
    """Plausible pinhole cameras: z-forward optical frames rotated about the
    lidar z axis, 1.5 m up, small planar offsets."""
    # optical axes: cam z -> lidar heading, cam x -> right, cam y -> down
    base = np.array([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]]).T
    cam2lidar, intr = [], []
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
        k = np.array(
            [[50.0, 0.0, 32.0], [0.0, 50.0, 24.0], [0.0, 0.0, 1.0]]
        )
        intr.append(k)
    cam2lidar = np.stack(cam2lidar).astype(np.float64)
    intr = np.stack(intr)
    k4 = np.tile(np.eye(4), (v, 1, 1))
    k4[:, :3, :3] = intr
    lidar2img = k4 @ np.linalg.inv(cam2lidar)
    return (
        lidar2img.astype(np.float32),
        cam2lidar.astype(np.float32),
        intr.astype(np.float32),
    )


def test_sine_positional_encoding_golden():
    c = 64
    ref = V4.TransSinePositionalEncoding(c // 2)
    h, w = 12, 16
    x_range = torch.arange(0.0, float(w)).unsqueeze(0)
    y_range = torch.arange(0.0, float(h)).unsqueeze(0)
    with torch.no_grad():
        golden = _t2n(ref(x_range, y_range))  # [1, C, H, W]
    mine = np.asarray(sine_pos_2d(h, w, c // 2))  # [h, w, C]
    np.testing.assert_allclose(
        mine.transpose(2, 0, 1), golden[0], rtol=1e-5, atol=1e-5
    )


def test_polar_i2p_golden():
    rng = np.random.default_rng(7)
    c, v, h, w, hb, wb = 64, 2, 12, 16, 20, 20
    ih, iw = h * 4, w * 4  # im_scale = 4 feature stride
    pc_range = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)

    ref = V4.MMRI_I2P_Polar(
        embed_dims=c, dropout=0.0, pc_range=list(pc_range)
    ).eval()
    # torch>=2.0 TransformerEncoder.forward indexes layers[0] for its
    # fast-path check and crashes on the reference's 0-encoder-layer
    # nn.Transformer; restore the plain loop+norm semantics it had on the
    # reference's torch version.
    import types as _types

    def _enc_forward(self, src, mask=None, src_key_padding_mask=None, **kw):
        out = src
        for mod in self.layers:
            out = mod(out, src_mask=mask)
        return self.norm(out) if self.norm is not None else out

    enc = ref.transformer_layers.encoder
    enc.forward = _types.MethodType(_enc_forward, enc)
    # randomize weights away from torch defaults (zeros biases etc.)
    with torch.no_grad():
        for p in ref.parameters():
            p.data = torch.tensor(
                rng.normal(scale=0.05, size=tuple(p.shape)).astype(np.float32)
            )

    lidar_feat = rng.normal(size=(1, c, hb, wb)).astype(np.float32)
    img_feat = rng.normal(size=(v, c, h, w)).astype(np.float32)
    lidar2img, cam2lidar, intr = _cams(v)
    img_metas = [
        {
            "lidar2img": lidar2img,
            "cam_intrinsic": intr,
            "cam2lidar": cam2lidar,
            "input_shape": (ih, iw),
        }
    ]
    with torch.no_grad():
        golden = _t2n(
            ref(
                torch.tensor(lidar_feat),
                torch.tensor(img_feat),
                img_metas,
                pts_metas=None,
            )
        )  # [1, C, Hb, Wb]

    layer = ref.transformer_layers.decoder.layers[0]
    params = {
        "dec_self_attn": _mha_params(layer.self_attn),
        "dec_cross_attn": _mha_params(layer.multihead_attn),
        "dec_ffn": {"fc0": _dense(layer.linear1), "fc1": _dense(layer.linear2)},
        "dec_norm1": _ln(layer.norm1),
        "dec_norm2": _ln(layer.norm2),
        "dec_norm3": _ln(layer.norm3),
        "dec_out_norm": _ln(ref.transformer_layers.decoder.norm),
        "enc_out_norm": _ln(ref.transformer_layers.encoder.norm),
    }

    cfg = MMRIEncoderConfig(
        variant="pp", hidden_channel=c, num_heads=8, dropout=0.0
    )
    mine = PolarI2P(cfg, pc_range, (ih, iw))
    eye = np.eye(4, dtype=np.float32)[None]
    batch = {
        "lidar2img": jnp.asarray(lidar2img)[None],
        "img2lidar": jnp.asarray(np.linalg.inv(lidar2img.astype(np.float64)))[
            None
        ].astype(jnp.float32),
        "cam2lidar": jnp.asarray(cam2lidar)[None],
        "lidar_aug": jnp.asarray(eye),
        "lidar_aug_inv": jnp.asarray(eye),
    }
    out = mine.apply(
        {"params": params},
        jnp.asarray(lidar_feat.transpose(0, 2, 3, 1)),  # [B, Hb, Wb, C]
        jnp.asarray(img_feat.transpose(0, 2, 3, 1))[None],  # [B, V, h, w, C]
        batch,
        False,
    )
    out = np.asarray(out).transpose(0, 3, 1, 2)  # [1, C, Hb, Wb]
    np.testing.assert_allclose(out, golden, rtol=2e-4, atol=2e-4)


def test_polar_i2p_converter_rules_match_golden():
    """The torch_convert RULES produce the same polar weight mapping the
    golden test builds by hand: converting the reference module's
    state_dict (under its real checkpoint prefix) and running our PolarI2P
    with the result reproduces the reference output."""
    from deepinteraction_tpu.utils.torch_convert import convert_state_dict

    rng = np.random.default_rng(9)
    c, v, h, w, hb, wb = 64, 2, 12, 16, 20, 20
    ih, iw = h * 4, w * 4
    pc_range = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)

    ref = V4.MMRI_I2P_Polar(
        embed_dims=c, dropout=0.0, pc_range=list(pc_range)
    ).eval()
    import types as _types

    def _enc_forward(self, src, mask=None, src_key_padding_mask=None, **kw):
        out = src
        for mod in self.layers:
            out = mod(out, src_mask=mask)
        return self.norm(out) if self.norm is not None else out

    enc = ref.transformer_layers.encoder
    enc.forward = _types.MethodType(_enc_forward, enc)
    with torch.no_grad():
        for p in ref.parameters():
            p.data = torch.tensor(
                rng.normal(scale=0.05, size=tuple(p.shape)).astype(np.float32)
            )

    lidar_feat = rng.normal(size=(1, c, hb, wb)).astype(np.float32)
    img_feat = rng.normal(size=(v, c, h, w)).astype(np.float32)
    lidar2img, cam2lidar, intr = _cams(v)
    img_metas = [
        {
            "lidar2img": lidar2img,
            "cam_intrinsic": intr,
            "cam2lidar": cam2lidar,
            "input_shape": (ih, iw),
        }
    ]
    with torch.no_grad():
        golden = _t2n(
            ref(
                torch.tensor(lidar_feat),
                torch.tensor(img_feat),
                img_metas,
                pts_metas=None,
            )
        )

    # convert through the REAL rules table under the checkpoint prefix
    sd = {
        f"imgpts_neck.pts_fusion_blocks.0.attentions.1.{k}": v_.numpy()
        for k, v_ in ref.state_dict().items()
    }
    flat, unmatched = convert_state_dict(sd)
    assert not unmatched
    prefix = "params:imgpts_neck/pts_layer0/polar_i2p/"
    params = {}
    for k, v_ in flat.items():
        assert k.startswith(prefix), k
        node = params
        parts = k[len(prefix):].split("/")
        for q in parts[:-1]:
            node = node.setdefault(q, {})
        node[parts[-1]] = v_

    cfg = MMRIEncoderConfig(
        variant="pp", hidden_channel=c, num_heads=8, dropout=0.0
    )
    mine = PolarI2P(cfg, pc_range, (ih, iw))
    eye = np.eye(4, dtype=np.float32)[None]
    batch = {
        "lidar2img": jnp.asarray(lidar2img)[None],
        "img2lidar": jnp.asarray(np.linalg.inv(lidar2img.astype(np.float64)))[
            None
        ].astype(jnp.float32),
        "cam2lidar": jnp.asarray(cam2lidar)[None],
        "lidar_aug": jnp.asarray(eye),
        "lidar_aug_inv": jnp.asarray(eye),
    }
    out = mine.apply(
        {"params": params},
        jnp.asarray(lidar_feat.transpose(0, 2, 3, 1)),
        jnp.asarray(img_feat.transpose(0, 2, 3, 1))[None],
        batch,
        False,
    )
    out = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, golden, rtol=5e-4, atol=5e-4)
