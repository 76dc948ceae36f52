"""One-command checkpoint-parity harness: torch .pth -> converted weights ->
per-block activation diffs against the REFERENCE's own modules -> optional
full-val eval (VERDICT r3 #5; the reference's acceptance bar is its released
checkpoints, README.md:31-32).

Stages, all from one invocation:

1. **Conversion audit** — run the converter rules over the whole state
   dict, load into the model's parameter tree, report unmatched source
   keys / uncovered target leaves / shape errors. Shape errors are fatal.
2. **Per-block activation diff** — for each registered block, load the
   checkpoint's own weights into the reference's torch module (imported
   from /root/reference via tests/ref_shims.py — the same oracle path the
   golden tests use), run it next to our module fed the rules-converted
   weights on identical random inputs, and compare at the golden-test
   tolerances. The block fixtures (camera rigs, detectron2-ROIAlign
   stand-in, v0.17 box-convention map) are imported from the golden test
   modules so the tool and the tests can never drift apart.
3. **Full-val eval** (``--infos``) — save the converted tree as an orbax
   checkpoint and run tools/test.py on it (NDS / mAP / TP errors).

Usage (the day real weights are available):

    python tools/verify_ckpt.py fusion_plusplus deepinteraction_pp.pth \
        --infos data/nuscenes/nuscenes_infos_val.pkl --report report.json

Dry-runnable today without real weights: ``--make-dry-pth`` synthesizes a
.pth holding randomized reference-module weights under their real
checkpoint key prefixes (the same modules stage 2 checks), so the whole
convert -> block-diff pipeline exercises end-to-end:

    python tools/verify_ckpt.py tiny_pp --make-dry-pth /tmp/dry.pth
    python tools/verify_ckpt.py tiny_pp /tmp/dry.pth

(tests/test_verify_ckpt.py drives exactly this loop.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))  # ref_shims + golden fixtures

TOL = 2e-4  # the golden tests' recorded tolerance (rtol == atol)


# --------------------------------------------------------------- reporting


def _diff(ours: "np.ndarray", golden: "np.ndarray", tol: float = TOL) -> dict:
    import numpy as np

    ours, golden = np.asarray(ours), np.asarray(golden)
    abs_err = float(np.max(np.abs(ours - golden)))
    denom = np.maximum(np.abs(golden), 1e-6)
    rel_err = float(np.max(np.abs(ours - golden) / denom))
    return {
        "max_abs": abs_err,
        "max_rel": rel_err,
        "tol": tol,
        "ok": bool(abs_err <= tol or rel_err <= tol),
    }


def _slice_params(flat: dict, prefix: str) -> dict:
    """Nest the converted flat leaves under ``prefix`` into a param tree."""
    node_root: dict = {}
    for k, v in flat.items():
        if not k.startswith(prefix):
            continue
        node = node_root
        parts = k[len(prefix) :].split("/")
        for q in parts[:-1]:
            node = node.setdefault(q, {})
        node[parts[-1]] = v
    return node_root


def _take_block(sd: dict, ref_module, prefix: str):
    """Extract ``prefix``-keyed weights for one reference module; None if
    the checkpoint doesn't cover the block."""
    import torch

    needed = list(ref_module.state_dict())
    sub, missing = {}, []
    for k in needed:
        full = f"{prefix}.{k}"
        if full in sd:
            sub[k] = torch.as_tensor(sd[full])
        else:
            missing.append(full)
    return (None, missing) if missing else (sub, [])


# ---------------------------------------------------------- block runners
#
# Each runner: (cfg, sd) -> report dict. ``sd`` is the raw torch state dict
# (numpy values). Inputs are small-spatial synthetic fixtures (weights are
# shape-independent of proposals/feature sizes); channel/head dims come
# from the config so tiny_* configs drive the dry-run cheaply.


def _run_mmpi_block(cfg, sd, kind: str, index: int) -> dict:
    import numpy as np
    import jax.numpy as jnp
    import torch

    import test_reference_golden_mmpi as GM
    from deepinteraction_tpu.configs.base import BBoxCoderConfig, DecoderConfig
    from deepinteraction_tpu.models.decoder import ImageRCNNBlock, PointRCNNBlock
    from deepinteraction_tpu.targets.coder import TransFusionBBoxCoder
    from deepinteraction_tpu.utils.torch_convert import convert_state_dict

    dcfg = cfg.model.pts_bbox_head
    # the reference's DynamicConv hard-codes hidden 128 (decoder_utils.py
    # L589) — every real checkpoint is 128-wide here, so the diff always
    # runs at 128 even under tiny configs
    c, heads, v = 128, dcfg.num_heads, dcfg.num_views
    p, osf = 16, dcfg.out_size_factor_img
    variant = dcfg.variant
    prefix = f"pts_bbox_head.decode_head.{index}"
    rng = np.random.default_rng(100 + index)

    if kind == "img":
        cls = GM.DU.ImageRCNNBlock if variant == "v1" else GM.DU.ImageRCNNBlockV2
        ref = cls(
            num_views=v,
            num_proposals=p,
            out_size_factor_img=osf,
            test_cfg=GM.TEST_CFG,
            bbox_coder=GM._ref_coder(),
            hidden_channel=c,
            num_heads=heads,
            dropout=0.0,
        ).eval()
    else:
        cls = GM.DU.PointRCNNBlock if variant == "v1" else GM.DU.PointRCNNBlockV2
        ref = cls(
            hidden_channel=c,
            num_heads=heads,
            dropout=0.0,
            bbox_coder=GM._ref_coder(GM.PTS_CODER["pc_range"]),
        ).eval()

    sub, missing = _take_block(sd, ref, prefix)
    if sub is None:
        return {"status": "absent", "missing": missing[:6]}
    ref.load_state_dict(sub)

    flat, unmatched = convert_state_dict(
        {f"{prefix}.{k}": t.numpy() for k, t in ref.state_dict().items()}
    )
    if unmatched:
        return {"status": "fail", "unmatched": unmatched[:6]}
    core = _slice_params(
        flat, f"params:pts_bbox_head/mmpi{index}_{'img' if kind == 'img' else 'pts'}/core/"
    )

    jcfg = DecoderConfig(
        variant=variant,
        num_views=v,
        out_size_factor_img=osf,
        num_proposals=p,
        hidden_channel=c,
        num_heads=heads,
        dropout=0.0,
    )
    fh, fw = GM.FH, GM.FW
    ih, iw = fh * osf, fw * osf
    if kind == "img":
        ref.pooler = GM._D2Pooler(7, [1.0 / osf], 2)
        res = GM._res_layer(rng, 1, (40.0, 140.0))
        query_feat = rng.normal(size=(1, c, p)).astype(np.float32)
        img_feat = rng.normal(size=(1, v, c, fh * fw)).astype(np.float32)
        lidar2img = GM._cams(v)
        img_metas = [
            {"lidar2img": lidar2img, "input_shape": (ih, iw), "img_shape": [(ih, iw, 3)]}
        ]
        with torch.no_grad():
            golden, _ = ref(
                torch.tensor(query_feat),
                {k: torch.tensor(x) for k, x in GM._to_v017(res).items()},
                None,
                torch.tensor(img_feat),
                img_metas,
                fh,
                fw,
            )
        eye = np.eye(4, dtype=np.float32)[None]
        out, _ = ImageRCNNBlock(
            jcfg, TransFusionBBoxCoder(BBoxCoderConfig()), (ih, iw)
        ).apply(
            {"params": {"core": core}},
            jnp.asarray(query_feat.transpose(0, 2, 1)),
            GM._jax_res_layer(res),
            jnp.asarray(img_feat.reshape(1, v, c, fh, fw).transpose(0, 1, 3, 4, 2)),
            {
                "lidar2img": jnp.asarray(lidar2img)[None],
                "lidar_aug_inv": jnp.asarray(eye),
            },
            False,
        )
    else:
        ref.pooler_pts = GM._D2Pooler(7, [1.0], 2)
        res = GM._res_layer(rng, 1, (6.0, 18.0))
        query_feat = rng.normal(size=(1, c, p)).astype(np.float32)
        bev = rng.normal(size=(1, c, GM.BEV_H, GM.BEV_W)).astype(np.float32)
        with torch.no_grad():
            golden, _ = ref(
                torch.tensor(query_feat),
                {k: torch.tensor(x) for k, x in GM._to_v017(res).items()},
                torch.tensor(bev),
                None,
                None,
                None,
                None,
            )
        coder_j = TransFusionBBoxCoder(
            BBoxCoderConfig(pc_range=GM.PTS_CODER["pc_range"])
        )
        out, _ = PointRCNNBlock(jcfg, coder_j).apply(
            {"params": {"core": core}},
            jnp.asarray(query_feat.transpose(0, 2, 1)),
            GM._jax_res_layer(res),
            jnp.asarray(bev.transpose(0, 2, 3, 1)),
            False,
        )
    rep = _diff(np.asarray(out).transpose(0, 2, 1), GM._t2n(golden))
    rep["status"] = "ok" if rep.pop("ok") else "fail"
    return rep


def _run_pred_head(cfg, sd) -> dict:
    """pred0 FFN incl. the dim/rot box-convention rewiring: raw channels
    must match through the self-inverse map (untouched heads directly)."""
    import numpy as np
    import jax.numpy as jnp
    import torch

    import test_reference_golden_mmpi as GM
    from deepinteraction_tpu.models.decoder import PredictionFFN
    from deepinteraction_tpu.utils.torch_convert import convert_state_dict

    dcfg = cfg.model.pts_bbox_head
    # 128-wide like the rest of the decoder (DynamicConv hard-code) — the
    # dry-run .pth and every real checkpoint agree on this width
    c = 128
    spec = dcfg.common_heads + (
        ("heatmap", (dcfg.num_classes, dcfg.num_heatmap_convs)),
    )
    heads = {k: tuple(v) for k, v in spec}
    prefix = "pts_bbox_head.prediction_heads.0"
    ref = GM.DU.FFN(c, heads, head_conv=64).eval()
    sub, missing = _take_block(sd, ref, prefix)
    if sub is None:
        return {"status": "absent", "missing": missing[:6]}
    ref.load_state_dict(sub)

    rng = np.random.default_rng(31)
    x = rng.normal(size=(1, c, 16)).astype(np.float32)
    with torch.no_grad():
        res_ref = {k: GM._t2n(t) for k, t in ref(torch.tensor(x)).items()}

    flat, unmatched = convert_state_dict(
        {f"{prefix}.{k}": t.numpy() for k, t in ref.state_dict().items()}
    )
    if unmatched:
        return {"status": "fail", "unmatched": unmatched[:6]}
    params = _slice_params(flat, "params:pts_bbox_head/pred0/")
    for head in heads:  # ConvModule(bias='auto'): no conv bias before BN
        params[head]["fc0"].setdefault("bias", np.zeros(64, np.float32))
    batch_stats = _slice_params(flat, "batch_stats:pts_bbox_head/pred0/")
    res_j = PredictionFFN(spec, head_conv=64).apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(x.transpose(0, 2, 1)),
    )

    worst = {"max_abs": 0.0, "max_rel": 0.0, "tol": TOL}
    all_ok = True
    for k in heads:
        got = np.asarray(res_j[k]).transpose(0, 2, 1)
        want = res_ref[k]
        if k == "dim":  # converted weights predict in OUR convention
            want = want[:, [1, 0, 2]]
        elif k == "rot":
            want = np.stack([-want[:, 1], -want[:, 0]], 1)
        d = _diff(got, want)
        all_ok &= d.pop("ok")
        if d["max_abs"] > worst["max_abs"]:
            worst = d
    worst["status"] = "ok" if all_ok else "fail"
    return worst


def _run_polar(cfg, sd) -> dict:
    import numpy as np
    import jax.numpy as jnp
    import torch
    import types as _types

    import test_reference_golden_polar as GP
    from deepinteraction_tpu.configs.base import MMRIEncoderConfig
    from deepinteraction_tpu.models.fusion_transformer import PolarI2P
    from deepinteraction_tpu.utils.torch_convert import convert_state_dict

    ncfg = cfg.model.imgpts_neck
    c = ncfg.hidden_channel
    # fixture geometry is the reference module's own defaults (weights
    # depend only on embed_dims): pc_range/radius_range as shipped, and
    # nhead=8 which MMRI_I2P_Polar hard-codes (fusion_transformerv4.py:500)
    # regardless of config
    pc_range = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
    prefix = "imgpts_neck.pts_fusion_blocks.0.attentions.1"
    ref = GP.V4.MMRI_I2P_Polar(
        embed_dims=c, dropout=0.0, pc_range=list(pc_range)
    ).eval()
    sub, missing = _take_block(sd, ref, prefix)
    if sub is None:
        return {"status": "absent", "missing": missing[:6]}
    ref.load_state_dict(sub)

    # torch>=2.0 TransformerEncoder fast-path crashes on 0 encoder layers;
    # restore the loop+norm semantics (same shim as the golden test)
    def _enc_forward(self, src, mask=None, src_key_padding_mask=None, **kw):
        out = src
        for mod in self.layers:
            out = mod(out, src_mask=mask)
        return self.norm(out) if self.norm is not None else out

    enc = ref.transformer_layers.encoder
    enc.forward = _types.MethodType(_enc_forward, enc)

    rng = np.random.default_rng(41)
    v, h, w, hb, wb = 2, 12, 16, 20, 20
    ih, iw = h * 4, w * 4
    lidar_feat = rng.normal(size=(1, c, hb, wb)).astype(np.float32)
    img_feat = rng.normal(size=(v, c, h, w)).astype(np.float32)
    lidar2img, cam2lidar, intr = GP._cams(v)
    img_metas = [
        {
            "lidar2img": lidar2img,
            "cam_intrinsic": intr,
            "cam2lidar": cam2lidar,
            "input_shape": (ih, iw),
        }
    ]
    with torch.no_grad():
        golden = GP._t2n(
            ref(
                torch.tensor(lidar_feat),
                torch.tensor(img_feat),
                img_metas,
                pts_metas=None,
            )
        )

    flat, unmatched = convert_state_dict(
        {f"{prefix}.{k}": t.numpy() for k, t in ref.state_dict().items()}
    )
    if unmatched:
        return {"status": "fail", "unmatched": unmatched[:6]}
    params = _slice_params(flat, "params:imgpts_neck/pts_layer0/polar_i2p/")

    jcfg = MMRIEncoderConfig(
        variant="pp", hidden_channel=c, num_heads=8, dropout=0.0
    )
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
    out = PolarI2P(jcfg, pc_range, (ih, iw)).apply(
        {"params": params},
        jnp.asarray(lidar_feat.transpose(0, 2, 3, 1)),
        jnp.asarray(img_feat.transpose(0, 2, 3, 1))[None],
        batch,
        False,
    )
    rep = _diff(np.asarray(out).transpose(0, 3, 1, 2), golden)
    rep["status"] = "ok" if rep.pop("ok") else "fail"
    return rep


def _run_img_trunk(cfg, sd) -> dict:
    """ResNet stages + FPN levels activation diff through the converter
    rules, against mmdet-layout torch oracles (tests/torch_trunks.py) —
    a silent trunk-converter layout bug shifts every downstream number
    (VERDICT r4 #8). Reference: mmdet ResNet-50 + FPN, config
    Fusion_0075_refactor.py:132-145."""
    import numpy as np
    import jax.numpy as jnp
    import torch

    import torch_trunks as TT
    from deepinteraction_tpu.models.fpn import FPN
    from deepinteraction_tpu.models.resnet import ResNet
    from deepinteraction_tpu.utils.torch_convert import convert_state_dict

    bcfg, ncfg = cfg.model.img_backbone, cfg.model.img_neck
    if bcfg.type != "resnet":
        return {"status": "n/a (swin config)"}
    ref_bb = TT.TorchResNet(bcfg.depth, tuple(bcfg.out_indices)).eval()
    ref_nk = TT.TorchFPN(tuple(ncfg.in_channels), ncfg.out_channels, ncfg.num_outs).eval()
    sub_b, miss_b = _take_block(sd, ref_bb, "img_backbone")
    sub_n, miss_n = _take_block(sd, ref_nk, "img_neck")
    if sub_b is None or sub_n is None:
        return {"status": "absent", "missing": (miss_b + miss_n)[:6]}
    ref_bb.load_state_dict(sub_b)
    ref_nk.load_state_dict(sub_n)

    rng = np.random.default_rng(51)
    x = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        outs_t = ref_bb(torch.tensor(x))
        fpn_t = ref_nk(outs_t)

    src = {f"img_backbone.{k}": t.numpy() for k, t in ref_bb.state_dict().items()}
    src.update({f"img_neck.{k}": t.numpy() for k, t in ref_nk.state_dict().items()})
    flat, unmatched = convert_state_dict(src)
    if unmatched:
        return {"status": "fail", "unmatched": unmatched[:6]}

    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    outs_j = ResNet(depth=bcfg.depth, out_indices=tuple(bcfg.out_indices)).apply(
        {
            "params": _slice_params(flat, "params:img_backbone/"),
            "batch_stats": _slice_params(flat, "batch_stats:img_backbone/"),
        },
        xj,
        False,
    )
    fpn_j = FPN(out_channels=ncfg.out_channels, num_outs=ncfg.num_outs).apply(
        {"params": _slice_params(flat, "params:img_neck/")}, outs_j, False
    )

    worst = {"max_abs": 0.0, "max_rel": 0.0, "tol": TOL}
    all_ok = True
    for name, ours, want in (
        [(f"res_stage{i}", outs_j[i], outs_t[i]) for i in range(len(outs_j))]
        + [(f"fpn{i}", fpn_j[i], fpn_t[i]) for i in range(len(fpn_j))]
    ):
        d = _diff(np.asarray(ours).transpose(0, 3, 1, 2), want.numpy())
        all_ok &= d.pop("ok")
        if d["max_abs"] > worst.get("max_abs", 0.0):
            worst = {**d, "worst_block": name}
    worst["status"] = "ok" if all_ok else "fail"
    return worst


def _run_swin_trunk(cfg, sd) -> dict:
    """Full reference SwinTransformer (imported from /root/reference with
    its real swin_utils — ref_shims.load_reference_swin_full) vs our Swin
    through the converter rules: covers patch_embed, every stage,
    PatchMerging reduction layout, and the out-norms. Reference swin.py:
    460-754."""
    import numpy as np
    import jax.numpy as jnp
    import torch

    from ref_shims import load_reference_swin_full
    from deepinteraction_tpu.models.swin import SwinTransformer
    from deepinteraction_tpu.utils.torch_convert import convert_state_dict

    bcfg = cfg.model.img_backbone
    if bcfg.type != "swin":
        return {"status": "n/a (resnet config)"}
    SWF = load_reference_swin_full()
    ref = SWF.SwinTransformer(
        embed_dims=bcfg.embed_dims,
        depths=tuple(bcfg.depths),
        num_heads=tuple(bcfg.num_heads),
        window_size=bcfg.window_size,
        out_indices=tuple(bcfg.out_indices),
        drop_path_rate=0.0,
        convert_weights=False,
    ).eval()
    sub, missing = _take_block(sd, ref, "img_backbone")
    if sub is None:
        return {"status": "absent", "missing": missing[:6]}
    ref.load_state_dict(sub)

    rng = np.random.default_rng(52)
    x = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        outs_t = ref(torch.tensor(x))

    flat, unmatched = convert_state_dict(
        {f"img_backbone.{k}": t.numpy() for k, t in ref.state_dict().items()}
    )
    if unmatched:
        return {"status": "fail", "unmatched": unmatched[:6]}
    outs_j = SwinTransformer(
        embed_dims=bcfg.embed_dims,
        depths=tuple(bcfg.depths),
        num_heads=tuple(bcfg.num_heads),
        window_size=bcfg.window_size,
        out_indices=tuple(bcfg.out_indices),
    ).apply(
        {"params": _slice_params(flat, "params:img_backbone/")},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        False,
    )

    worst = {"max_abs": 0.0, "max_rel": 0.0, "tol": TOL}
    all_ok = True
    for i, (ours, want) in enumerate(zip(outs_j, outs_t)):
        d = _diff(np.asarray(ours).transpose(0, 3, 1, 2), want.numpy())
        all_ok &= d.pop("ok")
        if d["max_abs"] > worst.get("max_abs", 0.0):
            worst = {**d, "worst_block": f"swin_out{i}"}
    worst["status"] = "ok" if all_ok else "fail"
    return worst


def _run_pts_trunk(cfg, sd) -> dict:
    """SECOND + patched SECONDFPN activation diff through the converter
    rules vs mmdet3d-layout torch oracles (tests/torch_trunks.py).
    Reference: config Fusion_0075_refactor.py:169-184 +
    models/updated_modules/second_fpn.py:15-24."""
    import numpy as np
    import jax.numpy as jnp
    import torch

    import torch_trunks as TT
    from deepinteraction_tpu.models.second import SECOND, SECONDFPN
    from deepinteraction_tpu.utils.torch_convert import convert_state_dict

    scfg, fcfg = cfg.model.pts_backbone, cfg.model.pts_neck
    ref_b = TT.TorchSECOND(
        scfg.in_channels, tuple(scfg.out_channels), tuple(scfg.layer_nums),
        tuple(scfg.layer_strides),
    ).eval()
    ref_n = TT.TorchSECONDFPN(
        tuple(fcfg.in_channels), tuple(fcfg.out_channels), tuple(fcfg.upsample_strides)
    ).eval()
    sub_b, miss_b = _take_block(sd, ref_b, "pts_backbone")
    sub_n, miss_n = _take_block(sd, ref_n, "pts_neck")
    if sub_b is None or sub_n is None:
        return {"status": "absent", "missing": (miss_b + miss_n)[:6]}
    ref_b.load_state_dict(sub_b)
    ref_n.load_state_dict(sub_n)

    rng = np.random.default_rng(53)
    x = rng.normal(size=(1, scfg.in_channels, 24, 24)).astype(np.float32)
    with torch.no_grad():
        outs_t = ref_b(torch.tensor(x))
        fpn_t = ref_n(outs_t)

    src = {f"pts_backbone.{k}": t.numpy() for k, t in ref_b.state_dict().items()}
    src.update({f"pts_neck.{k}": t.numpy() for k, t in ref_n.state_dict().items()})
    flat, unmatched = convert_state_dict(src)
    if unmatched:
        return {"status": "fail", "unmatched": unmatched[:6]}

    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    outs_j = SECOND(
        out_channels=tuple(scfg.out_channels),
        layer_nums=tuple(scfg.layer_nums),
        layer_strides=tuple(scfg.layer_strides),
    ).apply(
        {
            "params": _slice_params(flat, "params:pts_backbone/"),
            "batch_stats": _slice_params(flat, "batch_stats:pts_backbone/"),
        },
        xj,
        False,
    )
    fpn_j = SECONDFPN(
        out_channels=tuple(fcfg.out_channels),
        upsample_strides=tuple(fcfg.upsample_strides),
    ).apply(
        {
            "params": _slice_params(flat, "params:pts_neck/"),
            "batch_stats": _slice_params(flat, "batch_stats:pts_neck/"),
        },
        outs_j,
        False,
    )

    worst = {"max_abs": 0.0, "max_rel": 0.0, "tol": TOL}
    all_ok = True
    for name, ours, want in (
        [(f"second{i}", outs_j[i], outs_t[i]) for i in range(len(outs_j))]
        + [(f"secondfpn{i}", fpn_j[i], fpn_t[i]) for i in range(len(fpn_j))]
    ):
        d = _diff(np.asarray(ours).transpose(0, 3, 1, 2), want.numpy())
        all_ok &= d.pop("ok")
        if d["max_abs"] > worst.get("max_abs", 0.0):
            worst = {**d, "worst_block": name}
    worst["status"] = "ok" if all_ok else "fail"
    return worst


def _blocks_for(cfg) -> dict:
    """name -> runner(cfg, sd). MMPI even blocks are image, odd are point
    (deepinteraction_decoder.py:105-132); diff one of each generation."""
    dcfg = cfg.model.pts_bbox_head
    blocks = {"pred0_head": _run_pred_head}
    if dcfg.num_mmpi > 0:
        blocks["mmpi0_img"] = lambda c, s: _run_mmpi_block(c, s, "img", 0)
    if dcfg.num_mmpi > 1:
        blocks["mmpi1_pts"] = lambda c, s: _run_mmpi_block(c, s, "pts", 1)
    if getattr(cfg.model.imgpts_neck, "use_polar_i2p", False):
        blocks["polar_i2p"] = _run_polar
    # trunk blocks (VERDICT r4 #8): a converter layout bug here shifts
    # every downstream number
    if cfg.model.img_backbone.type == "resnet":
        blocks["img_trunk"] = _run_img_trunk
    else:
        blocks["swin_trunk"] = _run_swin_trunk
    blocks["pts_trunk"] = _run_pts_trunk
    return blocks


# ------------------------------------------------------------ dry-run .pth


def make_dry_pth(cfg, path: str) -> None:
    """Synthesize a .pth of randomized reference-module weights under their
    real checkpoint key prefixes for every block stage 2 checks, so the
    harness is exercisable before real weights exist."""
    import numpy as np
    import torch

    import test_reference_golden_mmpi as GM

    rng = np.random.default_rng(5)
    dcfg = cfg.model.pts_bbox_head
    # MMPI blocks at 128 wide — the reference DynamicConv hard-code the
    # verify runners also pin (see _run_mmpi_block)
    c, heads_n, v = 128, dcfg.num_heads, dcfg.num_views
    sd: dict = {}

    def put(prefix, mod):
        GM._randomize(mod, rng)
        for k, t in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = t.numpy()

    spec = dcfg.common_heads + (
        ("heatmap", (dcfg.num_classes, dcfg.num_heatmap_convs)),
    )
    put(
        "pts_bbox_head.prediction_heads.0",
        GM.DU.FFN(c, {k: tuple(x) for k, x in spec}, head_conv=64),
    )
    variant = dcfg.variant
    if dcfg.num_mmpi > 0:
        cls = GM.DU.ImageRCNNBlock if variant == "v1" else GM.DU.ImageRCNNBlockV2
        put(
            "pts_bbox_head.decode_head.0",
            cls(v, 16, dcfg.out_size_factor_img, GM.TEST_CFG, None, c, heads_n, 0.0),
        )
    if dcfg.num_mmpi > 1:
        cls = GM.DU.PointRCNNBlock if variant == "v1" else GM.DU.PointRCNNBlockV2
        put("pts_bbox_head.decode_head.1", cls(c, heads_n, 0.0, None))
    if getattr(cfg.model.imgpts_neck, "use_polar_i2p", False):
        import test_reference_golden_polar as GP

        put(
            "imgpts_neck.pts_fusion_blocks.0.attentions.1",
            GP.V4.MMRI_I2P_Polar(
                embed_dims=cfg.model.imgpts_neck.hidden_channel,
                dropout=0.0,
            ),
        )
    # trunk blocks at the config's sizes (img_trunk / swin_trunk / pts_trunk)
    import torch_trunks as TT

    bcfg, ncfg = cfg.model.img_backbone, cfg.model.img_neck
    if bcfg.type == "resnet":
        put("img_backbone", TT.TorchResNet(bcfg.depth, tuple(bcfg.out_indices)))
        put(
            "img_neck",
            TT.TorchFPN(tuple(ncfg.in_channels), ncfg.out_channels, ncfg.num_outs),
        )
    else:
        from ref_shims import load_reference_swin_full

        SWF = load_reference_swin_full()
        put(
            "img_backbone",
            SWF.SwinTransformer(
                embed_dims=bcfg.embed_dims,
                depths=tuple(bcfg.depths),
                num_heads=tuple(bcfg.num_heads),
                window_size=bcfg.window_size,
                out_indices=tuple(bcfg.out_indices),
                drop_path_rate=0.0,
                convert_weights=False,
            ),
        )
    scfg, fcfg = cfg.model.pts_backbone, cfg.model.pts_neck
    put(
        "pts_backbone",
        TT.TorchSECOND(
            scfg.in_channels, tuple(scfg.out_channels), tuple(scfg.layer_nums),
            tuple(scfg.layer_strides),
        ),
    )
    put(
        "pts_neck",
        TT.TorchSECONDFPN(
            tuple(fcfg.in_channels), tuple(fcfg.out_channels),
            tuple(fcfg.upsample_strides),
        ),
    )
    # marker: stage 1's fatal shape-error check is waived for dry-run
    # checkpoints (their decoder blocks are 128-wide per the reference
    # hard-codes while a tiny config's model tree is narrower)
    sd["__dry_run__"] = np.ones((1,), np.float32)
    torch.save(sd, path)
    print(f"wrote dry-run checkpoint ({len(sd)} keys) to {path}")


# ------------------------------------------------------------------- main


def run(cfg_name: str, ckpt_path: str, infos=None, workdir=None) -> dict:
    import numpy as np
    import torch

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    cache = os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    import jax.numpy as jnp

    from deepinteraction_tpu.models.detector import DeepInteraction
    from deepinteraction_tpu.utils.testing import make_synthetic_batch
    from deepinteraction_tpu.utils.torch_convert import convert_state_dict, load_into_tree
    from tools.train import get_config

    cfg = get_config(cfg_name)
    raw = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = raw.get("state_dict", raw)
    sd = {k: (t.numpy() if hasattr(t, "numpy") else np.asarray(t)) for k, t in sd.items()}
    dry = sd.pop("__dry_run__", None) is not None

    report: dict = {"config": cfg_name, "ckpt": ckpt_path, "dry_run": dry}

    # stage 1: conversion audit
    flat, unmatched = convert_state_dict(sd)
    model = DeepInteraction(cfg.model, cfg.data.padded_img_shape)
    batch = {k: jnp.asarray(v) for k, v in make_synthetic_batch(cfg, b=1).items()}
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), batch, False))
    target = jax.tree_util.tree_map(lambda s: np.zeros(s.shape, s.dtype), shapes)
    tree, missing, shape_errors = load_into_tree(target, flat)
    report["convert"] = {
        "converted": len(flat),
        "unmatched_src": len(unmatched),
        "unmatched_examples": unmatched[:10],
        "uncovered_target": len(missing),
        "shape_errors": [f"{k}: {s} vs {d}" for k, s, d in shape_errors[:10]],
    }
    print(
        f"[convert] {len(flat)} leaves | {len(unmatched)} unmatched src keys | "
        f"{len(missing)} target leaves at init | {len(shape_errors)} shape errors",
        flush=True,
    )

    # stage 2: per-block activation diffs
    report["blocks"] = {}
    for name, runner in _blocks_for(cfg).items():
        try:
            rep = runner(cfg, sd)
        except Exception as e:  # a crashed block is a finding, not an abort
            rep = {"status": "error", "error": f"{type(e).__name__}: {e}"}
        report["blocks"][name] = rep
        print(f"[block] {name}: {rep}", flush=True)

    # stage 3: optional full-val eval through tools/test.py
    if infos:
        import subprocess

        from deepinteraction_tpu.train.checkpoint import save_checkpoint
        from deepinteraction_tpu.train.step import create_train_state

        workdir = workdir or "/tmp/verify_ckpt"
        ckdir = os.path.join(workdir, "orbax")
        state = create_train_state(cfg, tree, total_steps=1)
        save_checkpoint(ckdir, state, step=0)
        cmd = [
            sys.executable,
            os.path.join(_REPO, "tools", "test.py"),
            cfg_name,
            "--infos",
            infos,
            "--checkpoint",
            ckdir,
            "--num-workers",
            "0",
            "--out",
            os.path.join(workdir, "dets.pkl"),
        ]
        print("[eval]", " ".join(cmd), flush=True)
        proc = subprocess.run(cmd, capture_output=True, text=True)
        sys.stdout.write(proc.stdout[-4000:])
        sys.stderr.write(proc.stderr[-2000:])
        report["eval_rc"] = proc.returncode

    bad = [n for n, r in report["blocks"].items() if r["status"] in ("fail", "error")]
    fatal = (bool(shape_errors) and not dry) or bool(bad)
    report["ok"] = not fatal
    return report


def main():
    p = argparse.ArgumentParser()
    p.add_argument(
        "config",
        choices=["fusion_base", "fusion_plusplus", "lidar_only", "tiny", "tiny_pp", "tiny_lidar"],
    )
    p.add_argument("ckpt", nargs="?", help="torch .pth checkpoint")
    p.add_argument("--infos", default=None, help="val infos pkl: also run full-val eval")
    p.add_argument("--workdir", default=None)
    p.add_argument("--report", default=None, help="write the JSON report here")
    p.add_argument("--make-dry-pth", default=None, metavar="OUT", help="synthesize a dry-run .pth and exit")
    args = p.parse_args()

    if args.make_dry_pth:
        from tools.train import get_config

        make_dry_pth(get_config(args.config), args.make_dry_pth)
        return 0
    if not args.ckpt:
        p.error("ckpt is required unless --make-dry-pth")

    report = run(args.config, args.ckpt, infos=args.infos, workdir=args.workdir)
    if args.report:
        with open(args.report, "w") as f:
            json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items() if k != "convert"}, default=str))
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
