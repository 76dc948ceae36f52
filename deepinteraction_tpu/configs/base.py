"""Config schema for DeepInteraction-TPU.

Plain frozen dataclasses mirroring the key structure of the reference's
python-dict configs (reference: projects/configs/nuscenes/Fusion_0075_refactor.py)
so the two shipped experiment definitions translate field-for-field, plus the
static-shape capacities that a TPU (XLA) graph needs and the reference left
implicit (max points per cloud, max GT boxes, ...).

Overrides use dot-paths, mirroring mmcv's ``--cfg-options`` deep-merge
(reference: tools/train.py:59-68).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Tuple


@dataclass(frozen=True)
class VoxelizationConfig:
    """Hard voxelization capacities.

    Mirrors reference pts_voxel_layer / pts_pillar_layer
    (Fusion_0075_refactor.py:146-155). ``max_voxels`` is (train, eval) as in
    spconv; on TPU both are static graph capacities.
    """

    voxel_size: Tuple[float, float, float] = (0.075, 0.075, 0.2)
    point_cloud_range: Tuple[float, ...] = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
    max_num_points: int = 10
    max_voxels: Tuple[int, int] = (120000, 160000)

    @property
    def grid_size(self) -> Tuple[int, int, int]:
        """(nx, ny, nz) grid cells."""
        pcr = self.point_cloud_range
        vs = self.voxel_size
        return (
            int(round((pcr[3] - pcr[0]) / vs[0])),
            int(round((pcr[4] - pcr[1]) / vs[1])),
            int(round((pcr[5] - pcr[2]) / vs[2])),
        )


@dataclass(frozen=True)
class ImageBackboneConfig:
    """ResNet (reference: Fusion_0075_refactor.py:132-140) or Swin (++)."""

    type: str = "resnet"  # "resnet" | "swin"
    depth: int = 50
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    frozen_stages: int = 1
    norm_eval: bool = True
    # swin-only knobs
    embed_dims: int = 96
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    window_size: int = 7
    # training regularization (reference swin.py:283-458; the ++ config
    # sets drop_path_rate=0.2, Fusion_0075_plusplus.py:157-159)
    drop_path_rate: float = 0.0
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0


@dataclass(frozen=True)
class FPNConfig:
    """Image FPN neck (reference: Fusion_0075_refactor.py:141-145)."""

    in_channels: Tuple[int, ...] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5


@dataclass(frozen=True)
class SparseEncoderConfig:
    """3D sparse middle encoder (reference: Fusion_0075_refactor.py:160-168).

    sparse_shape is (nz, ny, nx) following the reference convention.
    ``stage_capacities`` are the static active-voxel caps per stage, a
    TPU-specific addition (spconv sizes these dynamically).
    """

    in_channels: int = 5
    sparse_shape: Tuple[int, int, int] = (41, 1440, 1440)
    base_channels: int = 16
    encoder_channels: Tuple[Tuple[int, ...], ...] = (
        (16, 16, 32),
        (32, 32, 64),
        (64, 64, 128),
        (128, 128),
    )
    output_channels: int = 128
    # Static active-site capacity after each downsampling stage. Stage 0 uses
    # the voxelizer capacity.
    stage_capacities: Tuple[int, ...] = (120000, 90000, 60000, 30000)


@dataclass(frozen=True)
class SECONDConfig:
    """Dense BEV backbone (reference: Fusion_0075_refactor.py:169-176)."""

    in_channels: int = 256
    out_channels: Tuple[int, ...] = (128, 256)
    layer_nums: Tuple[int, ...] = (5, 5)
    layer_strides: Tuple[int, ...] = (1, 2)


@dataclass(frozen=True)
class SECONDFPNConfig:
    """Deconv FPN over SECOND outputs (reference: Fusion_0075_refactor.py:177-184).

    The rebuilt version returns [concat, up0, up1] matching the reference's
    patched SECONDFPN (models/updated_modules/second_fpn.py:15-24).
    """

    in_channels: Tuple[int, ...] = (128, 256)
    out_channels: Tuple[int, ...] = (256, 256)
    upsample_strides: Tuple[int, ...] = (1, 2)


@dataclass(frozen=True)
class MMRIEncoderConfig:
    """Multi-modal representational interaction encoder.

    v1 (reference: models/necks/deepinteraction_encoder.py) when
    ``variant == 'v1'``; the ++ FusionTransformer when ``variant == 'pp'``.
    """

    variant: str = "v1"
    num_layers: int = 2
    in_channels_img: int = 256
    in_channels_pts: int = 512
    hidden_channel: int = 128
    bn_momentum: float = 0.1
    local_attn_kernel: int = 9
    # Static K for I2P pillar cross-attention: max_points_per_pillar * num_views
    # (reference's dynamic group_attn buckets cap at 120,
    #  models/utils/encoder_utils.py:226).
    i2p_max_keys: int = 120
    dropout: float = 0.1
    # ++ only: number of deformable attention sampling points per level
    deform_num_points: int = 4
    num_levels: int = 2
    num_heads: int = 8
    # ++ polar ray block: (r_min, r_max, r_step) in metres
    # (reference MMRI_I2P_Polar radius_range, fusion_transformerv4.py:490)
    use_polar_i2p: bool = False
    polar_radius_range: Tuple[float, float, float] = (1.0, 61.0, 1.0)
    polar_num_z_bins: int = 10


@dataclass(frozen=True)
class BBoxCoderConfig:
    """TransFusion box codec (reference: core/bbox/coders/transfusion_bbox_coder.py)."""

    pc_range: Tuple[float, float] = (-54.0, -54.0)
    voxel_size: Tuple[float, float] = (0.075, 0.075)
    out_size_factor: int = 8
    post_center_range: Tuple[float, ...] = (-61.2, -61.2, -10.0, 61.2, 61.2, 10.0)
    score_threshold: float = 0.0
    code_size: int = 10


@dataclass(frozen=True)
class AssignerConfig:
    """HungarianAssigner3D costs (reference: Fusion_0075_refactor.py:228-234)."""

    cls_cost_weight: float = 0.15
    cls_cost_alpha: float = 0.25
    cls_cost_gamma: float = 2.0
    reg_cost_weight: float = 0.25
    iou_cost_weight: float = 0.25
    # 'callback' = scipy LAP via pure_callback (exact; needs host-callback
    # support); 'auction' = on-device parallel auction (axon tunnel)
    lap_impl: str = "callback"


@dataclass(frozen=True)
class DecoderConfig:
    """MMPI decoder head (reference: Fusion_0075_refactor.py:194-224)."""

    variant: str = "v1"  # "v1" | "pp"
    # LiDAR-only head (TransFusion-L style, the reference's warm-start
    # lineage): single heatmap head, no MMPI refinement (num_mmpi=0)
    lidar_only: bool = False
    num_views: int = 6
    out_size_factor_img: int = 4
    num_proposals: int = 200
    auxiliary: bool = True
    hidden_channel: int = 128
    num_classes: int = 10
    num_mmpi: int = 4
    num_decoder_layers: int = 1
    num_heads: int = 8
    nms_kernel_size: int = 3
    ffn_channel: int = 256
    dropout: float = 0.1
    bn_momentum: float = 0.1
    # (out_dim, num_convs) per head; mirrors reference common_heads
    common_heads: Tuple[Tuple[str, Tuple[int, int]], ...] = (
        ("center", (2, 2)),
        ("height", (1, 2)),
        ("dim", (3, 2)),
        ("rot", (2, 2)),
        ("vel", (2, 2)),
    )
    num_heatmap_convs: int = 2
    # loss weights (reference: Fusion_0075_refactor.py:221-223)
    loss_cls_weight: float = 1.0
    loss_cls_alpha: float = 0.25
    loss_cls_gamma: float = 2.0
    loss_bbox_weight: float = 0.25
    loss_heatmap_weight: float = 1.0
    # train_cfg.pts (reference: Fusion_0075_refactor.py:225-242)
    gaussian_overlap: float = 0.1
    min_radius: int = 2
    code_weights: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.2, 0.2)
    # test_cfg.pts
    nms_type: Optional[str] = None  # None | "circle" | "rotate"
    pre_maxsize: int = 1000
    post_maxsize: int = 83


@dataclass(frozen=True)
class ModelConfig:
    # cameras disabled: skip image backbone/neck and MMRI fusion entirely
    lidar_only: bool = False
    freeze_img: bool = True
    freeze_pts: bool = True
    img_backbone: ImageBackboneConfig = field(default_factory=ImageBackboneConfig)
    img_neck: FPNConfig = field(default_factory=FPNConfig)
    pts_voxel_layer: VoxelizationConfig = field(default_factory=VoxelizationConfig)
    pts_pillar_layer: VoxelizationConfig = field(
        default_factory=lambda: VoxelizationConfig(
            voxel_size=(0.6, 0.6, 8.0), max_num_points=20, max_voxels=(30000, 60000)
        )
    )
    pts_middle_encoder: SparseEncoderConfig = field(default_factory=SparseEncoderConfig)
    pts_backbone: SECONDConfig = field(default_factory=SECONDConfig)
    pts_neck: SECONDFPNConfig = field(default_factory=SECONDFPNConfig)
    imgpts_neck: MMRIEncoderConfig = field(default_factory=MMRIEncoderConfig)
    bbox_coder: BBoxCoderConfig = field(default_factory=BBoxCoderConfig)
    assigner: AssignerConfig = field(default_factory=AssignerConfig)
    pts_bbox_head: DecoderConfig = field(default_factory=DecoderConfig)
    # global dtype policy for the compute path
    compute_dtype: str = "float32"  # "float32" | "bfloat16"


@dataclass(frozen=True)
class DataConfig:
    """Dataset + static-shape padding contract."""

    data_root: str = "data/nuscenes"
    class_names: Tuple[str, ...] = (
        "car",
        "truck",
        "construction_vehicle",
        "bus",
        "trailer",
        "barrier",
        "motorcycle",
        "bicycle",
        "pedestrian",
        "traffic_cone",
    )
    num_sweeps: int = 10
    load_dim: int = 5
    img_scale: Tuple[int, int] = (800, 448)  # (W, H)
    num_views: int = 6
    img_norm_mean: Tuple[float, float, float] = (123.675, 116.28, 103.53)
    img_norm_std: Tuple[float, float, float] = (58.395, 57.12, 57.375)
    pad_divisor: int = 32
    samples_per_device: int = 2
    # CBGS class-balanced resampling (reference CBGSDataset wrap,
    # Fusion_0075_refactor.py:96-99). Off shrinks a train epoch to the raw
    # sample count — used by the gate-checkpoint runs (PERF.md round 5)
    # where the flaky axon worker makes short epochs = cheap restarts.
    use_cbgs: bool = True
    # static shapes (TPU contract)
    max_points: int = 320000
    max_gt_boxes: int = 200
    # augmentation (reference train_pipeline, Fusion_0075_refactor.py:38-47)
    rot_range: Tuple[float, float] = (-0.785, 0.785)
    scale_ratio_range: Tuple[float, float] = (0.9, 1.1)
    translation_std: Tuple[float, float, float] = (0.5, 0.5, 0.5)
    flip_ratio_horizontal: float = 0.5
    flip_ratio_vertical: float = 0.5
    # GT-paste augmentation (mmdet3d ObjectSample): database pkl from
    # data/gt_database.create_gt_database + per-class sample targets;
    # fades out at fade_epoch (reference core/hook/fading.py)
    gt_database: Optional[str] = None
    sample_groups: Tuple[Tuple[str, int], ...] = ()
    fade_epoch: Optional[int] = None

    @property
    def padded_img_shape(self) -> Tuple[int, int]:
        """(H, W) after pad-to-divisor."""
        w, h = self.img_scale
        d = self.pad_divisor
        return ((h + d - 1) // d * d, (w + d - 1) // d * d)


@dataclass(frozen=True)
class OptimConfig:
    """AdamW + cyclic schedules (reference: Fusion_0075_refactor.py:252-264)."""

    lr: float = 1e-4
    weight_decay: float = 0.01
    grad_clip_norm: float = 0.1
    total_epochs: int = 6
    # cyclic LR: peak = lr * target_ratio[0], end = lr * target_ratio[1]
    lr_target_ratio: Tuple[float, float] = (10.0, 1e-4)
    lr_step_ratio_up: float = 0.4
    # cyclic momentum (beta1): dip = base * ratio[0], end = base * ratio[1]
    momentum_base: float = 0.9  # adam beta1 at start
    momentum_target_ratio: Tuple[float, float] = (0.8947368421052632, 1.0)
    momentum_step_ratio_up: float = 0.4
    checkpoint_interval_epochs: int = 1
    log_interval_steps: int = 50


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    work_dir: str = "work_dirs/default"
    load_from: Optional[str] = None
    resume_from: Optional[str] = None
    seed: int = 0
    # test-time proposal bump (reference: tools/test.py:155 sets 400)
    test_num_proposals: int = 400


def _replace_path(obj: Any, path: Sequence[str], value: Any) -> Any:
    """Immutably set a dot-path inside nested frozen dataclasses."""
    if not path:
        return value
    key = path[0]
    if not dataclasses.is_dataclass(obj):
        raise KeyError(f"cannot descend into non-dataclass at {key!r}")
    names = {f.name: f for f in dataclasses.fields(obj)}
    if key not in names:
        raise KeyError(f"unknown config field {key!r} on {type(obj).__name__}")
    child = getattr(obj, key)
    if len(path) == 1:
        ftype = names[key].type
        # best-effort scalar coercion from CLI strings
        if isinstance(value, str):
            cur = getattr(obj, key)
            if isinstance(cur, bool):
                value = value.lower() in ("1", "true", "yes")
            elif isinstance(cur, int):
                value = int(value)
            elif isinstance(cur, float):
                value = float(value)
            elif isinstance(cur, tuple):
                value = tuple(
                    type(cur[0])(v) if cur else v for v in value.split(",")
                )
        del ftype
        return dataclasses.replace(obj, **{key: value})
    return dataclasses.replace(obj, **{key: _replace_path(child, path[1:], value)})


def apply_overrides(cfg: Config, overrides: dict) -> Config:
    """Apply ``{"model.pts_bbox_head.num_proposals": 400}`` style overrides.

    The dot-path deep-merge mirrors the reference's ``--cfg-options``
    (tools/train.py:59-68,97-99).
    """
    for k, v in overrides.items():
        cfg = _replace_path(cfg, k.split("."), v)
    return cfg
