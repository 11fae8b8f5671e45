"""Typed configuration tree.

Mirrors the reference's yacs namespaces (reference: config/default.py:3-75,
config/train.yaml, config/test.yaml) as frozen dataclasses with YAML overlay
and dotted-key CLI overrides.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, List, Optional, Sequence, Tuple


@dataclass(frozen=True)
class FusionConfig:
    # reference: config/default.py:71-75
    fusion_on: bool = True
    hidden_dim: int = 64
    average: bool = False
    full: bool = True


@dataclass(frozen=True)
class Backbone2DConfig:
    # reference: config/default.py:65-66 ('fpn-mnas-1' → alpha=1.0)
    arc: str = "fpn-mnas-1"

    @property
    def alpha(self) -> float:
        return float(self.arc.split("-")[-1])


@dataclass(frozen=True)
class PanopticConfig:
    """Panoptic decoder hyperparameters (reference: models/neucon_network.py:60-97)."""
    num_classes: int = 20
    num_queries: int = 80
    hidden_dim: int = 48
    nheads: int = 8
    dec_layers: int = 6
    dim_feedforward_mult: int = 4
    class_weight: float = 0.2
    mask_weight: float = 0.8
    dice_weight: float = 0.8
    no_object_weight: float = 0.1
    # static capacity of GT instances per fragment (reference uses dynamic lists)
    max_instances: int = 48
    # GT instances smaller than this are dropped (reference criterion.py:237)
    min_instance_voxels: int = 100
    # ids 1..2 are stuff (wall/floor), 3..20 things
    # (reference: models/mask3dformer.py:519, models/gru_fusion.py:135)
    stuff_ids: Tuple[int, ...] = (1, 2)


@dataclass(frozen=True)
class ModelConfig:
    # reference: config/train.yaml MODEL section
    n_vox: Tuple[int, int, int] = (96, 96, 96)
    voxel_size: float = 0.04
    n_layer: int = 3
    thresholds: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    train_num_sample: Tuple[int, int, int] = (15000, 60000, 120000)
    test_num_sample: Tuple[int, int, int] = (15000, 60000, 120000)
    pos_weight: float = 1.5
    # loss weights over (tsdf_occ_loss_0, 1, 2, panoptic) — reference models/neuralrecon.py:79-84
    lw: Tuple[float, ...] = (1.0, 0.8, 0.64, 1.2)
    # BGR pixel mean/std (reference config/default.py:60-61)
    pixel_mean: Tuple[float, float, float] = (103.53, 116.28, 123.675)
    pixel_std: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    sparsereg_dropout: bool = False
    backbone2d: Backbone2DConfig = field(default_factory=Backbone2DConfig)
    fusion: FusionConfig = field(default_factory=FusionConfig)
    panoptic: PanopticConfig = field(default_factory=PanopticConfig)
    # occupancy initialization (reference models/neucon_network.py:239-244)
    init_stage: int = 1
    min_view_number: int = 2
    occ_init_threshold: float = 0.3
    # fragment rejected if fewer valid init voxels (reference :107: 10^3)
    min_init_voxels: int = 1000
    # fragment rejected if fewer occupied voxels at any stage (reference :469)
    min_stage_voxels: int = 500
    # static voxel capacities per stage (coarse→fine). On TPU every sparse set
    # is capacity-padded; these sizes bound the compacted active sets.
    # voxel_capacity: occupancy-selected voxels per stage (covers the
    # reference's TRAIN/TEST_NUM_SAMPLE caps with headroom, 128-lane multiples)
    voxel_capacity: Tuple[int, int, int] = (16384, 65536, 131072)
    # stage_capacity: voxels processed per stage (x8 upsampled children of the
    # previous selection, united with the global map inside the window)
    stage_capacity: Tuple[int, int, int] = (16384, 131072, 524288)
    # static index-table window (aligned-camera units) per stage for the
    # sparse U-Net / ConvGRU point grids (>= sqrt(3) * window dim + slack)
    point_window: Tuple[int, int, int] = (64, 96, 192)
    # global map capacity per level (coarse→fine) for sparse-engine exports
    global_capacity: Tuple[int, int, int] = (131072, 524288, 2097152)
    # dense global scene volume extent in FINEST-level voxels (per-level
    # extents are this / 2^scale); window slices are dynamic_slice'd from it.
    # (256, 256, 128) @ 4 cm = 10.2 x 10.2 x 5.1 m — covers ScanNet rooms.
    global_extent: Tuple[int, int, int] = (256, 256, 128)
    # where the dense global volume anchors per scene:
    #   "window_union" — at the per-(scene, epoch) minimum fragment-window
    #       origin the dataset predicts (data/scannet.py scene_anchor); the
    #       extent only has to cover one epoch's window SPAN, so geometric
    #       placement is exact at a fraction of the HBM (round-5 fix for the
    #       train-time window clamping both round-4 production runs had)
    #   "vol_origin" — at scene vol_origin - origin_margin (round-4 scheme;
    #       translation augmentation sweeps windows across the padded scene,
    #       so full coverage needs all-epoch-union extents)
    scene_anchor: str = "window_union"
    # size global_extent + origin_margin from the dataset's actual fragment
    # window placements at run_train/run_test startup (data/extent.py:
    # exact for eval, HBM-capped for train) instead of the fixed values
    # above — use when scenes exceed the default volume (clip warnings)
    global_extent_auto: bool = False
    # desired margin (finest-level voxels) the global volume keeps BELOW a
    # scene's vol_origin: keyframe frustums poke into empty space below the
    # observed geometry (up to max_depth / voxel_size voxels), so fragment
    # windows can start below the GT volume origin. Capped per axis by half
    # the volume's slack (ops/grid.scene_global_origin); raise together with
    # global_extent when eval warns about clamped fragments (production
    # quality runs measured a 56-voxel overhang on 2-room scenes).
    origin_margin: int = 32
    # storage dtype of the global feature volumes ('bfloat16' halves HBM)
    global_dtype: str = "bfloat16"
    # transfer images host->device as uint8 (4x less relay volume and 4x
    # slower relay-client RSS retention; device casts to f32 before
    # normalization). Pixels are uint8-sourced (jpgs), so this only
    # quantizes the <=0.5/255 residue bilinear resizing introduces; off by
    # default to keep float golden parity.
    transfer_images_uint8: bool = False
    # window span for sparse-engine key packing (voxels); must be pow2 ≥ any
    # aligned-camera index range within a fragment.
    key_window: int = 512
    # rematerialization granularity for the training backward pass:
    #   "full"  — backbones, occ-init, U-Nets, GRU convs, decoder all
    #             recomputed in the backward (lowest HBM, most recompute)
    #   "light" — only the 2D backbones recomputed; 3D-window activations
    #             are saved (the windows are bf16 and fit full-scale HBM)
    #   "none"  — nothing rematerialized
    # Inference is unaffected (remat is an AD-only transform).
    # v5e A/B at full 96^3 scale (round 4, tools_dev/bench_train_remat.py):
    # full 650.3 / light 563.5 / none 554.8 ms per train step — "light" takes
    # ~all the win while keeping the 3D-window-free HBM headroom ("none"
    # also fit batch-1 full scale; flip it if HBM allows on your config).
    remat_mode: str = "light"
    # back-projection gather adjoint (training backward only):
    #   "scatter" — XLA's default gather VJP: one scatter-add row per
    #               gathered row (884,736/view at the fine stage)
    #   "sorted"  — sort cotangent rows by destination pixel and
    #               segment-sum, so the scatter sees each of the 19,200
    #               destinations once (ops/back_project.gather_rows_segsum)
    #   "auto"    — per-stage: "sorted" on the coarse stage where it
    #               measures 13.5 ms/step faster (37.0 vs 50.6, v5e,
    #               tools_dev/bench_bp_backward.py round 4), "scatter"
    #               elsewhere (fine stage: scatter 167.5 vs sorted 179.7 —
    #               the 884k-row argsort loses to the redundant scatter)
    # Mathematically identical everywhere (gradient-equality tested).
    bp_backward: str = "auto"

    @property
    def n_scales(self) -> int:
        return len(self.thresholds) - 1


@dataclass(frozen=True)
class TrainConfig:
    # reference: config/train.yaml TRAIN section + main.py:166-171
    path: str = ""
    epochs: int = 100
    lr: float = 1e-4
    lr_epochs: str = "70,90:10"
    weight_decay: float = 0.0
    betas: Tuple[float, float] = (0.9, 0.999)
    grad_clip: float = 1.0
    n_views: int = 9
    n_workers: int = 8
    accumulation_steps: int = 8
    random_rotation_3d: bool = True
    random_translation_3d: bool = True
    pad_xy_3d: float = 0.1
    pad_z_3d: float = 0.025
    only_init: bool = False
    only_occ: bool = False
    fuse_temporal: bool = True
    # epoch-seeded scene-granularity shuffling (fragments stay ordered within
    # a scene — GRU fusion needs temporal streams; reference trains unshuffled)
    shuffle: bool = False
    # mixed precision for backbone/conv compute
    bf16: bool = True
    finetune_layer: Optional[str] = None  # e.g. 'init' to freeze the init stage
    seed: int = 1


@dataclass(frozen=True)
class TestConfig:
    path: str = ""
    n_views: int = 9
    n_workers: int = 4
    # full depth-evaluation protocol after run_test (render predicted TSDF at
    # held-out frames → AbsRel/RMSE/δ + trim re-fusion → trimmed F-score;
    # reference tools/evaluation.py:85-208). 0 disables; N evaluates at most
    # N frames per scene.
    eval_depth_frames: int = 0


@dataclass(frozen=True)
class Config:
    mode: str = "train"
    dataset: str = "scannet"
    batch_size: int = 1
    logdir: str = "./checkpoints"
    resume: bool = True
    loadckpt: str = ""
    summary_freq: int = 20
    save_freq: int = 1
    seed: int = 1
    save_scene_mesh: bool = False
    save_incremental: bool = False
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    test: TestConfig = field(default_factory=TestConfig)


def default_config() -> Config:
    return Config()


# ---------------------------------------------------------------------------
# YAML overlay + dotted-key overrides (replaces yacs merge_from_file/list,
# reference: config/default.py:78-83)
# ---------------------------------------------------------------------------

def _coerce(value: Any, target_type: Any) -> Any:
    import typing

    origin = typing.get_origin(target_type)
    if origin in (tuple, Tuple):
        args = typing.get_args(target_type)
        elem = args[0] if args else float
        if elem is Ellipsis:
            elem = float
        return tuple(_coerce(v, elem) for v in value)
    if target_type is bool and isinstance(value, str):
        return value.lower() in ("1", "true", "yes", "on")
    if target_type in (int, float, str, bool):
        return target_type(value)
    return value


def _replace_path(cfg: Any, dotted: str, value: Any) -> Any:
    head, _, rest = dotted.partition(".")
    fields = {f.name: f for f in dataclasses.fields(cfg)}
    if head not in fields:
        raise KeyError(f"unknown config key: {head!r} in {type(cfg).__name__}")
    current = getattr(cfg, head)
    if rest:
        new_child = _replace_path(current, rest, value)
        return dataclasses.replace(cfg, **{head: new_child})
    ftype = fields[head].type
    if isinstance(ftype, str):  # postponed annotations
        import typing
        ftype = typing.get_type_hints(type(cfg)).get(head, type(current))
    return dataclasses.replace(cfg, **{head: _coerce(value, ftype)})


def apply_overrides(cfg: Config, overrides: Sequence[Tuple[str, Any]]) -> Config:
    """Apply dotted-key overrides, e.g. [('model.voxel_size', 0.04)]."""
    for key, value in overrides:
        cfg = _replace_path(cfg, key.lower(), value)
    return cfg


def _merge_dict(cfg: Any, d: dict) -> Any:
    for k, v in d.items():
        key = k.lower()
        if isinstance(v, dict):
            child = getattr(cfg, key)
            cfg = dataclasses.replace(cfg, **{key: _merge_dict(child, v)})
        else:
            cfg = _replace_path(cfg, key, v)
    return cfg


def load_config(yaml_path: Optional[str] = None,
                overrides: Sequence[Tuple[str, Any]] = ()) -> Config:
    """Build a Config from defaults + optional YAML file + CLI overrides."""
    cfg = default_config()
    if yaml_path:
        import yaml

        with open(yaml_path) as f:
            data = yaml.safe_load(f) or {}
        cfg = _merge_dict(cfg, data)
    return apply_overrides(cfg, overrides)


def parse_cli_overrides(opts: List[str]) -> List[Tuple[str, Any]]:
    """Parse ['model.voxel_size', '0.04', ...] KEY VALUE pairs (yacs-style)."""
    if len(opts) % 2 != 0:
        raise ValueError("overrides must be KEY VALUE pairs")
    out = []
    for k, v in zip(opts[::2], opts[1::2]):
        try:
            import ast

            v = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            pass
        out.append((k, v))
    return out
