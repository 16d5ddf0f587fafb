"""Configuration dataclasses.

Every default mirrors the reference's reflection-based CLI param groups
(/root/reference/arguments/__init__.py:47-106) — those defaults are a
behavioral spec. CLI entry points auto-generate argparse flags from these
dataclasses (see cli/common.py), preserving the reference's flag names.
"""
from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class ModelConfig:
    """Reference ModelParams (arguments/__init__.py:47-73)."""
    sh_degree: int = 3
    source_path: str = ""
    model_path: str = ""
    exp_name: str = ""
    images: str = "images"
    alpha_masks: str = ""
    depths: str = ""
    resolution: int = -1
    white_background: bool = False
    train_test_exp: bool = False
    eval: bool = False
    skip_scale_big_gauss: bool = False
    hierarchy: str = ""
    pretrained: str = ""
    skybox_num: int = 0
    scaffold_file: str = ""
    bounds_file: str = ""
    skybox_locked: bool = False


@dataclasses.dataclass
class PipelineConfig:
    """Reference PipelineParams (arguments/__init__.py:75-80)."""
    convert_SHs_python: bool = False
    compute_cov3D_python: bool = False
    debug: bool = False


@dataclasses.dataclass
class OptimizationConfig:
    """Reference OptimizationParams (arguments/__init__.py:82-106)."""
    iterations: int = 30_000
    position_lr_init: float = 0.00002
    position_lr_final: float = 0.0000002
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    exposure_lr_init: float = 0.001
    exposure_lr_final: float = 0.0001
    exposure_lr_delay_steps: int = 5000
    exposure_lr_delay_mult: float = 0.001
    percent_dense: float = 0.0001
    lambda_dssim: float = 0.2
    densification_interval: int = 300
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 0.015
    depth_l1_weight_init: float = 1.0
    depth_l1_weight_final: float = 0.01


@dataclasses.dataclass
class RuntimeConfig:
    """TPU-build knobs with no reference counterpart."""
    # Rasterizer shapes (see ops/rasterize.RasterizeConfig).
    tile: int = 16
    # Cap for the (adaptive) entry budget. Must hold the chunk-padded
    # aligned stream too: ~2.6M slots for a dense 1080p view at
    # chunk_e=256, hence 4M rather than the raw-duplicate 2M.
    max_entries: int = 1 << 22
    max_per_tile: int = 1024
    blend_chunk: int = 32
    # Pallas blend entries per grid step. With the blockwise segmented
    # prefix (linear in chunk_e) 512 beats 256 by ~15% on v5e; 1024 won
    # the 2026-08-19 bench self-tune by ~0.5 ms but its backward runs
    # within 2M of the 16M scoped-VMEM limit and can OOM under fusion
    # (see ops/rasterize.RasterizeConfig). Padding is governed by
    # `quantum`, not chunk_e.
    chunk_e: int = 512
    # Per-tile alignment quantum of the entry stream (<= chunk_e); the
    # kernel handles several quanta per grid step (segmented prefix).
    quantum: int = 128
    # Follow the observed per-view duplicate count with a bucketed entry
    # budget (train/loop._entry_bucket); max_entries becomes the cap.
    adaptive_entries: bool = True
    # Model capacity: fixed Gaussian slot count (densify headroom factor
    # applied to the initial point count when capacity == 0).
    capacity: int = 0
    capacity_factor: float = 8.0
    # Grow capacity (bucketed re-alloc + optimizer-moment copy) when a
    # densify pass drops clones/splits for lack of free slots; False keeps
    # the fixed budget and only warns.
    grow_capacity: bool = True
    # Upper bound for capacity growth (0 = unlimited).
    max_capacity: int = 0
    # Backward termination-truncation budget (ops/rasterize bwd_entries):
    # -2 = adaptive (default: survivor tracking rides the forward for
    # free; the loop engages a measured survivor-sized budget when it
    # saves kernel/scatter work and disengages when it cannot),
    # -1 = auto (half the entry budget), 0 = disabled, else slot count.
    bwd_entries: int = -2
    # Pallas transmittance recurrence: "mxu" or "roll" (see pallas_blend).
    prefix_mode: str = "mxu"
    # Backward grid-step width (0 = auto: 512 when shapes allow, else
    # chunk_e): the backward's VMEM scope is ~2x the forward's, so a wide
    # forward (e.g. 1024) pairs with a narrower backward. Multiple of
    # quantum, divides the entry budget.
    bwd_chunk_e: int = 0
    # Glue-op alternatives (see ops/rasterize.RasterizeConfig + SOL.md):
    # K-slot gradient scatter (0 = plain scatter-add), binning per-entry
    # table fill ("gather" | "cumsum"), forward post-quantum
    # transmittance ("loop" | "batched"). All bit-exact vs the defaults.
    scatter_k: int = 0
    # "cumsum" won the 2026-08-18 on-chip A/B (bench stage-3); see
    # ops/rasterize.RasterizeConfig.
    binning_fill: str = "cumsum"
    tafter_mode: str = "batched"
    # Entry sort implementation ("rank" | "2key", ops/binning).
    sort_mode: str = "rank"
    # Generation-side entry budget (0 = max_entries; -1 = adaptive split
    # driven by the observed raw duplicate count when adaptive_entries).
    # Default adaptive: at round-4's exact budgets the split measured
    # FASTER (93.9 vs 95.3 ms full step, ab_r04c 2026-08-19) — the r3
    # "split slower" finding was an artifact of bucketed budgets where
    # gen and aligned landed on the same rung.
    gen_entries: int = -1
    # Quality-gated per-tile depth truncation (ops/binning
    # bin_gaussians_aligned trunc_theta/trunc_c): cut each tile's
    # depth-sorted run once the proxy transmittance falls below theta.
    # 0 = off (exact rendering, the default) — lossy, promote only after
    # a PSNR/grad A/B on the target scene (bench.py gates it).
    trunc_theta: float = 0.0
    trunc_c: float = 1.0
    # In-step view data parallelism: shard a batch of views over this many
    # devices (parallel/step.make_dp_train_step); 1 = single-device loop.
    data_devices: int = 1
    # Views per optimizer step in the data-parallel path (must be a
    # multiple of data_devices); 0 = one view per device.
    views_per_step: int = 0


@dataclasses.dataclass
class FullConfig:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    pipe: PipelineConfig = dataclasses.field(default_factory=PipelineConfig)
    opt: OptimizationConfig = dataclasses.field(default_factory=OptimizationConfig)
    runtime: RuntimeConfig = dataclasses.field(default_factory=RuntimeConfig)
