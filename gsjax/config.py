"""Configuration dataclasses.

Mirrors the reference flag groups and their defaults exactly — these defaults
ARE the published 3DGS recipe (reference: arguments/__init__.py:47-90).
Unlike the reference's reflection-over-argparse scheme, these are plain
dataclasses; CLI wiring lives in gsjax/cli/args.py.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Scene/model loading options (reference: arguments/__init__.py:47-62)."""

    sh_degree: int = 3
    source_path: str = ""
    model_path: str = ""
    images: str = "images"
    resolution: int = -1
    white_background: bool = False
    data_device: str = "tpu"  # reference default is "cuda"; kept for CLI parity
    eval: bool = False
    # Skysphere extension (gsjax; no reference analog — SURVEY.md preamble):
    # number of far-field sky Gaussians initialized on a sphere of
    # sky_radius_scale * cameras_extent around the scene. 0 = vanilla.
    sky_gaussians: int = 0
    sky_radius_scale: float = 10.0


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Render-pipeline toggles (reference: arguments/__init__.py:64-69).

    convert_SHs_python / compute_cov3D_python select the slow reference-math
    paths; in gsjax these run the same jnp formulas outside the fused kernel
    and act as an A/B oracle for the in-kernel math, matching the reference's
    use of these flags (reference: gaussian_renderer/__init__.py:57-82).
    """

    convert_SHs_python: bool = False
    compute_cov3D_python: bool = False
    debug: bool = False


@dataclasses.dataclass(frozen=True)
class OptimizationConfig:
    """Training hyperparameters (reference: arguments/__init__.py:71-89)."""

    iterations: int = 30_000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 0.0002
    random_background: bool = False


@dataclasses.dataclass(frozen=True)
class RasterConfig:
    """TPU rasterizer compile-time configuration (gsjax-specific; no
    reference analog — the CUDA rasterizer hard-codes BLOCK_X/Y=16 and sizes
    buffers dynamically, which XLA's static shapes disallow).

    Attributes:
      tile_size: pixel tile edge used when tile_w/tile_h are unset (16
        matches the reference kernel's BLOCK_X/Y granularity).
      tile_w / tile_h: optional rectangular tile shape. Tile shape trades
        instance-rate pipeline cost (expansion, gathers, sorts, grad
        reduction all scale with the (gaussian, tile) pair count, which
        SHRINKS with bigger tiles) against per-chunk composite cost (pixel
        passes scale with tile area); mid-size splat scenes favor wider
        tiles like 32x16 or 32x32 on TPU.
      chunk: instances processed per inner step of the composite kernel AND
        the alignment unit of per-tile instance ranges; 128 = one TPU lane
        register row of f32.
      max_instances: static budget for EXACT (gaussian, tile) pairs (pairs
        whose tile contains at least one pixel with alpha >= 1/255). Pairs
        past the budget are dropped deepest-first (overflow is reported).
      max_rows: static budget for (gaussian, tile-row) runs, the
        intermediate level of the two-level instance expansion.
      strips: per-tile early-termination granularity — the composite
        kernels track the all-pixels-terminated skip per contiguous
        row-major range of pixels_per_tile/strips pixels (1 = whole tile;
        when pixels_per_tile/strips is a multiple of tile_w each range is a
        whole horizontal strip). The skip is exact for any partition;
        finer strips skip more saturated work but shrink each vector op.
      interpret: run Pallas kernels in interpreter mode (CPU tests/debug).
      fast_fwd: INFERENCE-ONLY bf16 fast path in the forward composite
        kernel — drops the lo-half corrections of the MXU triangular
        cumsums (the kernel's per-chunk cost floor). ~1e-3 relative
        transmittance error, invisible at 8-bit display depth; the viewer
        and fps benchmarks opt in. Differentiating a render with fast_fwd
        set raises (the backward's exact replay would be inconsistent with
        the approximate forward).
    """

    tile_size: int = 16
    tile_w: Optional[int] = None
    tile_h: Optional[int] = None
    strips: int = 1
    chunk: int = 128
    max_instances: int = 2 ** 21
    max_rows: int = 2 ** 21
    interpret: bool = False
    fast_fwd: bool = False

    def __post_init__(self) -> None:
        # The kernels DMA whole chunk-sized slices of the instance stream;
        # a budget that is not a chunk multiple would read/write past the
        # buffer on the final partial chunk.
        if self.max_instances % self.chunk:
            raise ValueError(
                f"max_instances ({self.max_instances}) must be a multiple "
                f"of chunk ({self.chunk})"
            )
        if self.max_rows % self.chunk:
            raise ValueError(
                f"max_rows ({self.max_rows}) must be a multiple of chunk "
                f"({self.chunk})"
            )
        if self.tw * self.th % 8:
            raise ValueError("tile area must be a multiple of 8 sublanes")
        if self.tw * self.th % (8 * self.strips):
            raise ValueError("strips must divide the tile into 8-sublane "
                             "multiples")

    @property
    def tw(self) -> int:
        return self.tile_w if self.tile_w is not None else self.tile_size

    @property
    def th(self) -> int:
        return self.tile_h if self.tile_h is not None else self.tile_size

    @property
    def pixels_per_tile(self) -> int:
        return self.tw * self.th


MIN_RASTER_BUDGET = 1 << 16


def pow2_budget(peak: int, headroom: float = 1.3) -> int:
    """Smallest power-of-two budget holding peak * headroom (powers of two
    bound the number of distinct recompiles as budgets self-size)."""
    need = max(int(peak * headroom), MIN_RASTER_BUDGET)
    return 1 << (need - 1).bit_length()


def padded_image_shape(height: int, width: int, tile: int) -> tuple[int, int]:
    """Image shape rounded up to a whole number of tiles."""
    pad_h = (height + tile - 1) // tile * tile
    pad_w = (width + tile - 1) // tile * tile
    return pad_h, pad_w
