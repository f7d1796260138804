"""gsjax — a TPU-native 3D Gaussian Splatting framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the Inria
gaussian-splatting trainer (reference: nk4517/gaussian-splatting-skysphere):
a differentiable tile rasterizer (Pallas TPU kernels), adaptive density
control, the full training recipe, COLMAP/Blender ingestion, PLY interop,
evaluation metrics, and multi-chip scaling via tile-sharded rendering.
"""

__version__ = "0.1.0"

from gsjax.config import (
    ModelConfig,
    OptimizationConfig,
    PipelineConfig,
    RasterConfig,
)

__all__ = [
    "ModelConfig",
    "OptimizationConfig",
    "PipelineConfig",
    "RasterConfig",
]
