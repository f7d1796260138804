"""Distribution layer: device mesh, sharded rendering, sharded training.

The reference has NO distributed execution (it pins cuda:0,
reference: utils/general_utils.py:133) — this layer is the TPU-native
scaling design from SURVEY.md §5.7-5.8: the pixel/tile grid is sharded over
the mesh ("tile" axis: each device rasterizes a slab of tile rows against
replicated Gaussians), cameras are data-parallel ("data" axis: >1 camera per
step), and Gaussian-parameter gradients are combined with psum over ICI.
"""

from gsjax.parallel.mesh import make_mesh, mesh_shape_for
from gsjax.parallel.render import render_sharded
from gsjax.parallel.step import make_sharded_train_step

__all__ = [
    "make_mesh",
    "mesh_shape_for",
    "render_sharded",
    "make_sharded_train_step",
]
