from gsjax.data.dataset import SceneInfo, load_scene_info, scene_load_type_callbacks
from gsjax.data.ply import load_gaussian_ply, save_gaussian_ply

__all__ = [
    "SceneInfo",
    "load_scene_info",
    "scene_load_type_callbacks",
    "load_gaussian_ply",
    "save_gaussian_ply",
]
