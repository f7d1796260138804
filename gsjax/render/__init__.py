from gsjax.render.api import RenderOutput, render
from gsjax.render.preprocess import Projected, preprocess

__all__ = ["render", "RenderOutput", "preprocess", "Projected"]
