"""Synthetic scene fixtures (re-exported from gsjax.synthetic)."""

from gsjax.synthetic import (  # noqa: F401
    look_at_origin_camera,
    orbit_camera,
    random_scene,
)
