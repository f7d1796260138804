"""Skysphere support: a shell of far-field "sky" Gaussians.

The fork this framework mirrors is named "skysphere"; the snapshot contains
no sky-specific code (SURVEY.md preamble), so the capability is defined by
the BASELINE north star: unbounded-scene handling = background color
control + random-background regularization (both in the training stack)
plus this optional additive feature — a shell of large, far Gaussians
initialized on a sphere around the scene that learn the sky/far field
instead of leaving it to the constant background color.

Disabled by default (--sky_gaussians 0 keeps exact reference behavior).
"""

from __future__ import annotations

import numpy as np

from gsjax.core.sh import RGB2SH, num_sh_coeffs
from gsjax.core.transforms import inverse_sigmoid
from gsjax.model import GaussianAux, GaussianParams


def fibonacci_sphere(n: int) -> np.ndarray:
    """[n,3] near-uniform unit directions (golden-angle spiral)."""
    i = np.arange(n, dtype=np.float64) + 0.5
    phi = np.arccos(1.0 - 2.0 * i / n)
    theta = np.pi * (1.0 + 5.0**0.5) * i
    return np.stack(
        [
            np.cos(theta) * np.sin(phi),
            np.sin(theta) * np.sin(phi),
            np.cos(phi),
        ],
        axis=-1,
    ).astype(np.float32)


def sky_shell_arrays(
    n: int,
    center: np.ndarray,
    radius: float,
    sh_degree: int,
    opacity: float = 0.7,
    zenith_color=(0.45, 0.62, 0.90),
    horizon_color=(0.85, 0.88, 0.94),
) -> dict:
    """Raw parameter arrays for n sky Gaussians on a sphere of `radius`
    around `center`. Colors follow a zenith->horizon gradient (COLMAP
    convention: -y is up); scales cover the sphere surface
    (each splat ~ 2x its Voronoi cell: s = 2 r sqrt(pi/n))."""
    dirs = fibonacci_sphere(n)
    xyz = center[None, :].astype(np.float32) + radius * dirs
    up = -dirs[:, 1]  # elevation in COLMAP convention (y down)
    t = np.clip(up, 0.0, 1.0)[:, None]
    rgb = (1.0 - t) * np.asarray(horizon_color, np.float32) + t * np.asarray(
        zenith_color, np.float32
    )
    k = num_sh_coeffs(sh_degree)
    f_dc = np.asarray(RGB2SH(rgb))[:, None, :].astype(np.float32)
    f_rest = np.zeros((n, k - 1, 3), np.float32)
    s = 2.0 * radius * np.sqrt(np.pi / n)
    scaling = np.full((n, 3), np.log(s), np.float32)
    rotation = np.zeros((n, 4), np.float32)
    rotation[:, 0] = 1.0
    opac = np.full((n, 1), float(inverse_sigmoid(opacity)), np.float32)
    return {
        "xyz": xyz,
        "features_dc": f_dc,
        "features_rest": f_rest,
        "scaling": scaling,
        "rotation": rotation,
        "opacity": opac,
    }


def add_sky_shell(
    params: GaussianParams,
    aux: GaussianAux,
    n: int,
    center: np.ndarray,
    radius: float,
) -> tuple[GaussianParams, GaussianAux]:
    """Append n sky Gaussians into dead capacity slots (grows buffers if
    needed). Returns updated (params, aux)."""
    import jax.numpy as jnp

    n_alive = int(aux.n_alive())
    cap = params.capacity
    need = n_alive + n
    if need > cap:
        from gsjax.train.trainer import grow_capacity
        from gsjax.train.optimizer import adam_init
        from gsjax.train.step import TrainState

        new_cap = max(1 << (need - 1).bit_length(), cap)
        state = grow_capacity(
            TrainState(
                params=params, opt=adam_init(params), aux=aux,
                step=jnp.zeros((), jnp.int32),
            ),
            new_cap,
        )
        params, aux = state.params, state.aux
        cap = new_cap

    sky = sky_shell_arrays(n, center, radius, params.max_sh_degree)
    sl = slice(n_alive, n_alive + n)
    params = GaussianParams(
        xyz=params.xyz.at[sl].set(sky["xyz"]),
        features_dc=params.features_dc.at[sl].set(sky["features_dc"]),
        features_rest=params.features_rest.at[sl].set(sky["features_rest"]),
        scaling=params.scaling.at[sl].set(sky["scaling"]),
        rotation=params.rotation.at[sl].set(sky["rotation"]),
        opacity=params.opacity.at[sl].set(sky["opacity"]),
    )
    aux = aux.replace(alive=aux.alive.at[sl].set(True))
    return params, aux
