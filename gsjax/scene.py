"""Scene assembly: dataset -> device-resident cameras + initialized model.

The gsjax equivalent of the reference Scene class
(reference: scene/__init__.py:25-93): detects the dataset type, loads
cameras and the seed point cloud, writes input.ply + cameras.json for the
viewers, computes cameras_extent, and initializes (or reloads) the model.

TPU twist: ground-truth images live ON DEVICE as a stacked uint8 bank per
resolution group, and the per-step camera pick happens inside the jitted
train step — no host->device image transfer in the hot loop (the tunnel
between host and TPU would otherwise dominate step time).
"""

from __future__ import annotations

import json
import os
import random
import shutil

import flax.struct
import jax.numpy as jnp
import numpy as np

from gsjax.config import ModelConfig
from gsjax.core.cameras import Camera
from gsjax.data.camera_utils import camera_to_json, load_camera
from gsjax.data.dataset import CameraInfo, SceneInfo, load_scene_info
from gsjax.data.ply import load_gaussian_ply, save_gaussian_ply
from gsjax.model import (
    GaussianAux,
    GaussianParams,
    create_from_pcd,
    pad_gaussian_params,
)


@flax.struct.dataclass
class CameraBank:
    """Stacked cameras sharing one resolution, resident on device.

    views/full_projs: [N,4,4]; centers: [N,3]; tan_fovx/y: [N];
    gt_rgb: [N,3,H,W] u8; alpha: [N,1,H,W] u8 (255 = opaque).
    """

    views: jnp.ndarray
    full_projs: jnp.ndarray
    centers: jnp.ndarray
    tan_fovx: jnp.ndarray
    tan_fovy: jnp.ndarray
    gt_rgb: jnp.ndarray
    alpha: jnp.ndarray
    width: int = flax.struct.field(pytree_node=False)
    height: int = flax.struct.field(pytree_node=False)

    @property
    def count(self) -> int:
        return self.views.shape[0]

    def pick(self, idx) -> tuple[Camera, jnp.ndarray]:
        """Select camera idx (traced ok). Returns (Camera, gt [3,H,W] f32),
        with GT premultiplied by its alpha mask
        (reference: scene/cameras.py:39-44)."""
        cam = Camera(
            view=self.views[idx],
            full_proj=self.full_projs[idx],
            cam_center=self.centers[idx],
            tan_fovx=self.tan_fovx[idx],
            tan_fovy=self.tan_fovy[idx],
            width=self.width,
            height=self.height,
        )
        gt = self.gt_rgb[idx].astype(jnp.float32) / 255.0
        gt = jnp.clip(gt, 0.0, 1.0) * (self.alpha[idx].astype(jnp.float32) / 255.0)
        return cam, gt

    @classmethod
    def from_cameras(
        cls, cams: list[Camera], rgbs: list[np.ndarray], alphas: list[np.ndarray]
    ) -> "CameraBank":
        return cls(
            views=jnp.stack([c.view for c in cams]),
            full_projs=jnp.stack([c.full_proj for c in cams]),
            centers=jnp.stack([c.cam_center for c in cams]),
            tan_fovx=jnp.stack([c.tan_fovx for c in cams]),
            tan_fovy=jnp.stack([c.tan_fovy for c in cams]),
            gt_rgb=jnp.asarray(np.stack(rgbs)),
            alpha=jnp.asarray(np.stack(alphas)),
            width=cams[0].width,
            height=cams[0].height,
        )


def build_camera_banks(
    infos: list[CameraInfo], resolution: int, resolution_scale: float = 1.0
) -> list[CameraBank]:
    """Group loaded cameras by resolution and stack each group."""
    groups: dict[tuple[int, int], list] = {}
    for uid, info in enumerate(infos):
        cam, rgb, alpha = load_camera(info, uid, resolution, resolution_scale)
        groups.setdefault((cam.width, cam.height), []).append((cam, rgb, alpha))
    banks = []
    for (w, h), items in sorted(groups.items(), key=lambda kv: -len(kv[1])):
        cams, rgbs, alphas = zip(*items)
        banks.append(CameraBank.from_cameras(list(cams), list(rgbs), list(alphas)))
    return banks


class Scene:
    """Host-side scene container (reference: scene/__init__.py:25-93)."""

    def __init__(
        self,
        cfg: ModelConfig,
        load_iteration: int | None = None,
        shuffle: bool = True,
        resolution_scales: tuple[float, ...] = (1.0,),
        capacity: int | None = None,
    ):
        self.model_path = cfg.model_path
        self.loaded_iter = None

        if load_iteration is not None:
            if load_iteration == -1:
                self.loaded_iter = searchForMaxIteration(
                    os.path.join(self.model_path, "point_cloud")
                )
            else:
                self.loaded_iter = load_iteration
            print(f"Loading trained model at iteration {self.loaded_iter}")

        info: SceneInfo = load_scene_info(
            cfg.source_path,
            images=cfg.images,
            white_background=cfg.white_background,
            eval_split=cfg.eval,
        )

        if not self.loaded_iter and self.model_path:
            os.makedirs(self.model_path, exist_ok=True)
            if os.path.exists(info.ply_path):
                shutil.copyfile(
                    info.ply_path, os.path.join(self.model_path, "input.ply")
                )
            cam_json = [
                camera_to_json(i, c)
                for i, c in enumerate(info.train_cameras + info.test_cameras)
            ]
            with open(os.path.join(self.model_path, "cameras.json"), "w") as f:
                json.dump(cam_json, f)

        if shuffle:
            # Reference shuffles with the process-global RNG
            # (scene/__init__.py:77-79 after safe_state's seed) — which
            # makes the camera ORDER depend on how many Scenes a process
            # built before this one. A per-Scene fixed seed reproduces the
            # reference's fresh-process order every time, which checkpoint
            # resume requires: the trainer's saved epoch stacks index into
            # THIS ordering, so a restored run must rebuild it exactly.
            srng = random.Random(0)
            srng.shuffle(info.train_cameras)
            srng.shuffle(info.test_cameras)

        self.cameras_extent: float = info.nerf_normalization["radius"]
        # NeRF++-norm scene center (the skysphere shell and the unbounded
        # prune threshold are both anchored here).
        self.scene_center = -np.asarray(
            info.nerf_normalization["translate"], np.float32
        )
        self.info = info

        self.train_banks: dict[float, list[CameraBank]] = {}
        self.test_banks: dict[float, list[CameraBank]] = {}
        for scale in resolution_scales:
            self.train_banks[scale] = build_camera_banks(
                info.train_cameras, cfg.resolution, scale
            )
            if info.test_cameras:
                self.test_banks[scale] = build_camera_banks(
                    info.test_cameras, cfg.resolution, scale
                )
            else:
                self.test_banks[scale] = []

        if self.loaded_iter:
            data = load_gaussian_ply(
                os.path.join(
                    self.model_path,
                    "point_cloud",
                    f"iteration_{self.loaded_iter}",
                    "point_cloud.ply",
                )
            )
            n = data["xyz"].shape[0]
            cap = capacity or max(1 << (n - 1).bit_length(), 1024)
            self.params = pad_gaussian_params(
                xyz=data["xyz"],
                features_dc=data["features_dc"],
                features_rest=data["features_rest"],
                scaling=data["scaling"],
                rotation=data["rotation"],
                opacity=data["opacity"],
                capacity=cap,
            )
            self.aux = GaussianAux.create(cap, n)
        else:
            if info.point_cloud is None:
                raise ValueError("no seed point cloud found for scene init")
            self.params, self.aux = create_from_pcd(
                info.point_cloud.points,
                info.point_cloud.colors,
                cfg.sh_degree,
                capacity=capacity,
            )
            if cfg.sky_gaussians > 0:
                from gsjax.sky import add_sky_shell

                center = self.scene_center
                self.params, self.aux = add_sky_shell(
                    self.params,
                    self.aux,
                    cfg.sky_gaussians,
                    center,
                    cfg.sky_radius_scale * self.cameras_extent,
                )

    def get_train_banks(self, scale: float = 1.0) -> list[CameraBank]:
        return self.train_banks[scale]

    def get_test_banks(self, scale: float = 1.0) -> list[CameraBank]:
        return self.test_banks[scale]

    def save(self, iteration: int, params: GaussianParams, alive) -> None:
        """PLY snapshot (reference: scene/__init__.py:85-87)."""
        path = os.path.join(
            self.model_path, "point_cloud", f"iteration_{iteration}", "point_cloud.ply"
        )
        save_gaussian_ply(path, params, alive)


def searchForMaxIteration(folder: str) -> int:
    """(reference: utils/system_utils.py usage in scene/__init__.py:36)"""
    iters = [
        int(name.split("_")[-1])
        for name in os.listdir(folder)
        if name.startswith("iteration_")
    ]
    return max(iters)
