"""Dry-run pins for the shell-out CLIs that can't execute in this
environment (no benchmark datasets, no colmap binary): capture every
os.system command string and assert scene lists, resolution flags, and
pipeline order against the reference scripts
(reference: full_eval.py:39-75, convert.py:31-88)."""

from __future__ import annotations

import os

import pytest

from gsjax.cli import convert as convert_cli
from gsjax.cli import full_eval as full_eval_cli


@pytest.fixture()
def captured_system(monkeypatch):
    cmds: list[str] = []

    def fake_system(cmd):
        cmds.append(cmd)
        return 0

    monkeypatch.setattr(os, "system", fake_system)
    return cmds


ALL_SCENES = [
    "bicycle", "flowers", "garden", "stump", "treehill",  # 360 outdoor
    "room", "counter", "kitchen", "bonsai",  # 360 indoor
    "truck", "train",  # tanks&temples
    "drjohnson", "playroom",  # deep blending
]


class TestFullEval:
    def test_full_pipeline_commands(self, captured_system):
        full_eval_cli.main([
            "-m360", "/data/m360", "-tat", "/data/tat", "-db", "/data/db",
            "--output_path", "/out",
        ])
        cmds = captured_system
        train = [c for c in cmds if " train.py " in c]
        render = [c for c in cmds if " render.py " in c]
        metric = [c for c in cmds if " metrics.py " in c]
        # 13 scenes trained, 13 x {7k, 30k} rendered, one metrics sweep
        # (reference: full_eval.py:39-75).
        assert len(train) == 13
        assert len(render) == 26
        assert len(metric) == 1

        # Resolution policy: 360-outdoor at images_4, 360-indoor at
        # images_2, tat/db at full res (reference: full_eval.py:43-51).
        for scene in ["bicycle", "flowers", "garden", "stump", "treehill"]:
            (cmd,) = [c for c in train if f"/data/m360/{scene} " in c]
            assert "-i images_4" in cmd and f"-m /out/{scene}" in cmd
        for scene in ["room", "counter", "kitchen", "bonsai"]:
            (cmd,) = [c for c in train if f"/data/m360/{scene} " in c]
            assert "-i images_2" in cmd
        for scene in ["truck", "train"]:
            (cmd,) = [c for c in train if f"/data/tat/{scene} " in c]
            assert "-i " not in cmd
        for scene in ["drjohnson", "playroom"]:
            (cmd,) = [c for c in train if f"/data/db/{scene} " in c]
            assert "-i " not in cmd
        for cmd in train:
            assert "--quiet --eval --test_iterations -1" in cmd

        # Renders: both checkpoints per scene, eval split only
        # (reference: full_eval.py:69-75).
        for scene in ALL_SCENES:
            mine = [c for c in render if f"-m /out/{scene} " in c]
            assert sorted(
                c.split("--iteration ")[1].split()[0] for c in mine
            ) == ["30000", "7000"]
            for c in mine:
                assert "--quiet --eval --skip_train" in c

        # One metrics call listing every model path in order
        # (reference: full_eval.py:83-87).
        for scene in ALL_SCENES:
            assert f'"/out/{scene}"' in metric[0]

    def test_training_ordering_precedes_rendering(self, captured_system):
        full_eval_cli.main([
            "-m360", "/d/m", "-tat", "/d/t", "-db", "/d/b",
        ])
        kinds = [
            "t" if " train.py " in c else "r" if " render.py " in c else "m"
            for c in captured_system
        ]
        assert kinds == ["t"] * 13 + ["r"] * 26 + ["m"]

    def test_skip_flags(self, captured_system):
        full_eval_cli.main(
            ["--skip_training", "--skip_rendering", "--output_path", "/out"]
        )
        assert len(captured_system) == 1
        assert " metrics.py " in captured_system[0]

    def test_missing_dataset_roots_rejected(self, captured_system):
        with pytest.raises(SystemExit):
            full_eval_cli.main(["-m360", "/data/m360"])  # tat/db missing


class TestConvert:
    def test_colmap_pipeline_order(self, captured_system, tmp_path):
        src = tmp_path / "scene"
        (src / "sparse").mkdir(parents=True)
        (src / "input").mkdir()
        convert_cli.main(["-s", str(src)])
        stages = [c.split()[1] for c in captured_system]
        # feature_extractor -> exhaustive_matcher -> mapper ->
        # image_undistorter (reference: convert.py:40-77).
        assert stages == [
            "feature_extractor",
            "exhaustive_matcher",
            "mapper",
            "image_undistorter",
        ]
        fe, em, mp, iu = captured_system
        assert f"--database_path {src}/distorted/database.db" in fe
        assert "--ImageReader.single_camera 1" in fe
        assert "--ImageReader.camera_model OPENCV" in fe
        assert "--SiftExtraction.use_gpu 1" in fe
        assert "--SiftMatching.use_gpu 1" in em
        assert "--Mapper.ba_global_function_tolerance=0.000001" in mp
        assert f"--input_path {src}/distorted/sparse/0" in iu
        assert "--output_type COLMAP" in iu
        # Undistorter output moved into sparse/0 (reference: convert.py:78-88).
        assert (src / "sparse" / "0").is_dir()

    def test_no_gpu_and_custom_binary(self, captured_system, tmp_path):
        src = tmp_path / "scene"
        (src / "sparse").mkdir(parents=True)
        convert_cli.main(
            ["-s", str(src), "--no_gpu", "--colmap_executable", "/opt/colmap"]
        )
        for cmd in captured_system[:2]:
            assert cmd.startswith('"/opt/colmap"')
            assert "use_gpu 0" in cmd

    def test_skip_matching_runs_undistort_only(self, captured_system, tmp_path):
        src = tmp_path / "scene"
        (src / "sparse").mkdir(parents=True)
        convert_cli.main(["-s", str(src), "--skip_matching"])
        assert len(captured_system) == 1
        assert "image_undistorter" in captured_system[0]

    def test_resize_writes_half_quarter_eighth(self, captured_system, tmp_path):
        from PIL import Image
        import numpy as np

        src = tmp_path / "scene"
        (src / "sparse").mkdir(parents=True)
        (src / "images").mkdir()
        Image.fromarray(
            np.zeros((32, 48, 3), np.uint8)
        ).save(src / "images" / "a.png")
        convert_cli.main(["-s", str(src), "--skip_matching", "--resize"])
        for factor, dirname in ((2, "images_2"), (4, "images_4"), (8, "images_8")):
            im = Image.open(src / dirname / "a.png")
            assert im.size == (48 // factor, 32 // factor)
