"""Batch novel-view rendering CLI (reference: render.py:24-65): loads a
trained model at iteration N and renders every train/test view to PNGs
under <model>/{train,test}/ours_<it>/{renders,gt}."""

from __future__ import annotations

import os
import sys
from argparse import ArgumentParser

import jax
import jax.numpy as jnp
import numpy as np

from gsjax.cli.args import add_group, extract, get_combined_args
from gsjax.config import ModelConfig, PipelineConfig, RasterConfig
from gsjax.render.api import render
from gsjax.scene import Scene
from gsjax.utils.general import safe_state


def save_png(path: str, image) -> None:
    from PIL import Image

    arr = np.asarray(jnp.clip(image, 0.0, 1.0))
    arr = (arr * 255.0 + 0.5).astype(np.uint8).transpose(1, 2, 0)
    Image.fromarray(arr).save(path)


def render_set(
    model_path, name, iteration, banks, params, alive, sh_degree, bg, cfg
) -> "RasterConfig":
    """(reference: render.py:24-35)

    Returns the (possibly grown) RasterConfig: a frame whose true
    (gaussian, tile) pair count exceeds the static budget is re-rendered
    with the budget doubled to the next power of two — dropped pairs would
    silently degrade the output images.
    """
    import dataclasses

    from gsjax.config import pow2_budget

    render_path = os.path.join(model_path, name, f"ours_{iteration}", "renders")
    gts_path = os.path.join(model_path, name, f"ours_{iteration}", "gt")
    os.makedirs(render_path, exist_ok=True)
    os.makedirs(gts_path, exist_ok=True)

    jit_cache = {}

    def fn_for(width, height, cfg):
        key = (width, height, cfg)
        if key not in jit_cache:

            def _r(p, c, a, b, cfg=cfg):
                out = render(
                    p, c, active_sh_degree=sh_degree, bg_color=b, cfg=cfg, alive=a
                )
                return out.image, out.num_instances, out.num_rows

            jit_cache[key] = jax.jit(_r)
        return jit_cache[key]

    idx = 0
    for bank in banks:
        for i in range(bank.count):
            cam, gt = bank.pick(jnp.int32(i))
            while True:
                fn = fn_for(bank.width, bank.height, cfg)
                img, ninst, nrows = fn(params, cam, alive, bg)
                ninst, nrows = int(ninst), int(nrows)
                if ninst <= cfg.max_instances and nrows <= cfg.max_rows:
                    break
                jit_cache.clear()  # drop outgrown executables
                cfg = dataclasses.replace(
                    cfg,
                    max_instances=max(pow2_budget(ninst), cfg.max_instances),
                    max_rows=max(pow2_budget(nrows), cfg.max_rows),
                )
                print(
                    f"growing raster budgets to {cfg.max_instances}/"
                    f"{cfg.max_rows} (frame needs {ninst}/{nrows})"
                )
            save_png(os.path.join(render_path, f"{idx:05d}.png"), img)
            save_png(os.path.join(gts_path, f"{idx:05d}.png"), gt)
            idx += 1
    return cfg


def render_sets(
    model_cfg: ModelConfig,
    iteration: int,
    pipe_cfg: PipelineConfig,
    skip_train: bool,
    skip_test: bool,
) -> None:
    """(reference: render.py:37-49)"""
    scene = Scene(model_cfg, load_iteration=iteration, shuffle=False)
    bgv = [1.0, 1.0, 1.0] if model_cfg.white_background else [0.0, 0.0, 0.0]
    bg = jnp.asarray(bgv, jnp.float32)
    cfg = RasterConfig(interpret=jax.default_backend() != "tpu")
    sh_degree = scene.params.max_sh_degree

    if not skip_train:
        cfg = render_set(
            model_cfg.model_path,
            "train",
            scene.loaded_iter,
            scene.get_train_banks(),
            scene.params,
            scene.aux.alive,
            sh_degree,
            bg,
            cfg,
        )
    if not skip_test:
        render_set(
            model_cfg.model_path,
            "test",
            scene.loaded_iter,
            scene.get_test_banks(),
            scene.params,
            scene.aux.alive,
            sh_degree,
            bg,
            cfg,
        )


def main(argv=None) -> None:
    parser = ArgumentParser(description="Testing script parameters")
    add_group(parser, ModelConfig, fill_none=True)
    add_group(parser, PipelineConfig, fill_none=True)
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--quiet", action="store_true")
    args = get_combined_args(parser, argv)
    print("Rendering " + args.model_path)
    safe_state(args.quiet)
    render_sets(
        extract(ModelConfig, args),
        args.iteration,
        extract(PipelineConfig, args),
        args.skip_train,
        args.skip_test,
    )


if __name__ == "__main__":
    main()
