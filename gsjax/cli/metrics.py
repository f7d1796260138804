"""Evaluation CLI (reference: metrics.py:24-103): reads rendered/gt image
pairs from <model>/{test}/ours_<it>/ and writes results.json +
per_view.json with SSIM / PSNR / LPIPS(vgg).

LPIPS requires pretrained VGG weights which cannot be downloaded in this
zero-egress environment (see gsjax/image_metrics.py); when unavailable it
is reported as null.
"""

from __future__ import annotations

import json
import os
import sys
from argparse import ArgumentParser
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from gsjax.image_metrics import lpips, lpips_available, psnr
from gsjax.train.loss import ssim


def read_images(renders_dir: Path, gt_dir: Path):
    """(reference: metrics.py:24-34)"""
    from PIL import Image

    renders, gts, names = [], [], []
    for fname in sorted(os.listdir(renders_dir)):
        render = np.asarray(Image.open(renders_dir / fname).convert("RGB"))
        gt = np.asarray(Image.open(gt_dir / fname).convert("RGB"))
        renders.append(render.transpose(2, 0, 1).astype(np.float32) / 255.0)
        gts.append(gt.transpose(2, 0, 1).astype(np.float32) / 255.0)
        names.append(fname)
    return renders, gts, names


def evaluate(model_paths: list[str]) -> None:
    """(reference: metrics.py:36-93)"""
    full_dict, per_view_dict = {}, {}
    for scene_dir in model_paths:
        try:
            print("Scene:", scene_dir)
            full_dict[scene_dir] = {}
            per_view_dict[scene_dir] = {}
            test_dir = Path(scene_dir) / "test"

            for method in os.listdir(test_dir):
                print("Method:", method)
                full_dict[scene_dir][method] = {}
                per_view_dict[scene_dir][method] = {}
                method_dir = test_dir / method
                renders, gts, names = read_images(
                    method_dir / "renders", method_dir / "gt"
                )
                ssims, psnrs, lpipss = [], [], []
                use_lpips = lpips_available()
                for r, g in zip(renders, gts):
                    rj, gj = jnp.asarray(r), jnp.asarray(g)
                    ssims.append(float(ssim(rj, gj)))
                    psnrs.append(float(psnr(rj, gj).mean()))
                    lpipss.append(
                        float(lpips(rj, gj, net_type="vgg").mean())
                        if use_lpips
                        else None
                    )
                mean = lambda xs: (
                    float(np.mean([x for x in xs if x is not None]))
                    if any(x is not None for x in xs)
                    else None
                )
                print(f"  SSIM : {mean(ssims):.7f}")
                print(f"  PSNR : {mean(psnrs):.7f}")
                if use_lpips:
                    print(f"  LPIPS: {mean(lpipss):.7f}")
                else:
                    print(
                        "  LPIPS: UNAVAILABLE — reported as null in "
                        "results.json. The reference always scores "
                        "LPIPS-vgg (metrics.py:71-74); this environment "
                        "has no network egress to fetch the pretrained "
                        "VGG16+linear-head weights. Export them once with "
                        "tools/export_lpips_weights.py on a machine with "
                        "torchvision, then set GSJAX_LPIPS_WEIGHTS=<npz>."
                    )
                full_dict[scene_dir][method].update(
                    {
                        "SSIM": mean(ssims),
                        "PSNR": mean(psnrs),
                        "LPIPS": mean(lpipss),
                    }
                )
                per_view_dict[scene_dir][method].update(
                    {
                        "SSIM": dict(zip(names, ssims)),
                        "PSNR": dict(zip(names, psnrs)),
                        "LPIPS": dict(zip(names, lpipss)),
                    }
                )
            with open(os.path.join(scene_dir, "results.json"), "w") as fp:
                json.dump(full_dict[scene_dir], fp, indent=True)
            with open(os.path.join(scene_dir, "per_view.json"), "w") as fp:
                json.dump(per_view_dict[scene_dir], fp, indent=True)
        except Exception as e:
            print(f"Unable to compute metrics for model {scene_dir}: {e}")


def main(argv=None) -> None:
    parser = ArgumentParser(description="Training script parameters")
    parser.add_argument(
        "--model_paths", "-m", required=True, nargs="+", type=str, default=[]
    )
    args = parser.parse_args(argv if argv is not None else sys.argv[1:])
    evaluate(args.model_paths)


if __name__ == "__main__":
    main()
