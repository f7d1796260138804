"""Export LPIPS-vgg weights to the .npz gsjax consumes.

gsjax's LPIPS (gsjax/image_metrics.py) mirrors the reference lpipsPyTorch
package (reference: lpipsPyTorch/modules/networks.py:12-96) but this
training environment has no network egress and no torchvision, so the
pretrained VGG16 features + richzhang 1x1 linear heads must be exported
ONCE on a machine that has them:

    pip install torch torchvision
    python tools/export_lpips_weights.py --out gsjax/weights/lpips_vgg.npz

then ship the npz alongside the repo (or point GSJAX_LPIPS_WEIGHTS at it).
metrics.py reports LPIPS as null when the weights are absent.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

# VGG16 feature-extractor conv layers used by LPIPS (through relu5_3) and
# the 0..12 numbering gsjax's _vgg_features expects.
VGG16_CONV_INDICES = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]

LIN_URL = (
    "https://raw.githubusercontent.com/richzhang/PerceptualSimilarity/"
    "master/lpips/weights/v0.1/vgg.pth"
)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="gsjax/weights/lpips_vgg.npz")
    args = parser.parse_args()

    import torch
    import torchvision

    vgg = torchvision.models.vgg16(
        weights=torchvision.models.VGG16_Weights.IMAGENET1K_V1
    ).features

    out: dict[str, np.ndarray] = {}
    for i, idx in enumerate(VGG16_CONV_INDICES):
        conv = vgg[idx]
        out[f"conv{i}.w"] = conv.weight.detach().numpy()
        out[f"conv{i}.b"] = conv.bias.detach().numpy()

    lin_path = torch.hub.load_state_dict_from_url(
        LIN_URL, progress=True, map_location="cpu"
    )
    for i in range(5):
        out[f"lin{i}.w"] = (
            lin_path[f"lin{i}.model.1.weight"].detach().numpy()
        )

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez(args.out, **out)
    print(f"wrote {args.out} ({len(out)} arrays)")


if __name__ == "__main__":
    main()
