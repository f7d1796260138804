"""LPIPS architecture parity: gsjax's JAX net vs a torch twin of the
reference `lpipsPyTorch` graph, both loaded with the SAME random weights.

The reference net (reference: lpipsPyTorch/modules/networks.py:88-96,
lpips.py:31-37) is a torchvision VGG16 feature trunk tapped after each
block's last ReLU (1-based layer indices 4/9/16/23/30), channel-unit-
normalized (utils.py:6-8, eps ADDED to the norm), squared-diff'd, passed
through 1x1 bias-free linear heads, spatially averaged and summed over
taps. Input z-score is (x - mean) / std applied to the [0,1] image
directly (networks.py:44-60).

torchvision is absent in this image, so the twin rebuilds the VGG16
`features` Sequential explicitly — its architecture (conv3x3 pad1 + ReLU
per block, 2x2 maxpool between blocks, widths 64/128/256/512/512 with
2/2/3/3/3 convs) is fixed by the torchvision definition the reference
imports. Pretrained weights are unobtainable offline (networks.py's
models.vgg16(weights=...) and utils.py's torch.hub download both need
egress), which is exactly why this test pins the ARCHITECTURE with random
weights: identical weights in, identical distance out.
"""

from __future__ import annotations

import os

import numpy as np
import pytest
import torch
import torch.nn as nn

from gsjax.image_metrics import _SHIFT, _SCALE, _VGG_BLOCKS, lpips

SEED = 7


def _random_weights(rng):
    """Random conv/head weights in the gsjax npz layout."""
    weights = {}
    in_ch = 3
    idx = 0
    taps = []
    for out_ch, n_convs in _VGG_BLOCKS:
        for _ in range(n_convs):
            weights[f"conv{idx}.w"] = rng.normal(
                0, 0.2 / np.sqrt(in_ch), (out_ch, in_ch, 3, 3)
            ).astype(np.float32)
            weights[f"conv{idx}.b"] = rng.normal(0, 0.1, (out_ch,)).astype(
                np.float32
            )
            in_ch = out_ch
            idx += 1
        taps.append(out_ch)
    for i, ch in enumerate(taps):
        weights[f"lin{i}.w"] = np.abs(
            rng.normal(0, 0.05, (1, ch, 1, 1))
        ).astype(np.float32)
    return weights


class _TorchTwin(nn.Module):
    """The reference LPIPS graph, torchvision-free."""

    def __init__(self, weights):
        super().__init__()
        layers = []
        self.tap_indices = []
        idx = 0
        for _, n_convs in _VGG_BLOCKS:
            for _ in range(n_convs):
                w = torch.from_numpy(weights[f"conv{idx}.w"])
                b = torch.from_numpy(weights[f"conv{idx}.b"])
                conv = nn.Conv2d(w.shape[1], w.shape[0], 3, padding=1)
                with torch.no_grad():
                    conv.weight.copy_(w)
                    conv.bias.copy_(b)
                layers += [conv, nn.ReLU()]
                idx += 1
            # Tap AFTER the block's last ReLU (1-based indices 4/9/16/...).
            self.tap_indices.append(len(layers))
            layers.append(nn.MaxPool2d(2, 2))
        self.layers = nn.Sequential(*layers)
        self.heads = [
            torch.from_numpy(weights[f"lin{i}.w"]) for i in range(5)
        ]
        self.mean = torch.tensor(_SHIFT)[None, :, None, None]
        self.std = torch.tensor(_SCALE)[None, :, None, None]

    def _features(self, x):
        x = (x - self.mean) / self.std
        out = []
        for i, layer in enumerate(self.layers, 1):
            x = layer(x)
            if i in self.tap_indices:
                norm = torch.sqrt(torch.sum(x**2, dim=1, keepdim=True))
                out.append(x / (norm + 1e-10))
        return out

    @torch.no_grad()
    def forward(self, x, y):
        fx, fy = self._features(x), self._features(y)
        res = []
        for a, b, head in zip(fx, fy, self.heads):
            d = (a - b) ** 2
            res.append(
                nn.functional.conv2d(d, head).mean((2, 3), True)
            )
        return torch.sum(torch.cat(res, 0), 0, True)


class TestLpipsTorchParity:
    @pytest.fixture(scope="class")
    def setup(self, tmp_path_factory):
        rng = np.random.default_rng(SEED)
        weights = _random_weights(rng)
        path = tmp_path_factory.mktemp("lpips") / "weights.npz"
        np.savez(path, **weights)
        x = rng.uniform(0, 1, (1, 3, 48, 64)).astype(np.float32)
        y = np.clip(
            x + rng.normal(0, 0.08, x.shape).astype(np.float32), 0, 1
        )
        return weights, str(path), x, y

    def test_matches_reference_graph(self, setup):
        weights, path, x, y = setup
        twin = _TorchTwin(weights)
        expected = float(
            twin(torch.from_numpy(x), torch.from_numpy(y)).reshape(())
        )
        got = float(np.asarray(lpips(x[0], y[0], weights=path))[0])
        assert expected > 0
        np.testing.assert_allclose(got, expected, rtol=2e-4)

    def test_identical_images_zero(self, setup):
        _, path, x, _ = setup
        d = float(np.asarray(lpips(x[0], x[0], weights=path))[0])
        assert abs(d) < 1e-7


def test_metrics_cli_reports_lpips_end_to_end(tmp_path, monkeypatch):
    """The full metrics CLI path with a weights npz present: results.json
    must carry a finite non-null LPIPS (reference: metrics.py:71-74 always
    reports LPIPS-vgg). Pretrained values are unobtainable offline, so the
    npz here is the torch-twin random-weight set — this pins the
    plumbing (env-var discovery -> lpips() -> results.json), which is
    exactly what breaks silently when weights are absent."""
    import json

    from PIL import Image

    from gsjax.cli import metrics as metrics_cli

    rng = np.random.default_rng(SEED)
    wpath = tmp_path / "weights.npz"
    np.savez(wpath, **_random_weights(rng))
    monkeypatch.setenv("GSJAX_LPIPS_WEIGHTS", str(wpath))

    model = tmp_path / "model"
    for sub in ("renders", "gt"):
        os.makedirs(model / "test" / "ours_7" / sub)
    for i in range(2):
        a = rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
        b = np.clip(
            a.astype(np.int32) + rng.integers(-20, 20, a.shape), 0, 255
        ).astype(np.uint8)
        Image.fromarray(a).save(
            model / "test" / "ours_7" / "renders" / f"{i:05d}.png"
        )
        Image.fromarray(b).save(
            model / "test" / "ours_7" / "gt" / f"{i:05d}.png"
        )

    metrics_cli.main(["-m", str(model)])
    with open(model / "results.json") as f:
        results = json.load(f)
    val = results["ours_7"]["LPIPS"]
    assert val is not None and np.isfinite(val) and val > 0.0
    with open(model / "per_view.json") as f:
        pv = json.load(f)
    assert len(pv["ours_7"]["LPIPS"]) == 2


def test_check_weights_validates_spec(tmp_path):
    """check_lpips_weights accepts a spec-conformant npz (and the twin
    test weights ARE spec-conformant), rejects shape/dtype violations, and
    returns the file's sha256 (gsjax/weights/LPIPS_WEIGHTS_SPEC.md)."""
    import hashlib

    from gsjax.image_metrics import check_lpips_weights

    rng = np.random.default_rng(0)
    weights = _random_weights(rng)
    good = tmp_path / "good.npz"
    np.savez(good, **weights)
    digest = check_lpips_weights(str(good))
    assert digest == hashlib.sha256(good.read_bytes()).hexdigest()

    bad = dict(weights)
    bad["conv0.w"] = bad["conv0.w"][:32]  # wrong shape
    bad["lin0.w"] = bad["lin0.w"].astype(np.float64)  # wrong dtype
    del bad["conv12.b"]  # missing member
    bad_path = tmp_path / "bad.npz"
    np.savez(bad_path, **bad)
    with pytest.raises(ValueError) as e:
        check_lpips_weights(str(bad_path))
    msg = str(e.value)
    assert "conv0.w" in msg and "lin0.w" in msg and "conv12.b" in msg
