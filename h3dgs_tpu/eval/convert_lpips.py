"""Convert LPIPS(vgg) weights to the .npz format eval/metrics.py loads.

Run on a machine WITH network access / cached weights (this build
environment has neither):

  python -m h3dgs_tpu.eval.convert_lpips --out lpips_vgg.npz

Then point H3DGS_LPIPS_WEIGHTS (or metrics.lpips(weights_path=...)) at the
file. Layout: conv{i}.weight/.bias for the 13 VGG16 conv layers (OIHW),
lin{0..4}.weight for the LPIPS linear heads ([1, C, 1, 1], non-negative).
Sources: torchvision vgg16(weights=IMAGENET1K_V1) features + the lpips
package's vgg.pth linear heads (same tensors the reference's lpipsPyTorch
downloads, /root/reference/lpipsPyTorch/modules/networks.py).
"""
from __future__ import annotations

import argparse

import numpy as np


def convert(out_path: str) -> None:
    import torch
    try:
        import torchvision
    except ImportError as e:
        raise SystemExit(
            "torchvision is required to convert LPIPS weights; run this "
            "on a machine that has it installed") from e

    vgg = torchvision.models.vgg16(
        weights=torchvision.models.VGG16_Weights.IMAGENET1K_V1).features
    arrays = {}
    li = 0
    for layer in vgg:
        if isinstance(layer, torch.nn.Conv2d):
            arrays[f"conv{li}.weight"] = layer.weight.detach().numpy()
            arrays[f"conv{li}.bias"] = layer.bias.detach().numpy()
            li += 1
    assert li == 13, f"expected 13 VGG16 convs, found {li}"

    import lpips as lpips_pkg
    net = lpips_pkg.LPIPS(net="vgg")
    for i, lin in enumerate(net.lins):
        arrays[f"lin{i}.weight"] = lin.model[-1].weight.detach().numpy()

    # Checksum pin: torchvision names the checkpoint by its sha256 prefix
    # (vgg16-397923af.pth) and verifies the digest on download, so this
    # tag certifies the exact upstream tensors. metrics._load_weights
    # warns when an .npz lacks it (random/test weights).
    from .metrics import LPIPS_SOURCE_TAG, validate_weights_layout
    validate_weights_layout(arrays)
    arrays["source_tag"] = np.asarray(LPIPS_SOURCE_TAG)

    np.savez(out_path, **arrays)
    print(f"LPIPS weights -> {out_path} (source {LPIPS_SOURCE_TAG})")


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="lpips_vgg.npz")
    convert(p.parse_args().out)
