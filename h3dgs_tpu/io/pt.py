"""Raw-tensor checkpoint format for >8M-point scenes.

Byte-compatible with the reference's ``save_pt``/``create_from_pt``
(/root/reference/scene/gaussian_model.py:401-489): six ``done_*.pt``
torch tensor dumps plus a packed ``point_cloud.bin`` =
int32 count | xyz f32 | cat(f_dc, f_rest) f32 | opacity f32 |
scaling f32 | rotation f32 — the layout the SIBR tooling consumes.
Torch is used purely as a (de)serializer; arrays stay numpy.
"""
from __future__ import annotations

import os
import struct

import numpy as np


def save_pt(path: str, *, xyz, features_dc, features_rest, opacity,
            scaling, rotation) -> None:
    import torch

    os.makedirs(path, exist_ok=True)
    arrs = dict(xyz=xyz, dc=features_dc, rest=features_rest,
                opacity=opacity, scaling=scaling, rotation=rotation)
    arrs = {k: np.ascontiguousarray(v, np.float32)
            for k, v in arrs.items()}
    for name, arr in arrs.items():
        torch.save(torch.from_numpy(arr),
                   os.path.join(path, f"done_{name}.pt"))
    with open(os.path.join(path, "point_cloud.bin"), "wb") as f:
        f.write(struct.pack("i", int(arrs["xyz"].shape[0])))
        f.write(arrs["xyz"].tobytes())
        f.write(np.concatenate([arrs["dc"], arrs["rest"]],
                               axis=1).astype(np.float32).tobytes())
        f.write(arrs["opacity"].tobytes())
        f.write(arrs["scaling"].tobytes())
        f.write(arrs["rotation"].tobytes())


def load_pt(path: str) -> dict:
    """Read ``done_*.pt`` dumps -> dict of float32 numpy arrays."""
    import torch

    out = {}
    names = dict(xyz="xyz", dc="features_dc", rest="features_rest",
                 opacity="opacity", scaling="scaling", rotation="rotation")
    for short, key in names.items():
        t = torch.load(os.path.join(path, f"done_{short}.pt"),
                       map_location="cpu", weights_only=True)
        out[key] = np.asarray(t.detach(), np.float32)
    return out
