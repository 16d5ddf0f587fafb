"""Camera pytree used by the renderer and training steps.

Equivalent in role to the reference's ``Camera``/``MiniCam`` records
(/root/reference/scene/cameras.py:23-111) but designed for jit: the matrix /
scalar fields are array leaves (so one compiled step serves every camera at a
given resolution) while height/width are static aux data (XLA needs static
image shapes).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import numpy as np

from ..utils import camera_math


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """A single view. Array fields are leaves; height/width are static."""
    view: jax.Array          # [4,4] world->camera (column-vector convention)
    full_proj: jax.Array     # [4,4] proj @ view
    cam_center: jax.Array    # [3] world-space camera position
    tanfovx: jax.Array       # scalar
    tanfovy: jax.Array       # scalar
    height: int = dataclasses.field(metadata=dict(static=True))
    width: int = dataclasses.field(metadata=dict(static=True))

    @property
    def focal_x(self):
        return self.width / (2.0 * self.tanfovx)

    @property
    def focal_y(self):
        return self.height / (2.0 * self.tanfovy)


def make_camera(R: np.ndarray, T: np.ndarray, fovx: float, fovy: float,
                width: int, height: int, primx: float = 0.5, primy: float = 0.5,
                znear: float = 0.01, zfar: float = 100.0,
                trans=np.array([0.0, 0.0, 0.0]), scale: float = 1.0) -> Camera:
    """Build a Camera from COLMAP-style extrinsics.

    znear/zfar defaults match the reference (scene/cameras.py:89-90).
    """
    view = camera_math.world_to_view(R, T, trans, scale)
    proj = camera_math.projection_matrix(znear, zfar, fovx, fovy, primx, primy)
    full_proj = (proj @ view).astype(np.float32)
    center = camera_math.camera_center_from_view(view)
    return Camera(
        view=np.asarray(view, np.float32),
        full_proj=full_proj,
        cam_center=center,
        tanfovx=np.float32(math.tan(fovx * 0.5)),
        tanfovy=np.float32(math.tan(fovy * 0.5)),
        height=int(height),
        width=int(width),
    )


def look_at_camera(eye, target, up=(0.0, 1.0, 0.0), fovx: float = 1.0,
                   fovy: Optional[float] = None, width: int = 64,
                   height: int = 64, **kw) -> Camera:
    """Convenience constructor for tests/synthetic scenes."""
    eye = np.asarray(eye, np.float64)
    target = np.asarray(target, np.float64)
    up = np.asarray(up, np.float64)
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right = right / np.linalg.norm(right)
    down = np.cross(fwd, right)
    # Camera looks down +z in camera space (the projection assumes z > 0).
    R_w2c = np.stack([right, down, fwd], axis=0)
    t = -R_w2c @ eye
    # make_camera expects R = camera-to-world rotation (R_w2c.T).
    if fovy is None:
        fovy = 2.0 * math.atan(math.tan(fovx / 2.0) * height / width)
    return make_camera(R_w2c.T, t, fovx, fovy, width, height, **kw)
