"""Interactive hierarchy rendering service.

TPU-side counterpart of the reference's SIBR hierarchy viewer
(/root/reference/README.md:222-257): renders the merged hierarchy at a
target granularity tau, auto-raising tau when the view-adaptive cut
exceeds a splat budget (the viewer's VRAM-budget behavior,
README.md:233-235). Exposes:

  * HierarchyRenderer — jitted tau-budgeted rendering of arbitrary cameras
    (one compilation per resolution), usable programmatically;
  * serve() — the network_gui TCP protocol loop, so the remote viewer can
    orbit a merged hierarchy without a training session;
  * orbit() — offline fly-through rendering to PNG frames.
"""
from __future__ import annotations

import functools
import math
import os
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..hierarchy import cut as cut_lib
from ..hierarchy.io import read_hier
from ..model.init import state_from_hierarchy
from ..ops.rasterize import RasterizeConfig
from ..scene.camera import Camera, look_at_camera
from ..train.post_step import render_cut


class HierarchyRenderer:
    def __init__(self, hierarchy_path: str, scaffold_dir: str = "",
                 sh_degree: int = 3, budget: int = 1 << 20,
                 raster_cfg: Optional[RasterizeConfig] = None,
                 white_background: bool = False, n_bands: int = 0):
        self.h = read_hier(hierarchy_path)
        self.state, _ = state_from_hierarchy(self.h, scaffold_dir,
                                             max_sh_degree=sh_degree)
        self.sh_degree = sh_degree
        self.nodes = jnp.asarray(self.h.nodes)
        self.boxes = jnp.asarray(self.h.boxes)
        self.budget = min(budget, self.h.n_nodes)
        self.raster_cfg = raster_cfg or RasterizeConfig(
            max_entries=1 << 21, max_per_tile=4096)
        self.bg = (jnp.ones(3, jnp.float32) if white_background
                   else jnp.zeros(3, jnp.float32))
        # Pixel-band sharding across local devices for single-frame
        # latency (n_bands=0: all devices; 1: single-device).
        self.mesh = self.band_axis = None
        avail = len(jax.devices())
        n_bands = avail if n_bands == 0 else min(n_bands, avail)
        if n_bands > 1:
            from ..parallel import sharding as shard_lib
            self.mesh = shard_lib.make_mesh(n_data=1, n_tile=n_bands)
            self.band_axis = shard_lib.TILE_AXIS

        @jax.jit
        def cut_size(limit, cam_center):
            in_cut, _, _ = cut_lib.cut_mask(self.nodes, self.boxes, limit,
                                            cam_center)
            return jnp.sum(in_cut.astype(jnp.int32))

        self._cut_size = cut_size
        self._render_jit = {}  # one compilation per (H, W)

    def _render_fn(self, height: int, width: int):
        key = (height, width)
        if key not in self._render_jit:
            @jax.jit
            def run(camera, limit):
                out = render_cut(self.state, self.nodes, self.boxes,
                                 camera, limit, self.sh_degree, self.bg,
                                 self.raster_cfg, max_cut=self.budget,
                                 mesh=self.mesh, band_axis=self.band_axis)
                return out["render"], out["cut"].count
            self._render_jit[key] = run
        return self._render_jit[key]

    def fit_limit(self, camera: Camera, tau: float) -> float:
        """Smallest granularity >= tau whose cut fits the budget (the
        viewer's budget behavior: raise tau until the scene fits)."""
        limit = cut_lib.pixel_limit(tau, float(camera.tanfovx),
                                    camera.width)
        for _ in range(16):
            if int(self._cut_size(jnp.asarray(limit, jnp.float32),
                                  camera.cam_center)) <= self.budget:
                return limit
            limit *= 1.5
        return limit

    def render(self, camera: Camera, tau: float = 3.0):
        """Returns (rgb [H,W,3] uint8, stats dict)."""
        limit = self.fit_limit(camera, tau)
        render, count = self._render_fn(camera.height, camera.width)(
            camera, jnp.asarray(limit, jnp.float32))
        img = np.asarray(render).clip(0, 1)
        return ((img.transpose(1, 2, 0) * 255).astype(np.uint8),
                {"cut_size": int(count), "limit": limit})


def orbit(renderer: HierarchyRenderer, out_dir: str, n_frames: int = 60,
          radius: float = 50.0, height: float = -10.0,
          center=(0.0, 0.0, 0.0), tau: float = 6.0,
          width: int = 1200, height_px: int = 675) -> None:
    """Offline fly-through: circle the scene center, save PNG frames."""
    from PIL import Image
    os.makedirs(out_dir, exist_ok=True)
    for i, a in enumerate(np.linspace(0, 2 * math.pi, n_frames,
                                      endpoint=False)):
        eye = (center[0] + radius * math.sin(a), center[1] + height,
               center[2] - radius * math.cos(a))
        cam = look_at_camera(eye=eye, target=center, fovx=1.2,
                             width=width, height=height_px)
        img, stats = renderer.render(cam, tau)
        Image.fromarray(img).save(
            os.path.join(out_dir, f"frame_{i:04d}.png"))
        print(f"frame {i}: cut={stats['cut_size']}", flush=True)


def serve(renderer: HierarchyRenderer, ip: str = "127.0.0.1",
          port: int = 6009, tau: float = 3.0) -> None:
    """Serve the network_gui protocol on a merged hierarchy (blocking)."""
    import time

    from .network_gui import NetworkGUI

    gui = NetworkGUI(ip, port)
    print(f"hierarchy render service on {ip}:{port}", flush=True)
    while True:
        if gui.conn is None:
            gui._try_connect()
            time.sleep(0.05)
            continue
        try:
            msg = gui._read_msg()
            cam = gui._camera_from_msg(msg)
            payload = None
            if cam is not None:
                img, _ = renderer.render(cam, tau)
                payload = memoryview(img.tobytes())
            gui._send(payload)
        except Exception:
            # Malformed message / version-mismatched client: drop the
            # connection, keep serving (a port scan must not kill the
            # service).
            import traceback
            traceback.print_exc()
            try:
                gui.conn.close()
            except OSError:
                pass
            gui.conn = None


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--hierarchy", required=True)
    p.add_argument("--scaffold_file", default="")
    p.add_argument("--budget", type=int, default=1 << 20,
                   help="max splats per frame (the viewer's VRAM budget)")
    p.add_argument("--tau", type=float, default=3.0)
    p.add_argument("--ip", default="127.0.0.1")
    p.add_argument("--port", type=int, default=6009)
    p.add_argument("--orbit_dir", default="",
                   help="render an offline orbit instead of serving")
    p.add_argument("--n_frames", type=int, default=60)
    p.add_argument("--radius", type=float, default=50.0)
    p.add_argument("--width", type=int, default=1200)
    p.add_argument("--n_bands", type=int, default=0,
                   help="pixel bands sharded across devices "
                        "(0 = all local devices, 1 = single device)")
    a = p.parse_args(argv)
    r = HierarchyRenderer(a.hierarchy, a.scaffold_file, budget=a.budget,
                          n_bands=a.n_bands)
    if a.orbit_dir:
        orbit(r, a.orbit_dir, n_frames=a.n_frames, radius=a.radius,
              tau=a.tau, width=a.width,
              height_px=int(a.width * 9 / 16))
    else:
        serve(r, a.ip, a.port, a.tau)


if __name__ == "__main__":
    main()
