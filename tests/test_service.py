"""Hierarchy render service: tau-budgeted rendering (SIBR viewer role)."""
import os

import numpy as np

from h3dgs_tpu.hierarchy import tree as tree_lib
from h3dgs_tpu.hierarchy.io import write_hier
from h3dgs_tpu.ops.rasterize import RasterizeConfig
from h3dgs_tpu.scene.camera import look_at_camera
from h3dgs_tpu.viewer.service import HierarchyRenderer

from .utils import random_scene

CFG = RasterizeConfig(max_entries=1 << 14, max_per_tile=256, chunk=16)


def test_budgeted_rendering(tmp_path):
    n = 150
    means, scales, quats, opac, shs = random_scene(n, 0, sh_degree=1)
    h = tree_lib.build_hierarchy(means, shs, opac, np.log(scales), quats)
    path = os.path.join(tmp_path, "merged.hier")
    write_hier(path, h)

    cam = look_at_camera(eye=(0, -0.5, -18.0), target=(0, 0, 0), fovx=1.1,
                         width=64, height=48)

    # Unconstrained: fine cut.
    r_big = HierarchyRenderer(path, budget=h.n_nodes, sh_degree=1,
                              raster_cfg=CFG)
    img_big, stats_big = r_big.render(cam, tau=0.0)
    assert img_big.shape == (48, 64, 3) and img_big.dtype == np.uint8
    assert stats_big["cut_size"] == n  # tau=0 at distance -> all leaves

    # Tight budget: tau auto-raised until the cut fits.
    budget = 40
    r_small = HierarchyRenderer(path, budget=budget, sh_degree=1,
                                raster_cfg=CFG)
    img_small, stats_small = r_small.render(cam, tau=0.0)
    assert stats_small["cut_size"] <= budget
    assert stats_small["limit"] > stats_big["limit"]
    # Budgeted image still approximates the fine one.
    err = np.abs(img_big.astype(np.float32)
                 - img_small.astype(np.float32)).mean() / 255.0
    assert err < 0.1, err
