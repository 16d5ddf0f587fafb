"""Single-frame pixel-band sharding: one view rendered across chips.

The interactive-rendering scaling axis (SURVEY.md §6: >=1080p hierarchy-cut
rendering on a v5e-8). Each device projects the full Gaussian set
(replicated — projection is a few ms and avoids any gather of a culled
set), shifts the screen-space means by its band's row offset, and runs the
normal tiled blend on an H/n-tall viewport. With the band height a
multiple of the tile size, every band's tile grid coincides with the
full-frame grid, so the result is the full-frame render bit-for-bit (same
per-tile entry order) — verified in tests/test_parallel.py.

Communication: none during the blend (tiles are independent); the only
collective is the implicit all-gather XLA inserts if the caller asks for a
replicated image, plus a pmax over the per-band entry-budget need. This is
the TPU replacement for "one CUDA device rasterizes the frame" — bands are
the natural SPMD axis of splatting, and ICI only carries final pixels.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from ..ops.projection import project_gaussians
from ..ops.rasterize import RasterizeConfig, blend_auto
from ..scene.camera import Camera


def render_banded(means3d, scales, quats, opacities, shs, camera: Camera,
                  sh_degree: int, bg_color, mesh: Mesh, axis: str,
                  scale_modifier: float = 1.0,
                  config: RasterizeConfig = RasterizeConfig(),
                  gather: bool = True):
    """Render one view with horizontal pixel bands sharded over ``axis``.

    All Gaussian inputs replicated; returns the same dict as
    ops.rasterize.rasterize (image fields replicated when ``gather`` else
    band-sharded along rows). The per-device entry budget is
    ``config.max_entries`` — size it for one band, not the frame.
    """
    n_bands = mesh.shape[axis]
    tile = config.tile
    hb = -(-camera.height // (n_bands * tile)) * tile   # tile-aligned band

    def body(means, scales_, quats_, opac_, shs_, bg):
        proj = project_gaussians(means, scales_, quats_, opac_, shs_,
                                 camera, sh_degree, scale_modifier)
        y0 = (jax.lax.axis_index(axis) * hb).astype(proj.means2d.dtype)
        proj_b = proj._replace(
            means2d=proj.means2d - jnp.stack(
                [jnp.zeros_like(y0), y0])[None, :])
        img, invd, ft, need, _trunc, _raw, _nbwd = blend_auto(
            proj_b, hb, camera.width, bg, config)
        need = jax.lax.pmax(need, axis)
        return (img, invd, ft, proj.radius,
                jnp.asarray(need)[None])

    spec_in = (P(), P(), P(), P(), P(), P())
    spec_out = (P(None, axis, None), P(None, axis, None), P(axis, None),
                P(), P(axis))
    banded = shard_map(body, mesh=mesh, in_specs=spec_in,
                       out_specs=spec_out, check_vma=False)
    img, invd, ft, radius, need = banded(
        jnp.asarray(means3d), jnp.asarray(scales), jnp.asarray(quats),
        jnp.asarray(opacities), jnp.asarray(shs), jnp.asarray(bg_color))
    # Trim the tile padding of the last band.
    img = img[:, :camera.height, :]
    invd = invd[:, :camera.height, :]
    ft = ft[:camera.height, :]
    out = {
        "render": img,
        "invdepth": invd,
        "final_transmittance": ft,
        "radii": radius,
        "visibility_filter": radius > 0,
        "n_duplicates": need[0],
    }
    if gather:
        rep = jax.sharding.NamedSharding(mesh, P())
        out = {k: jax.lax.with_sharding_constraint(v, rep)
               for k, v in out.items()}
    return out
