"""Probe XLA scatter-add formulations for the gradient scatter (v5e).

The [D,16] row scatter-add is the single biggest op of the backward
(34 ms at D=2M, ~16 ns/row). Probes whether any lowering hint or
reformulation beats it. Run:
  PYTHONPATH=.:scripts /opt/venv/bin/python scripts/profile_scatter.py
"""
from __future__ import annotations

from profile_binning import item

import numpy as np


def main():
    import jax
    from h3dgs_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()

    import jax.numpy as jnp

    n = 200_000
    d = 1 << 21
    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.normal(size=(d, 16)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, size=d).astype(np.int32))
    idx_sorted = jnp.sort(idx)

    item("add random (baseline)",
         lambda r: jnp.zeros((n + 1, 16), jnp.float32).at[idx].add(
             r, mode="drop"), (rows,))
    item("add sorted + hint",
         lambda r: jnp.zeros((n + 1, 16), jnp.float32).at[idx_sorted].add(
             r, mode="drop", indices_are_sorted=True), (rows,))
    item("add random D/2",
         lambda r: jnp.zeros((n + 1, 16), jnp.float32).at[idx[:d // 2]].add(
             r[:d // 2], mode="drop"), (rows,))
    item("add random [D,8]x1",
         lambda r: jnp.zeros((n + 1, 8), jnp.float32).at[idx].add(
             r[:, :8], mode="drop"), (rows,))
    item("add random [D,32] wide",
         lambda r: jnp.zeros((n + 1, 32), jnp.float32).at[idx[:d // 2]].add(
             jnp.concatenate([r[:d // 2], r[d // 2:]], axis=1),
             mode="drop"), (rows,))
    # lax.scatter_add with explicit dnums (update window = the 16 lanes).
    def lax_scatter(r):
        dnums = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1,), inserted_window_dims=(0,),
            scatter_dims_to_operand_dims=(0,))
        return jax.lax.scatter_add(
            jnp.zeros((n + 1, 16), jnp.float32), idx[:, None], r, dnums,
            mode=jax.lax.GatherScatterMode.FILL_OR_DROP)
    item("lax.scatter_add dnums", lax_scatter, (rows,))
    # segment_sum on sorted ids (lowers to scatter-add; sanity).
    item("segment_sum sorted",
         lambda r: jax.ops.segment_sum(r, idx_sorted, num_segments=n + 1,
                                       indices_are_sorted=True), (rows,))
    # bincount-style: one scatter per 4-column group (fewer bytes/row).
    item("add random [D,4]",
         lambda r: jnp.zeros((n + 1, 4), jnp.float32).at[idx].add(
             r[:, :4], mode="drop"), (rows,))


if __name__ == "__main__":
    main()
