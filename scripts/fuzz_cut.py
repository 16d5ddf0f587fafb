"""Randomized invariant fuzz for LOD cut selection (hierarchy/cut.py).

Over random hierarchies x random cameras (including inside the scene
box) x random granularity limits, asserts the properties the LOD system
rests on: granularity monotone along root->leaf paths, every cut
partitions the leaves exactly, interpolation weights in [0,1], and the
degenerate limits select all-leaves / the root. These are the same
invariants tests/test_hierarchy.py pins at fixed seeds; the fuzzer walks
the space. Run: /opt/venv/bin/python scripts/fuzz_cut.py [minutes]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def trial(seed: int) -> str:
    import jax.numpy as jnp

    from tests.test_hierarchy import build_random_hierarchy, subtree_leaves

    from h3dgs_tpu.hierarchy import cut as cut_lib
    from h3dgs_tpu.hierarchy.tree import N_CHILDREN, PARENT

    rng = np.random.default_rng(seed)
    n = int(rng.integers(2, 150))
    h, _ = build_random_hierarchy(n, seed=seed)
    cam = rng.uniform(-5, 5, 3).astype(np.float32)
    nodes, boxes = jnp.asarray(h.nodes), jnp.asarray(h.boxes)

    size = np.asarray(cut_lib.node_sizes(boxes, jnp.asarray(cam)))
    p = h.nodes[:, PARENT]
    has_p = p >= 0
    if not np.all(size[p[has_p]] >= size[has_p] - 1e-6):
        return f"MONOTONICITY seed={seed} n={n} cam={cam.tolist()}"

    leaves = sorted(np.nonzero(h.nodes[:, N_CHILDREN] == 0)[0])
    for limit in np.exp(rng.uniform(np.log(1e-7), np.log(1e3), 4)):
        c = cut_lib.expand_to_size(nodes, boxes,
                                   jnp.asarray(limit, jnp.float32),
                                   jnp.asarray(cam), max_cut=h.n_nodes)
        idx = np.asarray(c.indices)[np.asarray(c.valid)]
        if len(idx) != int(c.count):
            return f"COUNT seed={seed} limit={limit:g}"
        covered = sorted(sum((subtree_leaves(h, i) for i in idx), []))
        if covered != leaves:
            return f"PARTITION seed={seed} limit={limit:g} cam={cam.tolist()}"
        w = np.asarray(c.weights)[np.asarray(c.valid)]
        if not np.all((w >= -1e-6) & (w <= 1 + 1e-6)):
            return f"WEIGHTS seed={seed} limit={limit:g} " \
                   f"range=({w.min()},{w.max()})"
    return ""


def main(minutes: float = 20.0):
    import jax
    jax.config.update("jax_platforms", "cpu")
    deadline = time.time() + minutes * 60
    seed = int(time.time()) % 100000 + 500000
    trials = failures = 0
    while time.time() < deadline:
        msg = trial(seed)
        trials += 1
        if msg:
            failures += 1
            print(msg, flush=True)
        if trials % 25 == 0:
            print(f"[{trials} trials, {failures} failures]", flush=True)
        seed += 1
    print(f"DONE: {trials} trials, {failures} failures", flush=True)
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(float(sys.argv[1]) if len(sys.argv) > 1 else 20)
             else 0)
