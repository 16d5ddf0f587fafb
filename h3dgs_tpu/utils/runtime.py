"""Deterministic run state (safe_state equivalent).

The reference seeds every RNG to 0 and timestamps stdout
(/root/reference/utils/general_utils.py:116-137). JAX RNG is explicit
(PRNGKey threaded through the loops), so this only covers numpy/python
seeding and the timestamped/quiet stdout wrapper.
"""
from __future__ import annotations

import random
import sys
from datetime import datetime


class _TimestampedOut:
    def __init__(self, old, silent: bool):
        self.old = old
        self.silent = silent

    def write(self, x):
        if self.silent:
            return
        if x.endswith("\n"):
            ts = datetime.now().strftime("%d/%m %H:%M:%S")
            x = x.replace("\n", f" [{ts}]\n")
        self.old.write(x)

    def flush(self):
        self.old.flush()


def safe_state(quiet: bool = False, seed: int = 0,
               timestamps: bool = False) -> None:
    import numpy as np
    random.seed(seed)
    np.random.seed(seed)
    if quiet or timestamps:
        sys.stdout = _TimestampedOut(sys.stdout, quiet)


def enable_compile_cache(path: str = "~/.cache/h3dgs_jax_cache") -> None:
    """Persistent XLA compilation cache for scripts/benches.

    On the tunneled TPU backend a cold rasterizer compile is 20-300 s;
    the measurement scripts recompile the same executables every run.
    Call this before the first computation (tests get the equivalent via
    conftest.py). Harmless no-op if the backend can't serialize."""
    import os

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
