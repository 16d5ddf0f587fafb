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
