"""Pytest config: force an 8-virtual-device CPU platform for tests.

Tests exercise multi-chip sharding on an emulated mesh per the build plan
(SURVEY.md §4): XLA_FLAGS=--xla_force_host_platform_device_count=8.

Note: this container's sitecustomize imports jax and registers the axon/TPU
PJRT plugin at interpreter start, so env vars set here are too late —
override via jax.config instead (safe as long as no computation ran yet).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: most of the suite's wall-clock is
# compile time for parametrized kernel variants, identical between runs.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/h3dgs_jax_test_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# Build the native C++ library up front (VERDICT r2 weak-6: the C++/numpy
# parity tests must not silently skip just because nobody ran make). Skips
# only when no compiler is available; build failures surface loudly.
import shutil  # noqa: E402
import subprocess  # noqa: E402

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "native")
if shutil.which("g++") and os.path.isdir(_NATIVE_DIR):
    _r = subprocess.run(["make", "-C", _NATIVE_DIR, "-q"],
                        capture_output=True)
    if _r.returncode != 0:  # out of date
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
