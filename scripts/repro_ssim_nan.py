"""Root-cause probe for the round-5 fused-SSIM training divergence.

The r5a city run (chip_logs/validate_city_r5_20260820T131338Z.log) went
loss=nan at iter ~2050 of chunk-0 train_single with the fused SSIM
kernel default-on; the artifacts were preserved at /tmp/h3dgs_city_r5fail.
This re-runs that exact phase twice — fused ON vs OFF — from the same
inputs. Outcomes:
  * fused=on nans, fused=off clean  -> kernel implicated (keep default off)
  * both nan                        -> scene/training-dynamics bug, not SSIM
  * both clean                      -> nondeterministic interaction; rerun

Run: PYTHONPATH=/root/.axon_site:. python scripts/repro_ssim_nan.py [on|off]
"""
from __future__ import annotations

import os
import subprocess
import sys

WORK = os.environ.get("CITY_WORK", "/tmp/h3dgs_city_r5fail")
ITERS = int(os.environ.get("REPRO_ITERS", 2500))


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "on"
    env = dict(os.environ)
    env["H3DGS_FUSED_SSIM"] = "1" if which == "on" else "0"
    out = os.path.join(WORK, f"output/repro_{which}")
    cmd = [
        sys.executable, "-m", "h3dgs_tpu.cli.train_single",
        "-s", f"{WORK}/camera_calibration/chunks/0_0",
        "-i", f"{WORK}/camera_calibration/aligned/images",
        "--model_path", out,
        "--scaffold_file",
        f"{WORK}/output/scaffold/point_cloud/iteration_3000",
        "--bounds_file", f"{WORK}/camera_calibration/chunks/0_0",
        "--alpha_masks", f"{WORK}/camera_calibration/aligned/masks",
        "--depths", f"{WORK}/camera_calibration/aligned/depths",
        "--skybox_locked", "--disable_viewer",
        "--iterations", str(ITERS), "--skybox_num", "2000",
        "--max_entries", "4194304", "--max_per_tile", "4096",
        "--position_lr_max_steps", "3000",
        "--densify_until_iter", "1500",
        "--densification_interval", "300",
    ]
    print("running:", " ".join(cmd), flush=True)
    rc = subprocess.run(cmd, env=env).returncode
    print("exit", rc, flush=True)


if __name__ == "__main__":
    main()
