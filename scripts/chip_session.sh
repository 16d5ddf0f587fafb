#!/bin/bash
# One-shot capture of every pending on-chip measurement. The TPU tunnel
# has multi-hour outages (see axon notes in README); when it comes back —
# possibly briefly — this runs the full round-3 measurement agenda
# unattended and logs everything under chip_logs/.
#
# Order matters: bench.py is the judged artifact; ab_r03b is the
# decision-maker (grad-gated A/B of the open levers); the rest are
# independent.
#
# Usage: bash scripts/chip_session.sh [quick]
#   quick = fewer iters everywhere (for a short uptime window)

set -u
cd "$(dirname "$0")/.."
PY=/opt/venv/bin/python
# The venv does not have the package installed; scripts/*.py import
# h3dgs_tpu from the repo root.
export PYTHONPATH="$PWD:$PWD/scripts${PYTHONPATH:+:$PYTHONPATH}"
LOGS=chip_logs
mkdir -p "$LOGS"
STAMP=$(date -u +%Y%m%dT%H%M%SZ)

QUICK=${1:-}
AB_ITERS=8; VAL_ITERS=5000; BENCH_ITERS=10
if [ "$QUICK" = "quick" ]; then
    AB_ITERS=4; VAL_ITERS=1000; BENCH_ITERS=5
fi

echo "== chip_session $STAMP (quick='$QUICK') =="

# 0. Tunnel probe — jax.devices() hangs forever when the tunnel is down,
#    so everything runs under timeout.
if ! timeout 120 $PY -c "import jax; d=jax.devices()[0]; print('device:', d.device_kind)"; then
    echo "TUNNEL DOWN — aborting (nothing written)"
    exit 2
fi

run() { # run <name> <timeout_s> <cmd...>
    local name=$1 tmo=$2; shift 2
    local log="$LOGS/${name}_${STAMP}.log"
    echo "-- $name (timeout ${tmo}s) -> $log"
    if timeout "$tmo" "$@" >"$log" 2>&1; then
        echo "   OK"
    else
        echo "   FAILED/TIMEOUT (rc=$?) — continuing; see $log"
    fi
    tail -25 "$log" | sed 's/^/   | /'
}

# 1. The headline bench FIRST (it self-tunes over the lever combos and
#    is the judged artifact — if the tunnel window closes early, this is
#    the measurement that must not be lost).
run bench 3000 env BENCH_ITERS=$BENCH_ITERS $PY bench.py

# 2. Grad-gated A/B of the open round-3 levers (rows_layout etc.).
#    Promote the winner to RasterizeConfig defaults by hand after
#    reading the log (SOL.md runbook).
run ab_r03b 3600 $PY scripts/ab_r03b.py $AB_ITERS

# 3. Stage-level breakdown at the current defaults (updates SOL.md table).
run profile_stages 2400 $PY scripts/profile_stages.py

# 3b. Binning sub-op profile (per-item crash isolation) + the scatter
#     formulation ladder.
run profile_binning 2400 $PY scripts/profile_binning.py
run profile_scatter 1800 $PY scripts/profile_scatter.py

# 4. Hierarchy-cut render fps (interactive-rate agenda, VERDICT item 5).
run bench_render 2400 $PY scripts/bench_render.py

# 5. Realistic-scale training validation (VERDICT item 4): 150k Gaussians,
#    512x910, densification growth, >=VAL_ITERS iters -> VALIDATION_SCALE.json.
run validate_scale 5400 $PY scripts/validate_tpu_scale.py $VAL_ITERS

# 6. Post-optimization on-chip validation (hierarchy cut training).
run validate_post 2400 $PY scripts/validate_tpu_post.py

# 7. Two-chunk city-block E2E through the full CLI pipeline (VERDICT r2
#    item 5); writes docs/city/metrics.json.
run validate_city 7200 env PYTHONPATH="$PWD:$PWD/tests:$PYTHONPATH" $PY scripts/validate_city.py

echo "== done. Logs in $LOGS/*_${STAMP}.log =="
echo "Next: read ab_r03b log; if a lever combo wins AND passes the grad"
echo "cross-check, promote it to RasterizeConfig defaults, re-run bench.py,"
echo "update SOL.md's ledger + README perf figures, commit."
