#!/bin/bash
# Follow-up for a chip_session run whose scripts/*.py items failed on
# import (venv without the package): re-run the missed measurements in
# judge-priority order. Usage: bash scripts/chip_followup.sh [quick]
set -u
cd "$(dirname "$0")/.."
PY=/opt/venv/bin/python
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
LOGS=chip_logs
mkdir -p "$LOGS"
STAMP=$(date -u +%Y%m%dT%H%M%SZ)
QUICK=${1:-}
AB_ITERS=8; VAL_ITERS=5000
if [ "$QUICK" = "quick" ]; then AB_ITERS=4; VAL_ITERS=1500; fi

run() {
    local name=$1 tmo=$2; shift 2
    local log="$LOGS/${name}_${STAMP}.log"
    echo "-- $name (timeout ${tmo}s) -> $log"
    if timeout "$tmo" "$@" >"$log" 2>&1; then echo "   OK"; else
        echo "   FAILED/TIMEOUT (rc=$?) — continuing; see $log"; fi
    tail -25 "$log" | sed 's/^/   | /'
}

# Round-3 judge-priority order: documented-regime scale validation
# (VERDICT r2 item 4), render fps (item 3), the r3 A/B (items 1-2),
# stage + glue profiles. Each item is timeout-bound and failures
# continue (one tunnel 500 must not kill the agenda).
export PYTHONPATH="$PWD/scripts:$PYTHONPATH"
run validate_scale 6000 $PY scripts/validate_tpu_scale.py $VAL_ITERS
run bench_render 1800 $PY scripts/bench_render.py
run ab_r03b 3600 $PY scripts/ab_r03b.py $AB_ITERS
run profile_stages 2400 $PY scripts/profile_stages.py
run profile_binning 2400 $PY scripts/profile_binning.py
run profile_scatter 1800 $PY scripts/profile_scatter.py
echo "== done ($STAMP) =="
