#!/bin/bash
# Wait for the TPU tunnel to come back, then run the full chip session.
# Designed to sit in a tmux window for hours: probes every ~4 min with a
# hard timeout (jax.devices() hangs forever when the tunnel is down).
# Usage: bash scripts/chip_wait_and_run.sh [quick]
set -u
cd "$(dirname "$0")/.."
PY=/opt/venv/bin/python
mkdir -p chip_logs
echo "$(date -u +%H:%M:%SZ) waiting for TPU tunnel..."
n=0
while true; do
    if timeout 90 $PY -c "import jax; jax.devices()" >/dev/null 2>&1; then
        echo "$(date -u +%H:%M:%SZ) TUNNEL UP after $n probes — starting chip session"
        bash scripts/chip_session.sh "${1:-}" 2>&1 | tee "chip_logs/auto_session_$(date -u +%Y%m%dT%H%M%SZ).log"
        echo "$(date -u +%H:%M:%SZ) chip session finished"
        exit 0
    fi
    n=$((n + 1))
    if [ $((n % 10)) -eq 0 ]; then
        echo "$(date -u +%H:%M:%SZ) still down ($n probes)"
    fi
    sleep 240
done
