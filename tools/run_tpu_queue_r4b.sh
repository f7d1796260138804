#!/bin/bash
# Round-4b TPU measurement queue: primitive floors + binning sub-stage
# decomposition, fired the moment the tunnel waiter marks /tmp/tpu_alive.
# Serial (two concurrent TPU clients wedge the tunnel).
set -u
cd /root/repo
OUT=artifacts/tpu_queue_r4
mkdir -p "$OUT"

while [ ! -f /tmp/tpu_alive ]; do sleep 20; done
echo "[queue-r4b] TPU alive; starting at $(date -u +%H:%M:%S)"

run() {
  local name="$1"; shift
  echo "[queue-r4b] === $name: $* (start $(date -u +%H:%M:%S))"
  timeout "$QTIMEOUT" python -u "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  echo "[queue-r4b] === $name done rc=$rc ($(date -u +%H:%M:%S))"
  tail -n 3 "$OUT/$name.log" | sed "s/^/[$name] /"
  if [ $rc -ne 0 ]; then sleep 120; fi
}

QTIMEOUT=2400 run prims2       tools/probe_prims.py
QTIMEOUT=2400 run binning_prof tools/profile_binning.py
echo "[queue-r4b] complete $(date -u +%H:%M:%S)"
