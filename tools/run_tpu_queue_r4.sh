#!/bin/bash
# Round-4 TPU measurement queue, phase 1: verify drive -> headline bench ->
# the 15k/96-view quality v2 run (VERDICT r3 items #2 and #3). Serial — two
# concurrent TPU clients wedge the tunnel. Phase-2 perf benches (fps,
# trained-checkpoint, mesh overhead) run interactively after the perf work
# lands, on the checkpoint this run produces.
set -u
cd /root/repo
OUT=artifacts/tpu_queue_r4
mkdir -p "$OUT"

run() {
  local name="$1"; shift
  echo "[queue] === $name: $* (start $(date -u +%H:%M:%S))"
  timeout "$QTIMEOUT" python -u "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  echo "[queue] === $name done rc=$rc ($(date -u +%H:%M:%S))"
  tail -n 3 "$OUT/$name.log" | sed "s/^/[$name] /"
  if [ $rc -ne 0 ]; then sleep 120; fi
}

# Wait for the scene generator (CPU) to finish writing the v2 dataset.
while [ ! -f /tmp/gsjax_quality_scene_v2/transforms_test.json ]; do sleep 15; done
sleep 5

QTIMEOUT=2400 run verify  tools/verify_drive.py
QTIMEOUT=1800 run bench   bench.py
QTIMEOUT=20000 run quality tools/quality_run.py --iterations 15000 \
  --scene_dir /tmp/gsjax_quality_scene_v2 \
  --model_dir /tmp/gsjax_quality_model_v2 \
  --out artifacts/quality_run_v2.json
echo "[queue] phase 1 complete $(date -u +%H:%M:%S)"
