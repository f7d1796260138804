#!/bin/bash
# Round-3 TPU measurement queue, phase 1 (STATUS.md "TPU-gated measurement
# queue"). Waits for the tunnel waiter's /tmp/tpu_alive marker, then runs
# the short benches SERIALLY (two concurrent TPU clients wedge the tunnel).
# Logs to artifacts/tpu_queue_r3/. The long quality run (queue items 5-6)
# is launched separately once these numbers are in.
set -u
cd /root/repo
OUT=artifacts/tpu_queue_r3
mkdir -p "$OUT"

while [ ! -f /tmp/tpu_alive ]; do sleep 30; done
echo "[queue] TPU alive; starting at $(date -u +%H:%M:%S)"

run() {
  local name="$1"; shift
  echo "[queue] === $name: $* (start $(date -u +%H:%M:%S))"
  timeout "$QTIMEOUT" python -u "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  echo "[queue] === $name done rc=$rc ($(date -u +%H:%M:%S))"
  tail -n 3 "$OUT/$name.log" | sed "s/^/[$name] /"
  # A hang here usually means the tunnel wedged again; give it time to
  # drain dead connections before the next client (see memory notes).
  if [ $rc -ne 0 ]; then sleep 180; fi
}

# Phase 0: the /verify drive — oracle parity + CLI pipeline on real TPU.
QTIMEOUT=2400 run verify      tools/verify_drive.py

QTIMEOUT=1800 run bench       bench.py
QTIMEOUT=2400 run mesh        tools/bench_mesh_overhead.py
QTIMEOUT=2400 run fps         tools/bench_fps.py
QTIMEOUT=2400 run trained     tools/bench_trained.py --model /tmp/gsjax_quality_model
# Strips/tile-shape choices must be re-evaluated on the TRAINED scene
# (r2: strips=2 was a wash on the random scene; opaque foregrounds differ).
QTIMEOUT=2400 run trained_s2  tools/bench_trained.py --model /tmp/gsjax_quality_model --strips 2
QTIMEOUT=2400 run trained_64  tools/bench_trained.py --model /tmp/gsjax_quality_model --tile 64x32
echo "[queue] phase 1 complete $(date -u +%H:%M:%S)"

# Phase 2: the long train-to-quality demonstration (96-view v2 scene).
QTIMEOUT=14400 run quality    tools/quality_run.py --iterations 15000 \
  --scene_dir /tmp/gsjax_quality_scene_v2 \
  --model_dir /tmp/gsjax_quality_model_v2 \
  --out artifacts/quality_run_v2.json
echo "[queue] phase 2 complete $(date -u +%H:%M:%S)"
