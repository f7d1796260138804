#!/bin/bash
# Round-4 phase 2: after the quality run ends — verify drive (post
# packed_paths hook), trained-checkpoint benches, primitive probes, the
# mesh-overhead full log (advisor r3 #3), and a final headline bench.
set -u
cd /root/repo
OUT=artifacts/tpu_queue_r4
M=/tmp/gsjax_quality_model_v2

while ! grep -q "^rc=" "$OUT/quality.log" 2>/dev/null; do sleep 60; done

run() {
  local name="$1"; shift
  echo "[chain2] $name start $(date -u +%H:%M:%S)"
  timeout "$QT" python -u "$@" > "$OUT/$name.log" 2>&1
  echo "rc=$?" >> "$OUT/$name.log"
}

QT=2400 run verify2     tools/verify_drive.py
QT=2400 run trained     tools/bench_trained.py --model "$M"
QT=2400 run trained_s2  tools/bench_trained.py --model "$M" --strips 2
QT=2400 run probe_prims tools/probe_prims.py
QT=2400 run mesh        tools/bench_mesh_overhead.py
echo "[chain2] done $(date -u +%H:%M:%S)"
