#!/bin/bash
# Round-5 queue, phase E: relaunch after the session hosting phase D died
# (SIGTERM took the 30k quality run down at iter 4000; checkpoints are on
# disk and quality_run auto-resumes). Fresh file — NEVER edit a running
# queue script.
#
#   1. engine smoke with the kill-switch sentinel cleared: gates the
#      4-sublane DMA fix for the fused row engine on the real chip; on a
#      Mosaic failure it re-drops the sentinel and quality proceeds on the
#      proven rank-kernel path.
#   2. quality v3 resume -> 30000 iters (the VERDICT #5 deliverable).
#   3. phase C (trained benches, sweep cell, final headline numbers).
set -u
cd /root/repo
OUT=artifacts/tpu_queue_r5
mkdir -p "$OUT"

run() {
  local name="$1"; shift
  local tries=${TRIES:-2}
  for attempt in $(seq 1 "$tries"); do
    echo "[queue] === $name attempt $attempt: $* ($(date -u +%H:%M:%S))"
    timeout "$QTIMEOUT" python -u "$@" > "$OUT/$name.log" 2>&1
    local rc=$?
    echo "[queue] === $name rc=$rc ($(date -u +%H:%M:%S))"
    tail -n 4 "$OUT/$name.log" | sed "s/^/[$name] /"
    [ $rc -eq 0 ] && return 0
    sleep 120
  done
  return 1
}

rm -f /root/repo/.disable_row_engine
QTIMEOUT=1200 TRIES=1 run engine_smoke3 tools/engine_smoke.py

QTIMEOUT=25200 TRIES=3 run quality tools/quality_run.py --iterations 30000 \
  --scene_dir /tmp/gsjax_quality_scene_v3 \
  --model_dir /tmp/gsjax_quality_model_v3 \
  --max_instances 1048576 --max_rows 524288 --capacity 2097152 \
  --out artifacts/quality_run_v3.json
echo "[queue] phase E quality done $(date -u +%H:%M:%S)"
bash tools/run_tpu_queue_r5c.sh
