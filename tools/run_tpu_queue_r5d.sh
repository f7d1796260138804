#!/bin/bash
# Round-5 queue, phase D: engine smoke gate -> verify drive -> the 30k
# quality run. Written fresh (NEVER edit a running queue script — bash
# reads incrementally and an insertion shifts its read offset, which is
# how phase B skipped the smoke gate).
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

QTIMEOUT=1200 TRIES=1 run engine_smoke tools/engine_smoke.py
QTIMEOUT=2400 run verify2 tools/verify_drive.py
QTIMEOUT=25200 TRIES=3 run quality tools/quality_run.py --iterations 30000 \
  --scene_dir /tmp/gsjax_quality_scene_v3 \
  --model_dir /tmp/gsjax_quality_model_v3 \
  --max_instances 4194304 --max_rows 3145728 --capacity 2097152 \
  --out artifacts/quality_run_v3.json
echo "[queue] phase D complete $(date -u +%H:%M:%S)"
bash tools/run_tpu_queue_r5c.sh
