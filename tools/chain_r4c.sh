#!/bin/bash
# Quality run with a wedge watchdog: the tunneled client's TCP stream can
# die silently (log goes stale while the process sleeps on a dead read).
# If the log's mtime stalls >8 min, kill the exact PID and relaunch —
# quality_run auto-resumes from its newest 1000-iter checkpoint.
set -u
cd /root/repo
OUT=artifacts/tpu_queue_r4
LOG="$OUT/quality.log"

for attempt in 1 2 3 4 5 6; do
  echo "[qwatch] attempt $attempt start $(date -u +%H:%M:%S)"
  timeout 16000 python -u tools/quality_run.py --iterations 15000 \
    --scene_dir /tmp/gsjax_quality_scene_v2 \
    --model_dir /tmp/gsjax_quality_model_v2 \
    --out artifacts/quality_run_v2.json \
    --capacity 2097152 --max_instances 4194304 --max_rows 3145728 \
    > "$LOG" 2>&1 &
  PID=$!
  while kill -0 $PID 2>/dev/null; do
    sleep 60
    now=$(date +%s)
    mt=$(stat -c %Y "$LOG" 2>/dev/null || echo "$now")
    if [ $((now - mt)) -gt 480 ]; then
      echo "[qwatch] log stale $((now - mt))s; killing $PID"
      kill -9 $PID 2>/dev/null
      sleep 5
      break
    fi
  done
  wait $PID 2>/dev/null
  rc=$?
  echo "[qwatch] attempt $attempt rc=$rc $(date -u +%H:%M:%S)"
  if [ -f artifacts/quality_run_v2.json ]; then
    echo "rc=$rc" >> "$LOG"
    echo "[qwatch] artifact written; done"
    exit 0
  fi
  cp "$LOG" "$OUT/quality_attempt$((attempt + 1)).log" 2>/dev/null
done
echo "rc=1" >> "$LOG"
