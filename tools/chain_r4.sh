#!/bin/bash
# Round-4 serial TPU chain (single-core host, single tunnel client):
# wait for the running sweep -> fps sweep -> /verify drive -> 15k quality v2.
set -u
cd /root/repo
OUT=artifacts/tpu_queue_r4

while ! grep -q "^rc=" "$OUT/sweep.log" 2>/dev/null; do sleep 30; done

echo "[chain] fps start $(date -u +%H:%M:%S)"
timeout 3600 python -u tools/bench_fps.py > "$OUT/fps.log" 2>&1
echo "rc=$?" >> "$OUT/fps.log"

echo "[chain] verify start $(date -u +%H:%M:%S)"
timeout 2400 python -u tools/verify_drive.py > "$OUT/verify.log" 2>&1
echo "rc=$?" >> "$OUT/verify.log"

echo "[chain] quality start $(date -u +%H:%M:%S)"
timeout 16000 python -u tools/quality_run.py --iterations 15000 \
  --scene_dir /tmp/gsjax_quality_scene_v2 \
  --model_dir /tmp/gsjax_quality_model_v2 \
  --out artifacts/quality_run_v2.json \
  --capacity 2097152 --max_instances 4194304 --max_rows 3145728 \
  > "$OUT/quality.log" 2>&1
echo "rc=$?" >> "$OUT/quality.log"
echo "[chain] done $(date -u +%H:%M:%S)"
