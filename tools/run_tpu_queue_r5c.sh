#!/bin/bash
# Round-5 TPU queue, phase C (after quality v3 produces a trained
# checkpoint): trained-scene benches + the missing sweep cell + final
# headline numbers with the shipping kernels.
set -u
cd /root/repo
OUT=artifacts/tpu_queue_r5
mkdir -p "$OUT"
MODEL=${MODEL:-/tmp/gsjax_quality_model_v3}

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

# Root-cause artifacts for the r4 trained-scene anomaly (VERDICT #2):
# corrected chained fwd-only + viewer-path fps, and the per-stage
# breakdown on the trained checkpoint.
# Export the NEWEST periodic checkpoint to PLY first (a wall-clock-boxed
# quality run's latest state beats the last save_iterations PLY).
CKPT=$(ls "$MODEL"/chkpnt*.npz 2>/dev/null | sort -V | tail -1)
if [ -n "$CKPT" ]; then
  JAX_PLATFORMS=cpu timeout 900 python tools/ckpt_to_ply.py "$CKPT" "$MODEL" \
    > "$OUT/ckpt_to_ply.log" 2>&1 || true
fi
QTIMEOUT=2400 run trained     tools/bench_trained.py --model "$MODEL"
PLY=$(ls -d "$MODEL"/point_cloud/iteration_* 2>/dev/null | sort -V | tail -1)/point_cloud.ply
QTIMEOUT=2400 run stages_ply  profile_stages.py --ply "$PLY"
# The r4 sweep's dead cell (VERDICT #8).
QTIMEOUT=2400 run sweep_cell  tools/bench_sweep.py --configs 64x32c256s2 --out "$OUT/sweep_cell.json"
# Re-gate the row engine after the DMA-alignment fix (4-sublane output),
# then take the final headline numbers with whatever state survives.
rm -f /root/repo/.disable_row_engine
QTIMEOUT=1200 TRIES=1 run engine_smoke2 tools/engine_smoke.py
# Verify drive with the final kernel state (row engine + pipelined fast
# path) — the last material change since the 13:30 verify pass.
QTIMEOUT=2400 run verify3     tools/verify_drive.py
QTIMEOUT=1500 run bench_final bench.py
QTIMEOUT=1800 run fps_final   tools/bench_fps.py
QTIMEOUT=1500 run stages_final profile_stages.py
echo "[queue] phase C complete $(date -u +%H:%M:%S)"
