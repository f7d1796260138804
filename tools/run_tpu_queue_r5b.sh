#!/bin/bash
# Round-5 TPU queue, phase B: verify drive + reduction probe, then the LONG
# quality v3 (30k, full default recipe) — which also produces the trained
# checkpoint phase C consumes. Serial; fresh process per attempt.
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

QTIMEOUT=2400 run verify      tools/verify_drive.py
# Re-bench the shipping kernel state (POWER_VIA_MXU=False + monotone
# termination) — the phase-A bench measured the MXU-power variant.
QTIMEOUT=1500 run bench2      bench.py
QTIMEOUT=1500 run stages2     profile_stages.py
# Serialization ablation: dma_only = walk floor; fwd_nocond = no strip
# cond (pipelining blocker test); fwd_nodep = constant carry (throughput
# ceiling); replay_fwd = shipping compute. The deltas locate the ~2.6
# us/chunk bound.
QTIMEOUT=2400 run ablate      tools/ablate_kernels.py dma_only fwd_nodep fwd_nocond replay_fwd
# Overhead probe before the long quality run: it decides whether the
# trainer needs dispatch batching (r4 quality averaged ~1.5 s/it wall vs
# ~0.3 s estimated device time).
QTIMEOUT=1800 run overhead    tools/probe_overhead_r5.py
QTIMEOUT=1500 run gradreduce  tools/probe_gradreduce.py

# Sky on/off BEFORE the 30k run: it is a standalone VERDICT deliverable
# with no partial-result fallback, while quality v3 degrades gracefully
# (checkpointed auto-resume; a 20k+ curve is still an artifact).
QTIMEOUT=10800 TRIES=2 run sky tools/sky_run.py

# Gate the fresh row-engine kernel before the unattended run: on a Mosaic
# failure the smoke drops .disable_row_engine and quality proceeds on the
# proven path.
QTIMEOUT=1200 TRIES=1 run engine_smoke tools/engine_smoke.py
# Full verify drive again with the row engine in the graph (the /verify
# recipe; material kernel change since the 11:07 pass).
QTIMEOUT=2400 run verify2     tools/verify_drive.py

# The long one: 30k default recipe; auto-resumes from periodic checkpoints
# on a fresh attempt after a tunnel wedge.
QTIMEOUT=28800 TRIES=3 run quality tools/quality_run.py --iterations 30000 \
  --scene_dir /tmp/gsjax_quality_scene_v3 \
  --model_dir /tmp/gsjax_quality_model_v3 \
  --max_instances 4194304 --max_rows 3145728 --capacity 2097152 \
  --out artifacts/quality_run_v3.json
echo "[queue] phase B complete $(date -u +%H:%M:%S)"
