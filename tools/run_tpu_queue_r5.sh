#!/bin/bash
# Round-5 TPU measurement queue, phase A (quick benches after the MXU-power
# kernel change). One job at a time (two concurrent clients wedge the
# tunnel); each job gets up to $TRIES fresh processes because a wedged
# stream never recovers in-process while fresh clients work fine.
set -u
cd /root/repo
OUT=${OUT:-artifacts/tpu_queue_r5}
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
    sleep 60
  done
  return 1
}

QTIMEOUT=1500 run bench       bench.py
QTIMEOUT=1500 run stages      profile_stages.py
QTIMEOUT=1800 run fps         tools/bench_fps.py
echo "[queue] phase A complete $(date -u +%H:%M:%S)"
