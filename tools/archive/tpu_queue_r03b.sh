#!/bin/bash
# Sequential TPU work queue for the chip-outage backlog (2026-08-18):
# runs AFTER tools/retry_rotforms.sh exits (the probe loop owns the chip
# first; sequential single-process jobs — interleaved arms INSIDE each
# script are what make the A/Bs honest).  Each stage retries on backend-
# init failure like the probe loop.  NEVER kill these mid-computation.
cd /root/repo
run_patient() {  # run_patient <name> <outfile> <cmd...>
  local name="$1" out="$2"; shift 2
  local tmp
  tmp=$(mktemp)
  for i in $(seq 1 30); do
    echo "=== $name attempt $i $(date -u +%H:%M:%S) ===" >> "$out"
    if "$@" > "$tmp" 2>&1; then
      cat "$tmp" >> "$out"; rm -f "$tmp"
      echo "=== $name SUCCESS $(date -u +%H:%M:%S) ===" >> "$out"
      return 0
    fi
    cat "$tmp" >> "$out"
    # retry only on backend-init unavailability IN THIS attempt's output
    # (grepping the cumulative file would retry real failures forever
    # once any one UNAVAILABLE line had been logged)
    grep -q "UNAVAILABLE" "$tmp" || { rm -f "$tmp"; return 1; }
    sleep 90
  done
  rm -f "$tmp"
  return 1
}

# Sequencing note: run this AFTER tools/retry_rotforms.sh exits — e.g.
# `bash tools/retry_rotforms.sh; bash tools/tpu_queue_r03b.sh`.  (An earlier
# revision polled pgrep -f here, but the pattern matches any launcher shell
# whose command line names retry_rotforms, deadlocking the queue.)

run_patient ab_floatpair results/floatpair_ab_r03.txt \
  python tools/ab_floatpair.py
run_patient bench results/bench_r03_dev3.txt \
  python bench.py
run_patient verify_drive results/verify_drive_tpu_r03.txt \
  python tools/verify_drive.py
echo "queue done $(date -u +%H:%M:%S)" >> results/tpu_queue_r03b.log
