#!/bin/bash
# Follow-up TPU queue (2026-08-18, after tpu_queue_r03b):
#  1. ab_floatpair — the r03b run crashed on import (tools/ scripts lacked
#     the repo-root sys.path shim when the package isn't pip-installed);
#     re-run with the fix.
#  2. calibrate_vpu transposed arms — the rotate-form probe showed SUBLANE
#     rolls issue ~3x faster than lane rolls (roll_sub 42.8% vs roll 14.3%
#     of nominal, results/rotforms_probe_r03.txt); these arms measure the
#     rate at the ACTUAL candidate slab shape [W=2048, G=120] (256 sublane
#     tiles, 120/128 lanes) before any transposed-kernel prototype.
# Run AFTER tpu_queue_r03b.sh exits.  NEVER kill these mid-computation.
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
    grep -q "UNAVAILABLE" "$tmp" || { rm -f "$tmp"; return 1; }
    sleep 90
  done
  rm -f "$tmp"
  return 1
}

run_patient ab_floatpair results/floatpair_ab_r03.txt \
  python tools/ab_floatpair.py
run_patient calibrate_t results/rotforms_transposed_r03.txt \
  python tools/calibrate_vpu.py 4 add,roll,roll_sub,troll_sub,troll3,tadd,tmix,mix
echo "queue done $(date -u +%H:%M:%S)" >> results/tpu_queue_r03c.log
