#!/bin/bash
# Round-close evidence queue (2026-08-18, final round-3 tree @ the
# bench_r03_final commit): re-run the user-style verify drive plus
# fresh-seed parity campaigns on the EXACT tree the driver will bench,
# so the round's hardware evidence is not stale w.r.t. the late probe
# commits (_TAPS_MXU hook, leading-pair f32 hbox enable).
# The chip is pool-contended: patient retries, NEVER kill mid-computation.
cd /root/repo
run_patient() {  # run_patient <name> <outfile> <cmd...>
  local name="$1" out="$2"; shift 2
  local tmp
  tmp=$(mktemp)
  for i in $(seq 1 120); do
    echo "=== $name attempt $i $(date -u +%H:%M:%S) ===" >> "$out"
    if "$@" > "$tmp" 2>&1; then
      cat "$tmp" >> "$out"; rm -f "$tmp"
      echo "=== $name SUCCESS $(date -u +%H:%M:%S) ===" >> "$out"
      return 0
    fi
    cat "$tmp" >> "$out"
    grep -qE "UNAVAILABLE|No jellyfish device" "$tmp" || { rm -f "$tmp"; return 1; }
    sleep 90
  done
  rm -f "$tmp"
  return 1
}

run_patient verify_drive results/verify_drive_tpu_r03_final.txt \
  python tools/verify_drive.py || exit 1
run_patient random24 results/tpu_campaign_random24_r03_final.txt \
  python tools/parity_campaign_tpu.py --random 24 81818 || exit 1
run_patient bob10 results/tpu_campaign_bob10_r03_final.txt \
  python tools/parity_campaign_tpu.py --bob 10 81819 || exit 1
run_patient sharded10 results/tpu_campaign_sharded10_r03_final.txt \
  python tools/parity_campaign_tpu.py --sharded 10 81820 || exit 1
echo "QUEUE COMPLETE $(date -u)"
