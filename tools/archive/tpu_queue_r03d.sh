#!/bin/bash
# Co-issue probe queue (2026-08-18, after tpu_queue_r03c / the VMEM-shift
# probe): the open question from results/vmemshift_probe_r03.txt —
#  - rolladd2: do TWO independent roll+add chains iterate ~2x rolladd's
#    rate (permute unit pipelines; the kernel's ILP already fills it) or
#    ~1x (throughput-bound; only a second datapath can add shifts)?
#  - rollvshift: does a VMEM round-trip shift chain ride FREE next to a
#    roll chain (co-issue between permute unit and load-realign path)?
# Controls: rolladd (the established non-collapsible figure), vshift1.
# Run when the chip returns.  NEVER kill these mid-computation.
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

run_patient coissue results/coissue_probe_r03.txt \
  python tools/calibrate_vpu.py 4 rolladd,rolladd2,vshift1,rollvshift
echo "queue done $(date -u +%H:%M:%S)" >> results/tpu_queue_r03d.log
