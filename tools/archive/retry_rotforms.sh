#!/bin/bash
# Patient retry loop for the chip-gated rotate-form probe (ROADMAP round-4
# backlog item 5).  Backend init can be UNAVAILABLE for hours; each attempt
# is a fresh python process (failed init raises cleanly, retrying is safe).
# NEVER kill an attempt mid-TPU-computation — let it finish or fail.
OUT=/root/repo/results/rotforms_probe_r03.txt
ARMS="add,roll,roll@1024,roll@512,roll3,roll3@1024,roll_sub,concat_rot,jroll,mix,mix@1024"
cd /root/repo
for i in $(seq 1 40); do
  echo "=== attempt $i $(date -u +%H:%M:%S) ===" >> "$OUT"
  if python tools/calibrate_vpu.py 4 "$ARMS" >> "$OUT" 2>&1; then
    echo "=== SUCCESS $(date -u +%H:%M:%S) ===" >> "$OUT"
    exit 0
  fi
  sleep 90
done
echo "=== gave up after 40 attempts $(date -u +%H:%M:%S) ===" >> "$OUT"
exit 1
