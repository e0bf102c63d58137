#!/bin/bash
# Take scaling pairs only in quiet host windows: wait for loadavg1
# below the threshold, run both halves back-to-back, annotate each
# half with the load before/after so contaminated pairs are visible.
# Usage: quiet_pairs.sh <ops> <lo_cpus> <hi_cpus> <attempts> <logfile>
OPS=${1:-tagg,tcount_seq}
LO=${2:-4}
HI=${3:-16}
ATTEMPTS=${4:-3}
LOG=${5:-/tmp/quiet_pairs.log}
THRESH=${QUIET_THRESH:-2.5}
PAGES=${PAGES:-16000000}
cd "$(dirname "$0")/.."
for a in $(seq 1 "$ATTEMPTS"); do
  # wait up to 30 min for a quiet window
  for i in $(seq 1 180); do
    L=$(cut -d' ' -f1 /proc/loadavg)
    ok=$(python3 -c "print(1 if $L < $THRESH else 0)")
    [ "$ok" = "1" ] && break
    sleep 10
  done
  echo "{\"attempt\": $a, \"load_start\": \"$(cat /proc/loadavg)\"}" >> "$LOG"
  python scripts/scaling_run.py --cpus "$LO" --ops "$OPS" --pages "$PAGES" 2>/dev/null | tail -1 >> "$LOG"
  echo "{\"load_mid\": \"$(cat /proc/loadavg)\"}" >> "$LOG"
  python scripts/scaling_run.py --cpus "$HI" --ops "$OPS" --pages "$PAGES" 2>/dev/null | tail -1 >> "$LOG"
  echo "{\"load_end\": \"$(cat /proc/loadavg)\"}" >> "$LOG"
done
echo DONE >> "$LOG"
