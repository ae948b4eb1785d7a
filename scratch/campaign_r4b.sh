#!/bin/bash
# Round-4 campaign stage B: coarse-group w4a8 A/B at 1.5B, head variant,
# then the winner at 7B, plus an int4 tile autotune.
cd /root/repo
run() {
  echo "=== $(date +%H:%M:%S) $* ==="
  timeout "$1" "${@:2}" 2> >(grep -v "WARNING\|libtpu\|Source Location\|INFO" >&2)
  echo "=== exit $? ==="
}
run 900 python -u scratch/exp_i4.py w4a8g64 1p5 8
run 900 python -u scratch/exp_i4.py w4a8g128 1p5 8
run 900 python -u scratch/exp_i4.py w4a8g256 1p5 8
run 900 python -u scratch/exp_i4.py w4a8g128h 1p5 8
run 900 python -u scratch/exp_i4.py w4a8g256h 1p5 8
echo "campaign_r4b done $(date +%H:%M:%S)"
