#!/bin/bash
# Round-4 campaign stage A: micro validations + 1.5B decode A/B (int4
# baseline vs packed w4a8). One process per stage (clean jit caches; the
# chip is exclusive per process).
cd /root/repo
run() {
  echo "=== $(date +%H:%M:%S) $* ==="
  timeout "$1" "${@:2}" 2> >(grep -v "WARNING\|libtpu\|Source Location\|INFO" >&2)
  echo "=== exit $? ==="
}
run 420 python -u scratch/exp_i4.py micro
run 420 python -u scratch/exp_i4.py micro5
run 900 python -u scratch/dec_bench.py int4 1p5
run 900 python -u scratch/exp_i4.py base 1p5 8
run 900 python -u scratch/exp_i4.py w4a8g 1p5 8
run 900 python -u scratch/exp_i4.py w4a8gm 1p5 8
run 900 python -u scratch/exp_i4.py w4a8best 1p5 8
echo "campaign_r4a done $(date +%H:%M:%S)"
