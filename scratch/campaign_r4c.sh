#!/bin/bash
# Round-4 stage C: bc4 follow-ups — quantized head, bf16 state, 7B point,
# and traces for the 1.5B/7B decode budgets.
cd /root/repo
run() {
  echo "=== $(date +%H:%M:%S) $* ==="
  timeout "$1" "${@:2}" 2> >(grep -v "WARNING\|libtpu\|Source Location\|INFO" >&2)
  echo "=== exit $?  ==="
}
run 900 python -u scratch/exp_i4.py bc4h 1p5 8
run 900 env RWKV_EXP_SBF16=1 python -u scratch/exp_i4.py bc4h 1p5 8
run 1200 python -u scratch/exp_i4.py bc4 7b 8
run 1200 python -u scratch/profile_dec.py int4 7b 8
run 300 python -u scratch/trace_top.py scratch/traces/int4_7b_b8 30
run 900 python -u scratch/profile_dec.py int4 1p5 8
run 300 python -u scratch/trace_top.py scratch/traces/int4_1p5_b8 30
echo "campaign_r4c done $(date +%H:%M:%S)"
