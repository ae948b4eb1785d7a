#!/bin/bash
# Trimmed round-3 TPU campaign: highest-value stages only (grant is live NOW,
# driver runs bench.py itself at round end — don't duplicate its stages).
cd /root/repo
run() {
  echo "=== $(date +%H:%M:%S) $* ==="
  timeout "$1" "${@:2}"
  echo "=== exit $? ==="
}
# 1. kernel micro-validations on real Mosaic (untested lowerings)
run 420 python -u scratch/exp_i4.py micro
run 420 python -u scratch/exp_i4.py micro5
run 420 python -u scratch/exp_i4.py micro4w
# 2. decode headline confirm + w4a8 candidate (A/B decides bench default)
run 900 python -u scratch/dec_bench.py int4 1p5
run 900 python -u scratch/exp_i4.py w4a8best 1p5 8
# 3. 7B point with the best variant
run 900 python -u scratch/exp_i4.py w4a8best 7b
# 4. golden matrix + compiled kernels on the chip (TPUTESTS_r03 evidence)
run 2400 env RWKV_TPU_TESTS=1 python -m pytest tests/test_tiny_rwkv.py tests/test_pallas_kernels.py -q 2>&1 | tee scratch/tputests_r03.log
echo "campaign_r3 done $(date +%H:%M:%S)"
