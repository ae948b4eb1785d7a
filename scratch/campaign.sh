#!/bin/bash
# Unattended TPU measurement campaign, in priority order — auto-launched by
# scratch/tpu_watch.sh the moment the grant lands (grant windows may be
# short, so cheapest/highest-value stages first). Each stage is its own
# process (clean jit caches); failures don't stop later stages.
cd /root/repo
run() {
  echo "=== $(date +%H:%M:%S) $* ==="
  timeout "$1" "${@:2}"
  echo "=== exit $? ==="
}

# 1. kernel validation on real Mosaic (untested lowerings): packed i5
#    iota-shift + the w4a8 grouped s8xs4 integer dots
run 600 python -u scratch/exp_i4.py micro5
run 600 python -u scratch/exp_i4.py micro4w
# 2. decode points, 1.5B: int4 headline confirm, then the dequant-free
#    w4a8 variants (the remaining lever: int4 is VPU-dequant co-limited)
run 900 python -u scratch/dec_bench.py int4 1p5
run 900 python -u scratch/exp_i4.py w4a8gm
run 900 python -u scratch/exp_i4.py w4a8head
run 900 python -u scratch/exp_i4.py w4a8best
run 900 python -u scratch/exp_i4.py w8a8head
# 2b. bf16 state carry at large batch (state traffic dominates there):
#     B=128 with/without, plus the B=8 sanity point
run 900 python -u scratch/exp_i4.py base 1p5 128
run 900 env RWKV_EXP_SBF16=1 python -u scratch/exp_i4.py base 1p5 128
run 900 env RWKV_EXP_SBF16=1 python -u scratch/exp_i4.py w4a8best 1p5 8
# 2c. serving-path A/B of the same lever (Server(state_bf16=...), B=128)
run 900 python -u scratch/serve_bf16.py 128 0
run 900 python -u scratch/serve_bf16.py 128 1
# 3. 7B point (VERDICT #3): best-variant decode + trace
run 900 python -u scratch/exp_i4.py w4a8best 7b
run 1200 python -u scratch/profile_dec.py int4 7b
run 300 python -u scratch/trace_top.py scratch/traces/int4_7b_b8 25
# 3b. speculative decoding (new capability): single-stream + B=8 points
run 900 python -u scratch/spec_bench.py 1 7 bf16
run 900 python -u scratch/spec_bench.py 1 7 int8
run 900 python -u scratch/spec_bench.py 8 7 bf16
run 900 python -u scratch/spec_bench.py 1 7 lookup
# 4. int5 coverage points
run 900 python -u scratch/exp_i4.py int5
run 900 python -u scratch/exp_i4.py int5m
# 5. prefill (VERDICT #4): bf16-act default vs f32, with trace
run 900 python -u scratch/prefill_bench.py 7.0
run 900 python -u scratch/prefill_bench.py 7.0 --f32
run 900 python -u scratch/prefill_bench.py 7.0 --trace scratch/traces/prefill_v7
run 300 python -u scratch/trace_top.py scratch/traces/prefill_v7 25
# 6. int4 tile autotune, both shapes
run 1800 python -u -m rwkv_tpu.ops.autotune --mode int4 --n-embed 2048 --n-layer 24
run 2400 python -u -m rwkv_tpu.ops.autotune --mode int4 --n-embed 4096 --n-layer 32
# 7. golden matrix + compiled kernels on the chip (TPUTESTS_r03 evidence)
run 3000 env RWKV_TPU_TESTS=1 python -m pytest tests/test_tiny_rwkv.py tests/test_pallas_kernels.py -q 2>&1 | tee scratch/tputests_r03.log
# 8. the full bench record
run 2400 python -u bench.py
echo "campaign done $(date +%H:%M:%S)"
