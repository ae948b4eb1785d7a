#!/bin/bash
# Unattended TPU measurement campaign, in priority order — run as soon as the
# grant lands (bash scratch/campaign.sh 2>&1 | tee scratch/campaign.log).
# Each stage is its own process (clean jit caches); failures don't stop later
# stages. Expected total: ~45-60 min over the relay.
cd /root/repo
run() {
  echo "=== $(date +%H:%M:%S) $* ==="
  timeout "$1" "${@:2}"
  echo "=== exit $? ==="
}

# 1. kernel validation on real Mosaic (new since the chip was lost):
#    packed i5 iota-shift lowering + i4 variants
run 600 python -u scratch/exp_i4.py micro5
# 2. decode points: int4 (headline), int5, merged variants
run 900 python -u scratch/dec_bench.py int4 1p5
run 900 python -u scratch/exp_i4.py int5
run 900 python -u scratch/exp_i4.py int5m
# 3. 7B profile (VERDICT #3): trace + summary
run 1200 python -u scratch/profile_dec.py int4 7b
run 300 python -u scratch/trace_top.py scratch/traces/int4_7b_b8 25
# 4. int4 tile autotune, both shapes
run 1800 python -u -m rwkv_tpu.ops.autotune --mode int4 --n-embed 2048 --n-layer 24
run 2400 python -u -m rwkv_tpu.ops.autotune --mode int4 --n-embed 4096 --n-layer 32
# 5. prefill (VERDICT #4): bf16-act default vs f32, with trace
run 900 python -u scratch/prefill_bench.py 7.0
run 900 python -u scratch/prefill_bench.py 7.0 --f32
run 900 python -u scratch/prefill_bench.py 7.0 --trace scratch/traces/prefill_v7
run 300 python -u scratch/trace_top.py scratch/traces/prefill_v7 25
# 6. the full bench record
run 2400 python -u bench.py
echo "campaign done $(date +%H:%M:%S)"
