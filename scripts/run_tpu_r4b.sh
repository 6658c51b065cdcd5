#!/bin/bash
# Round-4 TPU batch B: 512^3 cap trim + wf16 combo headline, SPMD chunk tax.
cd /root/repo
set -x

# 1. cap trimming at 512^3 on top of wf16 (bench n_full max ~27935)
BENCH_PRESET=tum512 BENCH_WDTYPE=bfloat16 BENCH_MAXW=128 BENCH_CAP=28672 \
  BENCH_BREAKDOWN=0 python bench.py 2>&1
BENCH_PRESET=tum512 BENCH_WDTYPE=bfloat16 BENCH_MAXW=128 BENCH_CAP=28672 \
  BENCH_CAP_FREE=8192 BENCH_BREAKDOWN=0 python bench.py 2>&1

# 2. does the trim hold WITHOUT wf16 (exact mode)?
BENCH_PRESET=tum512 BENCH_CAP=28672 BENCH_BREAKDOWN=0 python bench.py 2>&1

# 3. tum256 wf16 A/B (does it help at 256^3 too?)
BENCH_PRESET=tum256 BENCH_WDTYPE=bfloat16 BENCH_MAXW=128 \
  BENCH_BREAKDOWN=0 python bench.py 2>&1

# 4. SPMD chunk tax: 1-device mesh vs single device (VERDICT item 2 gate)
python scripts/probe_spmd_chunk.py 2>&1

echo "=== r4b done ==="
