#!/bin/bash
# Round-4 TPU batch A: pathology accuracy + wf16 speed + burst gate.
# Serial (exclusive device claim); launch with nohup, poll the log.
cd /root/repo
set -x

# 1. weight-dtype bf16 + max_weight speed at 512^3 (headline + breakdown)
BENCH_PRESET=tum512 BENCH_WDTYPE=bfloat16 BENCH_MAXW=128 \
  python bench.py 2>&1

# 2. Table II weighting ablation on PATHOLOGICAL data (does it rank now?)
DATASET=/tmp/tum_patho120_tabletop PRESET=tum256 VARIANTS=weighting \
  python scripts/probe_dataset_eval.py 2>&1

# 3. pathology battery at tum256 (preset ladder + new flagged modes)
DATASET=/tmp/tum_patho120_tabletop PRESET=tum256 VARIANTS=patho \
  python scripts/probe_dataset_eval.py 2>&1

# 4. pathology scene breadth (desk/plant, preset row only)
for fam in desk plant; do
  DATASET=/tmp/tum_patho120_$fam PRESET=tum256 VARIANTS=final \
    python scripts/probe_dataset_eval.py 2>&1
done

# 5. tum512 preset on pathological data
DATASET=/tmp/tum_patho120_tabletop PRESET=tum512 VARIANTS=final \
  python scripts/probe_dataset_eval.py 2>&1

# 6. burst gate: 5 frames of 95% dropout mid-run — gate must reject,
#    tracker must re-acquire (metrics-log carries the rejected flags)
python -m tracking_sdf_tpu.cli --preset tum256 --dataset /tmp/tum_burst120 \
  --native-loader --trajectory /tmp/burst_traj.txt \
  --metrics-log /tmp/burst_metrics.jsonl --eval --json 2>&1
python - <<'EOF'
import json
rej = [json.loads(l)["rejected"] for l in open("/tmp/burst_metrics.jsonl")]
print(f"burst: {sum(rej)} rejected frames at indices "
      f"{[i for i, r in enumerate(rej) if r]}")
EOF

echo "=== r4a done ==="
