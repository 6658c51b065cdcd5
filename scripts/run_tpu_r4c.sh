#!/bin/bash
# Round-4 TPU batch C: endurance rows (new presets, wf16, pathology) +
# realtime accuracy rows. Serial; nohup + poll.
cd /root/repo
set -x

E=/tmp/tum_fr1full2          # 1200-frame real-trajectory endurance (clean)
EP=/tmp/tum_fr1full_patho    # same, with sensor pathologies

run_endurance () {  # preset, dataset, tag, extra flags...
  local preset=$1 ds=$2 tag=$3; shift 3
  python -m tracking_sdf_tpu.cli --preset "$preset" --dataset "$ds" \
    --native-loader --chunk 30 --trajectory "/tmp/end_${tag}.txt" \
    --eval --json "$@" 2>&1 | tail -2
}

# 1. endurance at the shipped presets (free_fold adopted; ATE should
#    reproduce r3's 40.6 / 39.9 mm — fold is bitwise)
run_endurance tum256 $E e256
run_endurance tum512 $E e512

# 2. wf16+maxw128 endurance: the 1200-frame accumulator stress (W hits
#    the clamp ~frame 128+) — the adoption gate for the speed win
run_endurance tum256 $E e256w --weight-dtype bfloat16 --max-weight 128
run_endurance tum512 $E e512w --weight-dtype bfloat16 --max-weight 128

# 2b. the full speed stack at 512^3 (wf16 + trimmed cap): does the
#     endurance ATE hold with the reported drops?
run_endurance tum512 $E e512wc --weight-dtype bfloat16 --max-weight 128 \
  --brick-cap 28672

# 3. endurance on PATHOLOGICAL frames (both presets)
run_endurance tum256 $EP e256p
run_endurance tum512 $EP e512p

# 3b. harsher burst (99.95% loss x5 frames): the rejection gate must FIRE
python -m tracking_sdf_tpu.cli --preset tum256 --dataset /tmp/tum_burst120b \
  --native-loader --trajectory /tmp/burst2_traj.txt \
  --metrics-log /tmp/burst2_metrics.jsonl --eval --json 2>&1 | tail -2
python - <<'EOF'
import json
rows = [json.loads(l) for l in open("/tmp/burst2_metrics.jsonl")]
rej = [r["rejected"] for r in rows]
print(f"burst2: {sum(rej)} rejected at {[i for i,r in enumerate(rej) if r]}")
EOF

# 4. realtime rows: paced replay with drop-stale on the 120-frame
#    pathology set (per-frame path is tunnel-bound at ~4-5 fps wall, so
#    30 Hz pacing is a harsh drop-heavy regime — the point of the test)
python -m tracking_sdf_tpu.cli --preset tum256 \
  --dataset /tmp/tum_patho120_tabletop --realtime 30 \
  --trajectory /tmp/rt30.txt --eval --json 2>&1 | tail -2
python -m tracking_sdf_tpu.cli --preset tum256 \
  --dataset /tmp/tum_patho120_tabletop --realtime 10 \
  --trajectory /tmp/rt10.txt --eval --json 2>&1 | tail -2

echo "=== r4c done ==="
