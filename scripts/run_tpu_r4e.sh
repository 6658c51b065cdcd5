#!/bin/bash
# Round-4 TPU batch E: corrected-pathology re-runs + cap_free endurance +
# FINAL dual-preset headline with the adopted presets.
cd /root/repo
set -x

# 1. FINAL headline: plain dual-preset bench at the adopted presets
python bench.py 2>&1

# 2. Table II weighting on CORRECTED pathology (shadow side fixed)
DATASET=/tmp/tum_patho120b_tabletop PRESET=tum256 VARIANTS=weighting \
  python scripts/probe_dataset_eval.py 2>&1

# 3. preset ladder on corrected pathology
DATASET=/tmp/tum_patho120b_tabletop PRESET=tum256 VARIANTS=patho \
  python scripts/probe_dataset_eval.py 2>&1

# 4. corrected pathology scene rows (desk/plant at 256, tabletop at 512)
for fam in desk plant; do
  DATASET=/tmp/tum_patho120b_$fam PRESET=tum256 VARIANTS=final \
    python scripts/probe_dataset_eval.py 2>&1
done
DATASET=/tmp/tum_patho120b_tabletop PRESET=tum512 VARIANTS=final \
  python scripts/probe_dataset_eval.py 2>&1

# 5. cap_free 8192 endurance at tum512 (the last untested trim)
python -m tracking_sdf_tpu.cli --preset tum512 --dataset /tmp/tum_fr1full2 \
  --native-loader --chunk 30 --brick-cap-free 8192 \
  --trajectory /tmp/end_e512cf.txt --eval --json 2>&1 | tail -2

# 6. corrected-pathology endurance (both presets)
for P in tum256 tum512; do
  python -m tracking_sdf_tpu.cli --preset $P \
    --dataset /tmp/tum_fr1full_pathob --native-loader --chunk 30 \
    --trajectory /tmp/end_${P}_pb.txt --eval --json 2>&1 | tail -2
done

# 7. realtime rows (pacer now starts the arrival clock after 2 warmup
#    frames, so the jit compiles don't expire the stream)
for HZ in 30 10 4; do
  python -m tracking_sdf_tpu.cli --preset tum256 \
    --dataset /tmp/tum_patho120b_tabletop --realtime $HZ \
    --trajectory /tmp/rt$HZ.txt --eval --json 2>&1 | tail -2
done

echo "=== r4e done ==="
