#!/bin/bash
# Round-5 pathological endurance re-certification at the packed-color stack.
cd /root/repo
set -x
for P in tum256 tum512; do
  python -m tracking_sdf_tpu.cli --preset $P \
    --dataset /tmp/tum_fr1full_pathob --native-loader --chunk 30 \
    --trajectory /tmp/end_r5_${P}_pb.txt --eval --json 2>&1 | tail -2
done
echo "=== r5p done ==="
