#!/bin/bash
# Round-5 endurance refresh at the packed-color stack: ATE must reproduce
# r4 exactly (packing is bitwise; sat_skip off) while the device rate
# carries the packed-color win. Serial; nohup + poll.
cd /root/repo
set -x

E=/tmp/tum_fr1full2

run_endurance () {  # preset, tag, extra...
  local preset=$1 tag=$2; shift 2
  python -m tracking_sdf_tpu.cli --preset "$preset" --dataset "$E" \
    --native-loader --chunk 30 --trajectory "/tmp/end_r5_${tag}.txt" \
    --metrics-log "/tmp/end_r5_${tag}.jsonl" --eval --json "$@" 2>&1 | tail -2
}

run_endurance tum256 e256
run_endurance tum512 e512

python - <<'PYEOF'
import json
for tag in ("e256", "e512"):
    rows = [json.loads(l) for l in open(f"/tmp/end_r5_{tag}.jsonl")]
    rows = rows[1:]  # frame 0/compile
    import numpy as np
    f = np.array([r["fuse_ms"] for r in rows])
    t = np.array([r["track_ms"] for r in rows])
    print(f"{tag}: median fuse {np.median(f):.2f} ms, track "
          f"{np.median(t):.2f} ms, device ms/frame ~ "
          f"{np.median(f+t):.2f} (n={len(rows)})")
PYEOF
echo "=== r5e done ==="
