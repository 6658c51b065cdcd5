"""Scene-breadth accuracy matrix (VERDICT r2 next-item 3).

Paper Table I spans 10 sequences over different scene types; this runs
the shipped presets over every synthetic scene family x the REAL
fr1/plant motion replay (the closest-to-real-data eval available
offline): tabletop room (tum_synth120's sweep + the fr1 replay rooms),
cluttered desk, thin-structure plant.

Generate the datasets first (CPU):
  python -m tracking_sdf_tpu.data.make_sequence --out /tmp/tum_desk240 \
      --frames 240 --scene desk --room --fit-trajectory \
      --trajectory-file $REF_GT --traj-start 0.5
  (same for plant; tum_synth120 is the 120-frame sweep)

Env: DATASETS=path1,path2 PRESETS=tum256,tum512 DIST=preset,point_to_point
"""
import dataclasses
import io
import json
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from tracking_sdf_tpu import cli, config  # noqa: E402

DATASETS = os.environ.get(
    "DATASETS", "/tmp/tum_synth120,/tmp/tum_desk240,/tmp/tum_plant240"
).split(",")
PRESETS = os.environ.get("PRESETS", "tum256,tum512").split(",")
DISTS = os.environ.get(
    "DIST", "point_to_plane,point_to_point").split(",")


def run(root, preset_name, dist):
    base = config.preset(preset_name)
    if dist != "preset":
        base = dataclasses.replace(
            base, fusion=base.fusion._replace(distance=dist))
    orig = config.preset
    config.preset = lambda name: base
    try:
        buf = io.StringIO()
        chunk = os.environ.get("CHUNK", "30")  # device-rate through the tunnel
        with redirect_stdout(buf):
            rc = cli.main([
                "--preset", preset_name, "--dataset", root,
                "--native-loader", "--chunk", chunk, "--trajectory",
                f"/tmp/matrix_{preset_name}.txt", "--eval", "--json",
            ])
        out = json.loads(buf.getvalue().strip().splitlines()[-1])
    finally:
        config.preset = orig
    name = os.path.basename(root)
    d = base.fusion.distance
    print(f"{name:16s} {preset_name:7s} {d:15s} "
          f"ATE {out['ate_rmse_m']*1e3:6.1f} mm  "
          f"RPE {out['rpe_trans_m']*1e3:5.2f} mm "
          f"{out['rpe_rot_rad']*1e3:5.2f} mrad  "
          f"GN {out['gn_iters_mean']:.1f}  frames {int(out['frames'])}",
          flush=True)


for root in DATASETS:
    if not os.path.isdir(root):
        print(f"skip {root} (missing)", flush=True)
        continue
    for pn in PRESETS:
        for dist in DISTS:
            run(root, pn, dist)
