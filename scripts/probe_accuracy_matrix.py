"""TPU closed-loop accuracy matrix (VERDICT r1 item 4): 30-frame synthetic
orbit through the stock CLI runner, tum256 preset deltas.

Axes: pyramid ((2,1) vs flat) x min_iterations (0/2/3) x pixel_share_j
(2 vs 1). All at the preset's bfloat16 storage. Goal: find a preset that
holds <= 15 mm ATE while keeping the >= 50 fps bench headline (the flat
and sj1 variants pay ~7 and ~2 ms/frame respectively — BENCHMARKS.md).

CPU closed loops are NOT predictive of TPU closed-loop ATE (stride-4
lesson, BENCHMARKS.md); this must run on the chip.
"""
import dataclasses
import io
import json
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from tracking_sdf_tpu import cli, config  # noqa: E402

base = config.preset("tum256")


def mk(minit=0, pyr=(2, 1), sj=2):
    c = dataclasses.replace(base, pyramid_levels=pyr)
    return dataclasses.replace(
        c,
        tracking=c.tracking._replace(min_iterations=minit),
        fusion=c.fusion._replace(pixel_share_j=sj),
    )


variants = {
    "pyr21+sj2 (preset)": mk(),
    "pyr21+sj2+minit2": mk(minit=2),
    "pyr21+sj2+minit3": mk(minit=3),
    "pyr21+sj1+minit2": mk(minit=2, sj=1),
    "flat+sj2": mk(pyr=None),
    "flat+sj1": mk(pyr=None, sj=1),
}

orig_preset = config.preset
try:
    for name, cfg in variants.items():
        config.preset = lambda _n, _c=cfg: _c
        buf = io.StringIO()
        with redirect_stdout(buf):
            cli.main(["--preset", "tum256", "--synthetic", "--frames", "30",
                      "--trajectory",
                      f"/tmp/abm_{name.split(' ')[0]}.txt",
                      "--eval", "--json"])
        out = json.loads(buf.getvalue().strip().splitlines()[-1])
        print(f"{name:20s} ATE {out['ate_rmse_m']*1e3:6.1f} mm  "
              f"GN {out['gn_iters_mean']:.1f}/frame  "
              f"track {out['track_ms_mean']:.0f} ms  "
              f"fuse {out['fuse_ms_mean']:.0f} ms", flush=True)
finally:
    config.preset = orig_preset
