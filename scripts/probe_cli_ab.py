"""A/B the full CLI runner (30-frame synthetic orbit, per-frame dispatch)
across preset deltas — isolates which knob moved long-horizon ATE.

Variants: pixel_share_j (1 vs 2) x pyramid ((2,1) vs single-level).
Monkeypatches config.preset so the stock CLI path runs unmodified.
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
variants = {
    "sj2+pyr21": base,
    "sj1+pyr21": dataclasses.replace(
        base, fusion=base.fusion._replace(pixel_share_j=1)),
    "sj2+flat": dataclasses.replace(base, pyramid_levels=None),
    "sj1+flat": dataclasses.replace(
        base, fusion=base.fusion._replace(pixel_share_j=1),
        pyramid_levels=None),
}

orig_preset = config.preset
for name, cfg in variants.items():
    config.preset = lambda _n, _c=cfg: _c
    buf = io.StringIO()
    with redirect_stdout(buf):
        cli.main(["--preset", "tum256", "--synthetic", "--frames", "30",
                  "--trajectory", f"/tmp/ab_{name}.txt", "--eval", "--json"])
    out = json.loads(buf.getvalue().strip().splitlines()[-1])
    print(f"{name:12s} ATE {out['ate_rmse_m']*1e3:6.1f} mm  "
          f"GN {out['gn_iters_mean']:.1f}/frame  "
          f"fuse {out['fuse_ms_mean']:.0f} ms", flush=True)
config.preset = orig_preset
