"""TPU long-horizon accuracy gate for bfloat16 storage: 30-frame synthetic
orbit through the stock CLI runner, f32 vs bf16 value leaves (tum256).

Run BEFORE flipping FusionConfig.storage_dtype preset defaults — the
10-frame bench loop showed identical |t err| (13.3 mm) but a running-
average quantization drift would only show at horizon.
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
    "f32": base,
    "bf16": dataclasses.replace(
        base, fusion=base.fusion._replace(storage_dtype="bfloat16")),
}

orig_preset = config.preset
for name, cfg in variants.items():
    config.preset = lambda _n, _c=cfg: _c
    buf = io.StringIO()
    with redirect_stdout(buf):
        cli.main(["--preset", "tum256", "--synthetic", "--frames", "30",
                  "--trajectory", f"/tmp/ab_dtype_{name}.txt", "--eval",
                  "--json"])
    out = json.loads(buf.getvalue().strip().splitlines()[-1])
    print(f"{name:5s} ATE {out['ate_rmse_m']*1e3:6.1f} mm  "
          f"GN {out['gn_iters_mean']:.1f}/frame  "
          f"fuse {out['fuse_ms_mean']:.0f} ms  "
          f"track {out['track_ms_mean']:.0f} ms", flush=True)
config.preset = orig_preset
