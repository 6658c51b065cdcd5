"""TPU long-horizon accuracy gate for bfloat16 storage: 30-frame synthetic
orbit through the stock CLI runner, f32 vs bf16 value leaves (tum256).

Run BEFORE flipping FusionConfig.storage_dtype preset defaults — the
10-frame bench loop showed identical |t err| (13.3 mm) but a running-
average quantization drift would only show at horizon.
"""
import io
import json
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from tracking_sdf_tpu import cli  # noqa: E402

for name in ("float32", "bfloat16"):
    # no monkeypatching needed: the CLI grew --storage-dtype
    buf = io.StringIO()
    with redirect_stdout(buf):
        cli.main(["--preset", "tum256", "--synthetic", "--frames", "30",
                  "--storage-dtype", name,
                  "--trajectory", f"/tmp/ab_dtype_{name}.txt", "--eval",
                  "--json"])
    out = json.loads(buf.getvalue().strip().splitlines()[-1])
    print(f"{name:8s} ATE {out['ate_rmse_m']*1e3:6.1f} mm  "
          f"GN {out['gn_iters_mean']:.1f}/frame  "
          f"fuse {out['fuse_ms_mean']:.0f} ms  "
          f"track {out['track_ms_mean']:.0f} ms", flush=True)
