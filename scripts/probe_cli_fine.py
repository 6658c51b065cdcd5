"""Follow-up: can a tighter FINE-level convergence threshold recover the
pyramid's long-horizon ATE (27.7 mm vs 17.8 flat at sj2, 30-frame orbit)
at a small iteration cost?"""
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
    "fine1e-3(cur)": base,
    "fine3e-4": dataclasses.replace(
        base, tracking=base.tracking._replace(max_twist_diff=3e-4)),
    "fine1e-4": dataclasses.replace(
        base, tracking=base.tracking._replace(max_twist_diff=1e-4)),
}
for name, cfg in variants.items():
    config.preset = lambda _n, _c=cfg: _c
    buf = io.StringIO()
    with redirect_stdout(buf):
        cli.main(["--preset", "tum256", "--synthetic", "--frames", "30",
                  "--trajectory", f"/tmp/abf_{name}.txt", "--eval", "--json"])
    out = json.loads(buf.getvalue().strip().splitlines()[-1])
    print(f"{name:14s} ATE {out['ate_rmse_m']*1e3:6.1f} mm  "
          f"GN {out['gn_iters_mean']:.1f}/frame", flush=True)
