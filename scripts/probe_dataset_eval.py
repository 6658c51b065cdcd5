"""TPU evaluation on the 120-frame synthetic TUM-layout dataset.

The VERDICT r1 item-2 run: the full ingestion chain (native PNG loader ->
TUMDataset -> runner with bilateral+normals -> trajectory writer ->
Umeyama ATE / RPE) on real RGB-D-shaped data (640x480, 16-bit depth PNGs
with quadratic Kinect noise + holes), ~1 m camera sweep over 120 frames.

Doubles as the accuracy A/B oracle (the 30-frame synthetic orbit's ATE is
variant-noisy at the few-mm scale): preset deltas over pyramid x
pixel_share_j x distance, all at the preset's bfloat16 storage.

Generate the dataset first (CPU, ~1 min):
    python -m tracking_sdf_tpu.data.make_sequence --out /tmp/tum_synth120 \
        --frames 120
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

ROOT = os.environ.get("DATASET", "/tmp/tum_synth120")
PRESET = os.environ.get("PRESET", "tum256")  # tum512 = the 512^3 oracle
base = config.preset(PRESET)


def mk(pyr=(2, 1), sj=2, dist="point_to_plane"):
    c = dataclasses.replace(base, pyramid_levels=pyr)
    return dataclasses.replace(
        c, fusion=c.fusion._replace(pixel_share_j=sj, distance=dist))


def mk_share(sk, sj):
    return dataclasses.replace(
        base, fusion=base.fusion._replace(pixel_share=sk, pixel_share_j=sj))


if os.environ.get("VARIANTS") == "share":
    # pixel_share accuracy isolation (the tum512 4x4 |t err| question)
    variants = {
        "share=2x2": mk_share(2, 2),
        "share=4x2": mk_share(4, 2),
        "share=4x4 (preset)": mk_share(4, 4),
    }
elif os.environ.get("VARIANTS") == "final":
    # the definitive accuracy rows at the shipped presets
    variants = {
        "preset": base,
        "preset+p2p": mk(pyr=base.pyramid_levels, sj=base.fusion.pixel_share_j,
                         dist="point_to_point"),
    }
elif os.environ.get("VARIANTS") == "weighting":
    # paper Table II ablation (exponential = shipped code Eq. 31):
    # the ablation axis exists as FusionConfig.weighting; mirror the
    # paper's study on the dataset oracle
    def mk_w(w):
        return dataclasses.replace(
            base, fusion=base.fusion._replace(weighting=w))
    variants = {
        "exponential (preset)": mk_w("exponential"),
        "linear": mk_w("linear"),
        "constant": mk_w("constant"),
    }
elif os.environ.get("VARIANTS") == "bilateral":
    # round-3 item 8: separable (2x11-tap) vs full (121-tap) bilateral —
    # the integration metric is trajectory ATE (module contract)
    variants = {
        "bilateral=full": base,
        "bilateral=separable": dataclasses.replace(
            base, bilateral_mode="separable"),
    }
elif os.environ.get("VARIANTS") == "fast512":
    # round-3 item 1: candidate accurate-AND-fast 512^3 presets
    def mk_f(sk, sj, dist="point_to_plane", factored=False):
        return dataclasses.replace(
            base, fusion=base.fusion._replace(
                pixel_share=sk, pixel_share_j=sj, distance=dist,
                factored_share=factored))
    variants = {
        "share=4x4+p2p": mk_f(4, 4, dist="point_to_point"),
        "share=8x4+p2p": mk_f(8, 4, dist="point_to_point"),
        "share=4x4": mk_f(4, 4),
    }
elif os.environ.get("VARIANTS") == "share84":
    # the last big 512^3 speed lever (fuse 41 vs 56 ms): is 8-along-k
    # acceptable on realistic data? (radius 4 voxels = 47 mm at 512^3)
    variants = {
        "share=4x4 (preset)": mk_share(4, 4),
        "share=8x4": mk_share(8, 4),
        "share=8x8": mk_share(8, 8),
    }
elif os.environ.get("VARIANTS") == "patho":
    # round-4 sensor-pathology battery: the preset + its approximation
    # ladder + the two new flagged modes, on --pathology data
    variants = {
        "preset": base,
        "share=2x2": mk_share(2, 2),
        "share=1 exact": mk_share(1, 1),
        "safe-classify": dataclasses.replace(
            base, fusion=base.fusion._replace(share_safe_classify=True)),
        "wf16+maxw128": dataclasses.replace(
            base, fusion=base.fusion._replace(weight_dtype="bfloat16",
                                              max_weight=128.0)),
    }
else:
    # deltas off the CURRENT preset (labels derive from it — the preset's
    # share/pyramid have moved across rounds)
    _p = f"share={base.fusion.pixel_share}x{base.fusion.pixel_share_j}"
    variants = {
        f"preset ({_p})": mk(pyr=base.pyramid_levels,
                             sj=base.fusion.pixel_share_j),
        "flat": mk(pyr=None, sj=base.fusion.pixel_share_j),
        "share 2x2": mk_share(2, 2),
        "preset+p2p": mk(pyr=base.pyramid_levels,
                         sj=base.fusion.pixel_share_j,
                         dist="point_to_point"),
    }

orig_preset = config.preset
try:
    for name, cfgv in variants.items():
        config.preset = lambda _n, _c=cfgv: _c
        buf = io.StringIO()
        with redirect_stdout(buf):
            cli.main(["--preset", PRESET, "--dataset", ROOT,
                      "--native-loader",
                      "--trajectory", f"/tmp/ds_{PRESET}_{name.split(' ')[0]}.txt",
                      "--eval", "--json"])
        out = json.loads(buf.getvalue().strip().splitlines()[-1])
        print(f"{name:20s} ATE {out['ate_rmse_m']*1e3:6.1f} mm  "
              f"RPE {out['rpe_trans_m']*1e3:5.2f} mm/fr "
              f"{out['rpe_rot_rad']*1e3:5.2f} mrad/fr  "
              f"GN {out['gn_iters_mean']:.1f}  "
              f"track {out['track_ms_mean']:.0f} ms  "
              f"fuse {out['fuse_ms_mean']:.0f} ms", flush=True)
finally:
    config.preset = orig_preset
