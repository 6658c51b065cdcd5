"""Color fidelity of the FINAL presets vs reference-faithful color fusion.

The round-3 fidelity numbers (ce=2: 99.8% coverage / |drgb| 0.04) predate
the round-4 stack — Wc is now bfloat16 with a max_weight clamp and tum512
fuses color every 3rd frame — so this re-measures at the shipped presets.

Both runs fuse the SAME frames at GROUNDTRUTH poses (oracle mode,
sdf_reconstruction.cpp:51-66) so the grids are geometrically identical;
the comparison isolates the color pipeline: preset (ce=N, Wc bf16,
clamp) vs faithful (ce=1, Wc f32, unclamped). Metrics reduce ON DEVICE
(the 512^3 leaves never cross the tunnel):

  coverage  = |colored(preset) AND colored(faithful)| / |colored(faithful)|
  mean|drgb| over the common colored set, in 1/255 units

Usage: DATASET=/tmp/tum_desk120c PRESET=tum256 python scripts/probe_color_fidelity.py
"""
import dataclasses
import os
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp

from tracking_sdf_tpu.config import preset
from tracking_sdf_tpu.core.camera import tum_fr1_camera
from tracking_sdf_tpu.data.tum import TUMDataset
from tracking_sdf_tpu.pipeline import Reconstruction

ROOT = os.environ.get("DATASET", "/tmp/tum_desk120c")
PRESET = os.environ.get("PRESET", "tum256")
base = preset(PRESET)
cam = tum_fr1_camera()
ds = TUMDataset(ROOT)


def fuse_all(cfg):
    """Returns only the COLOR leaves (R, G, B, Wc) in BRICK-ROW layout —
    the reductions below are layout-invariant, and skipping the dense
    materialization keeps 512^3 peak HBM at ~3 GB (two dense grids +
    live brick grids exhausted it)."""
    import gc

    r = Reconstruction(cam, dataclasses.replace(
        cfg, use_groundtruth=True, trajectory_path=None))
    r.run(ds)
    bg = r._bgrid
    out = tuple(jnp.copy(x) for x in (bg.R, bg.G, bg.B, bg.Wc))
    jax.block_until_ready(out)
    r.close()
    del r, bg
    gc.collect()
    return out


faithful_cfg = dataclasses.replace(
    base, fusion=base.fusion._replace(
        color_every=1, weight_dtype="float32", max_weight=None))
g_ref = fuse_all(faithful_cfg)
g_pre = fuse_all(base)


@jax.jit
def metrics(Ra, Ga, Ba, Wca, Rb, Gb, Bb, Wcb):
    f32 = jnp.float32
    ca = Wca > 0
    cb = Wcb > 0
    both = ca & cb
    cov = jnp.sum(both.astype(f32)) / jnp.maximum(
        jnp.sum(cb.astype(f32)), 1.0)
    d = (jnp.abs(Ra.astype(f32) - Rb.astype(f32))
         + jnp.abs(Ga.astype(f32) - Gb.astype(f32))
         + jnp.abs(Ba.astype(f32) - Bb.astype(f32))) / 3.0
    drgb = jnp.sum(jnp.where(both, d, 0.0)) / jnp.maximum(
        jnp.sum(both.astype(f32)), 1.0)
    dmax = jnp.max(jnp.where(both, d, 0.0))
    return cov, drgb * 255.0, dmax * 255.0


cov, drgb, dmax = metrics(*g_pre, *g_ref)
print(f"{PRESET}: colored-voxel coverage {float(cov)*100:.2f}%  "
      f"mean|drgb| {float(drgb):.3f}/255  max {float(dmax):.1f}/255  "
      f"(preset ce={base.fusion.color_every}, Wc "
      f"{base.fusion.weight_dtype}, clamp {base.fusion.max_weight})",
      flush=True)
