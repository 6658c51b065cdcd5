"""Dump the optimized TPU HLO of the brickmajor fuse step and summarize
which large intermediates XLA materializes (the math->merge boundary).

Usage: python scripts/probe_fuse_hlo.py [out.hlo]

Writes the post-optimization HLO text, then prints the top fusion outputs
by byte size so we can see whether the (cap, BV) update channels round-trip
HBM between the per-voxel math and the merge scatter.
"""
import re
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import bench as B
from tracking_sdf_tpu.fusion.brickmajor import (
    brick_grid_from_dense, fuse_frame_brickmajor)

out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fuse_brickmajor.hlo"

cfg, cam, poses, PTS, NRM, PTS_S, rgb = B.build_inputs()
params = cfg.grid
fcfg = cfg.fusion._replace(mode="bricked")
bs = (8, 8, 8)
dense0 = B._bootstrap(cfg, cam, poses, rgb)
bg0 = brick_grid_from_dense(dense0, bs)


def fuse(bgrid, pose, pts, nrm, rgb):
    return fuse_frame_brickmajor(
        bgrid, pose, pts, nrm, rgb, params=params, cam=cam, cfg=fcfg,
        bs=bs, cap=fcfg.brick_cap, emit_dm="view")


jfn = jax.jit(fuse, donate_argnums=(0,))
lowered = jfn.lower(bg0, poses[0], PTS[0], NRM[0], rgb)
print("lowered; compiling for", jax.devices()[0].platform, flush=True)
compiled = lowered.compile()
txt = compiled.as_text()
with open(out_path, "w") as f:
    f.write(txt)
print(f"wrote {len(txt)/1e6:.1f} MB of HLO to {out_path}", flush=True)

# ---- summarize: every op whose output tensor is >= 8 MB ----
DT_BYTES = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2, "u8": 1,
            "s8": 1, "pred": 1, "u16": 2, "s16": 2, "f64": 8, "s64": 8}
shape_re = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\([^)]*\)|[\w\d\[\],{}\/ ]+?)\s+(\w+)\(")


def shape_bytes(s):
    tot = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", s):
        dt, dims = m.group(1), m.group(2)
        if dt not in DT_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        tot += n * DT_BYTES[dt]
    return tot


rows = []
for line in txt.splitlines():
    mm = shape_re.match(line)
    if not mm:
        continue
    name, shp, op = mm.groups()
    if op in ("parameter", "constant", "tuple", "get-tuple-element"):
        continue
    b = shape_bytes(shp)
    if b >= 8 << 20:
        rows.append((b, name, op, shp.strip()[:90]))

# top-level entry computation ops only would need scoping; approximate by
# de-duplicating fusion bodies (inner ops repeat the fusion's shapes).
seen = set()
print("\n== ops with >=8 MB outputs (deduped by name) ==")
for b, name, op, shp in sorted(rows, reverse=True)[:60]:
    if name in seen:
        continue
    seen.add(name)
    print(f"{b/1e6:9.1f} MB  {op:12s} {name:40s} {shp}")

mem = compiled.memory_analysis()
if mem is not None:
    print(f"\ntemp allocation: {mem.temp_size_in_bytes/1e6:.1f} MB, "
          f"argument: {mem.argument_size_in_bytes/1e6:.1f} MB, "
          f"output: {mem.output_size_in_bytes/1e6:.1f} MB")
