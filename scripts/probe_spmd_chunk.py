"""1-device-MESH chunked runner vs plain single-device chunked (round 4).

VERDICT r3 item 2's done-criterion: the sharded process_chunk (shard_maps
inside one fori_loop dispatch) must not tax a 1-device mesh — wall rate
within ~5% of the single-device chunked path. Runs the SAME 30-frame
synthetic dataset through both runners at a tum256-like config (CHUNK
frames per dispatch) and reports ms/frame wall (second chunk onward —
first carries compiles).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np

from tracking_sdf_tpu.config import preset
from tracking_sdf_tpu.data.synthetic import render_scene_depth
from tracking_sdf_tpu.parallel import make_mesh
from tracking_sdf_tpu.pipeline import Reconstruction

sys.path.insert(0, "/root/repo/scripts")
import bench as B  # noqa: E402  (scene + camera fixtures)

CHUNK = int(os.environ.get("CHUNK", "10"))
N = 3 * CHUNK
cfg = preset(os.environ.get("BENCH_PRESET", "tum256"))
cam = B.ros_default_camera() if hasattr(B, "ros_default_camera") else None
if cam is None:
    from tracking_sdf_tpu.core.camera import ros_default_camera
    cam = ros_default_camera()

scene = B.make_scene()
_, _, poses, *_ = B.build_inputs()
# N frames of real rendered depth along an extended trajectory
from tracking_sdf_tpu.core.lie import pose_compose, se3_exp
import jax.numpy as jnp

p = poses[0]
frames = []
for k in range(N + 1):
    xi = jnp.asarray([0.006, -0.003, 0.005, 0.005, -0.004, 0.004],
                     jnp.float32) * (1.0 + 0.3 * (-1) ** k)
    depth = np.asarray(render_scene_depth(scene, cam, p))
    frames.append(depth)
    p = pose_compose(p, se3_exp(xi))


def run(label, mesh):
    import dataclasses

    r = Reconstruction(cam, dataclasses.replace(cfg, trajectory_path=None),
                       mesh=mesh)
    r.chunk_phase_metrics = False  # timing run: skip the calibration pass
    r.process_frame(frames[0], timestamp=0.0)
    t_chunks = []
    for c in range(3):
        batch = np.stack(frames[1 + c * CHUNK: 1 + (c + 1) * CHUNK])
        t0 = time.perf_counter()
        r.process_chunk(batch,
                        timestamps=[float(i) for i in range(CHUNK)])
        t_chunks.append((time.perf_counter() - t0) / CHUNK * 1e3)
    r.close()
    print(f"{label:24s} chunks ms/frame: "
          + " ".join(f"{t:7.1f}" for t in t_chunks)
          + f"   steady {min(t_chunks[1:]):.1f}", flush=True)
    return min(t_chunks[1:])


print(f"# SPMD chunk tax probe: preset {cfg.grid.m}^3, chunk {CHUNK}",
      flush=True)
single = run("single-device", None)
mesh1 = make_mesh(jax.devices()[:1])
sharded = run("1-device mesh (SPMD)", mesh1)
print(f"# tax: {sharded / single:.3f}x "
      f"({'PASS' if sharded <= 1.08 * single else 'above 8%'})", flush=True)
