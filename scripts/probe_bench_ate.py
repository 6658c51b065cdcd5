"""Closed-loop 120-frame ATE on the BENCH scene (VERDICT r2 weak-item 6).

The 10-frame bench loop reports a final |t err| of 28-32 mm at the
shipped presets, explained as harness-internal drift (share-smeared
model + alternating-jitter walk, no loop closure). This retires the
question: the same scene and the same motion model, 120 frames, through
the real Reconstruction runner, scored with the same Umeyama ATE the
dataset evals use. If the 28-32 mm were a real preset regression, it
would compound here; if it's drift noise, ATE stays at the dataset
oracle's scale.

Env: PRESET=tum256|tum512.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import dataclasses

import jax.numpy as jnp
import numpy as np

import bench as B
from tracking_sdf_tpu import config
from tracking_sdf_tpu.core.camera import backproject, ros_default_camera
from tracking_sdf_tpu.core.lie import pose_compose, se3_exp
from tracking_sdf_tpu.data.synthetic import look_at, render_scene_depth
from tracking_sdf_tpu.pipeline.runner import Reconstruction
from tracking_sdf_tpu.pipeline.trajectory import align_umeyama

PRESET = os.environ.get("PRESET", "tum256")
N = int(os.environ.get("FRAMES", "120"))

scene = B.make_scene()
cam = ros_default_camera()
pose0 = look_at((0.0, -0.8, 0.8), (0.0, 1.2, 0.7))
xi_base = jnp.asarray([0.008, -0.004, 0.007, 0.007, -0.005, 0.006],
                      jnp.float32)
# OSCILLATING walk: the exact bench 10-frame leg retraced forward/back
# so the camera stays in the observed zone for all N frames (the naive
# 120-frame composition walks ~1.3 m + ~108 deg out of the scene — at
# frame 60 the view is wall-only/unobservable and ANY tracker diverges;
# that's scene coverage, not tracking). Per-frame motion magnitude and
# jitter are identical to the bench's.
leg = [pose0]
for k in range(1, 11):
    xi_k = xi_base * (1.0 + 0.3 * (1.0 if k % 2 == 0 else -1.0))
    leg.append(pose_compose(leg[-1], se3_exp(xi_k)))
cycle = leg + leg[-2::-1]  # 0..10..1 (20 poses per cycle)
poses = [cycle[k % len(cycle)] for k in range(N)]

cfg = dataclasses.replace(config.preset(PRESET), trajectory_path=None)
recon = Reconstruction(cam, cfg, initial_pose=pose0)
render = jax.jit(lambda p: render_scene_depth(scene, cam, p))

est, gt = [], []
t0 = time.perf_counter()
for k in range(N):
    depth = render(poses[k])
    recon.process_frame(depth, timestamp=float(k))
    est.append(np.asarray(recon.pose.t))
    gt.append(np.asarray(poses[k].t))
    if k % 30 == 0:
        print(f"  frame {k}: |t err| "
              f"{np.linalg.norm(est[-1] - gt[-1])*1e3:.1f} mm", flush=True)
wall = time.perf_counter() - t0
src, dst = np.asarray(est), np.asarray(gt)
s, R, t = align_umeyama(src, dst)
aligned = (s * (R @ src.T)).T + t
ate = float(np.sqrt((np.linalg.norm(aligned - dst, axis=1) ** 2).mean()))
final = np.linalg.norm(est[-1] - gt[-1]) * 1e3
print(f"{PRESET}: bench-scene closed-loop {N} frames  "
      f"ATE {ate*1e3:.1f} mm  final |t err| {final:.1f} mm  "
      f"({wall:.0f} s wall)", flush=True)
