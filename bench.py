"""Headline benchmark: fused frames/s/chip on the flagship configuration.

One frame = Gauss-Newton tracking (640x480, pixel stride 3, to convergence
from a realistic inter-frame perturbation) + full TSDF depth+color fusion
into the 256^3 grid — the reference's own per-frame pipeline
(sdf_reconstruction.cpp:21-80) at its own configuration (:83-88).

Baseline: the paper's CUDA implementation runs ~23 ms/frame at m=256 on a
laptop Quadro GPU (bylow_etal_rss2013.pdf §V-E; BASELINE.md) = 43.5 frames/s.

Prints ONE JSON line:
  {"metric": "fused_frames_per_s_per_chip", "value": N, "unit": "frames/s",
   "vs_baseline": N / 43.478}
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BASELINE_FPS = 1000.0 / 23.0  # paper §V-E, m=256


def main():
    from tracking_sdf_tpu.config import preset
    from tracking_sdf_tpu.core.camera import backproject, ros_default_camera
    from tracking_sdf_tpu.core.lie import Pose, pose_compose, se3_exp
    from tracking_sdf_tpu.data.synthetic import (
        CuboidScene,
        SphereScene,
        look_at,
        render_scene_depth,
    )
    from tracking_sdf_tpu.fusion.fuse import fuse_frame
    from tracking_sdf_tpu.grid.grid import empty_grid
    from tracking_sdf_tpu.tracking.gauss_newton import track_frame
    from tracking_sdf_tpu.tracking.preprocess import estimate_normals

    cfg = preset("tum256")
    params, tcfg, fcfg = cfg.grid, cfg.tracking, cfg.fusion
    cam = ros_default_camera()

    # Scene with all 6 DoF observable, placed in the reference volume.
    sphere = SphereScene(center=(0.3, 1.2, 0.9), radius=0.45)
    box = CuboidScene(min_corner=(-1.0, 1.0, 0.2), max_corner=(-0.3, 1.9, 0.9))

    class Scene:
        def sdf(self, x):
            return jnp.minimum(sphere.sdf(x), box.sdf(x))

        def color(self, x):
            return sphere.color(x)

        def intersect(self, o, d):
            ta, tb = sphere.intersect(o, d), box.intersect(o, d)
            return jnp.where(jnp.isnan(ta), tb,
                             jnp.where(jnp.isnan(tb), ta, jnp.minimum(ta, tb)))

    scene = Scene()
    pose_gt = look_at((0.0, -0.8, 0.8), (0.0, 1.2, 0.7))
    depth = render_scene_depth(scene, cam, pose_gt)
    pts = backproject(cam, depth)
    normals = estimate_normals(pts)
    rgb = jnp.full(pts.shape, 0.5, dtype=jnp.float32)
    stride = tcfg.pixel_stride
    pts_track = pts[::stride, ::stride].reshape(-1, 3)

    # realistic inter-frame motion: ~1.5 cm + ~0.9 deg, alternating sign so
    # the tracker does real Gauss-Newton work every frame
    xi = jnp.asarray([0.010, -0.008, 0.006, 0.009, -0.007, 0.008], jnp.float32)

    def frame(grid, pose0):
        res = track_frame(grid, pose0, pts_track, params=params, cfg=tcfg)
        grid = fuse_frame(grid, res.pose, pts, normals, rgb,
                          params=params, cam=cam, cfg=fcfg)
        return grid, res

    frame = jax.jit(frame, donate_argnums=(0,))

    grid = empty_grid(params)
    grid = fuse_frame(grid, pose_gt, pts, normals, rgb,
                      params=params, cam=cam, cfg=fcfg)  # bootstrap frame 1
    pose_p = pose_compose(se3_exp(xi), pose_gt)
    pose_m = pose_compose(se3_exp(-xi), pose_gt)

    # warmup / compile
    grid, res = frame(grid, pose_p)
    jax.block_until_ready(grid)

    # No host reads inside the loop: a device->host sync per frame would
    # measure dispatch/tunnel latency, not device throughput.
    n_frames = 100
    t0 = time.perf_counter()
    for k in range(n_frames):
        grid, res = frame(grid, pose_p if k % 2 == 0 else pose_m)
    jax.block_until_ready(grid)
    dt = time.perf_counter() - t0
    iters = int(res.iterations) * n_frames  # all frames see the same problem

    fps = n_frames / dt
    print(json.dumps({
        "metric": "fused_frames_per_s_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))
    # context (not parsed by the driver): per-phase detail on stderr
    import sys
    print(
        f"# {jax.devices()[0].platform}:{jax.devices()[0].device_kind} "
        f"m={params.m} frames={n_frames} wall={dt:.3f}s "
        f"gn_iters/frame={iters / n_frames:.1f} "
        f"tracked+fused {fps:.1f} fps (baseline {BASELINE_FPS:.1f})",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
