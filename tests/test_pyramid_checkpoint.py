"""Coarse-to-fine pyramid tracking + checkpoint/resume + bricked runner."""
import dataclasses

import jax.numpy as jnp
import numpy as np

from tracking_sdf_tpu.config import (
    FusionConfig,
    GridParams,
    PipelineConfig,
    TrackingConfig,
)
from tracking_sdf_tpu.core.camera import PinholeCamera, backproject
from tracking_sdf_tpu.core.lie import pose_compose, pose_inverse, se3_exp, se3_log
from tracking_sdf_tpu.data.synthetic import (
    CuboidScene,
    SphereScene,
    grid_from_scene,
    look_at,
    render_scene_depth,
)
from tracking_sdf_tpu.pipeline import Reconstruction
from tracking_sdf_tpu.tracking import track_frame
from tracking_sdf_tpu.tracking.pyramid import track_frame_pyramid

PARAMS = GridParams(m=48, width=2.0, height=2.0, depth=2.0,
                    origin=(-1.0, -1.0, -1.0), delta=0.15, epsilon=0.02)
CAM = PinholeCamera(fx=60.0, fy=60.0, cx=47.5, cy=35.5, width=96, height=72)
SPHERE = SphereScene(center=(0.15, 0.1, 0.0), radius=0.4)
BOX = CuboidScene(min_corner=(-0.75, -0.4, -0.55), max_corner=(-0.35, 0.4, 0.15))


class Scene:
    def sdf(self, x):
        return jnp.minimum(SPHERE.sdf(x), BOX.sdf(x))

    def color(self, x):
        return SPHERE.color(x)

    def intersect(self, o, d):
        ta, tb = SPHERE.intersect(o, d), BOX.intersect(o, d)
        return jnp.where(jnp.isnan(ta), tb,
                         jnp.where(jnp.isnan(tb), ta, jnp.minimum(ta, tb)))


SCENE = Scene()
TRUE_POSE = look_at((0.0, -1.5, 0.25), (0.0, 0.0, 0.0))


def _err(pose, ref):
    e = np.asarray(se3_log(pose_compose(pose_inverse(pose), ref)))
    return np.linalg.norm(e[:3]), np.linalg.norm(e[3:])


def test_pyramid_converges_and_uses_levels():
    grid = grid_from_scene(PARAMS, SCENE)
    depth = render_scene_depth(SCENE, CAM, TRUE_POSE)
    points = backproject(CAM, depth)

    xi = jnp.asarray([0.06, -0.05, 0.06, 0.04, -0.05, 0.04], dtype=jnp.float32)
    pose0 = pose_compose(se3_exp(xi), TRUE_POSE)
    cfg = TrackingConfig(max_iterations=30, pixel_stride=1)

    res, per_level = track_frame_pyramid(
        grid, pose0, points, params=PARAMS, cfg=cfg, levels=(4, 2, 1)
    )
    assert len(per_level) == 3
    assert all(int(r.iterations) >= 1 for r in per_level)
    t_err, r_err = _err(res.pose, TRUE_POSE)
    assert t_err < 0.005, t_err
    assert r_err < 0.005, r_err
    # the finest level starts near the optimum: few iterations needed there
    assert int(per_level[-1].iterations) <= int(per_level[0].iterations) + 5


def test_frame_skip_robustness_with_pyramid():
    """Paper §V-D: the tracker survives processing only every k-th frame
    (3x the inter-frame motion). The pyramid's coarse levels supply the
    wide convergence basin that fixed-stride GN lacks."""
    def orbit(n):
        out = []
        for i in range(n):
            a = 0.10 * np.sin(2 * np.pi * i / n)
            out.append(look_at((0.45 * np.sin(a), -1.45, 0.25), (0.0, 0.0, 0.0)))
        return out

    poses = orbit(12)[::3]  # every 3rd frame
    cfg = PipelineConfig(
        grid=PARAMS,
        tracking=TrackingConfig(max_iterations=20, pixel_stride=1),
        pyramid_levels=(4, 2, 1),
        trajectory_path=None,
        bilateral_filter=False,
    )
    recon = Reconstruction(CAM, cfg, initial_pose=poses[0])
    for i, p in enumerate(poses):
        depth = render_scene_depth(SCENE, CAM, p)
        recon.process_frame(depth, timestamp=float(i))
    t_err, r_err = _err(recon.pose, poses[-1])
    assert t_err < 0.05, t_err
    assert r_err < 0.06, r_err


def test_checkpoint_resume_bitwise_continuation(tmp_path):
    def orbit(n):
        out = []
        for i in range(n):
            a = 0.10 * np.sin(2 * np.pi * i / n)
            out.append(look_at((0.45 * np.sin(a), -1.45, 0.25), (0.0, 0.0, 0.0)))
        return out

    poses = orbit(5)
    cfg = PipelineConfig(grid=PARAMS, tracking=TrackingConfig(),
                         trajectory_path=None, bilateral_filter=False)
    depths = [render_scene_depth(SCENE, CAM, p) for p in poses]

    # uninterrupted run
    r1 = Reconstruction(CAM, cfg, initial_pose=poses[0])
    for i, d in enumerate(depths):
        r1.process_frame(d, timestamp=float(i))

    # interrupted at frame 3, checkpointed, resumed in a new runner
    r2 = Reconstruction(CAM, cfg, initial_pose=poses[0])
    for i, d in enumerate(depths[:3]):
        r2.process_frame(d, timestamp=float(i))
    ckpt = str(tmp_path / "ckpt")
    r2.save_checkpoint(ckpt)

    r3 = Reconstruction(CAM, cfg, initial_pose=poses[0])
    r3.restore_checkpoint(ckpt)
    assert r3.frame_num == 3
    for i, d in enumerate(depths[3:], start=3):
        r3.process_frame(d, timestamp=float(i))

    np.testing.assert_array_equal(np.asarray(r1.grid.D), np.asarray(r3.grid.D))
    np.testing.assert_array_equal(np.asarray(r1.grid.W), np.asarray(r3.grid.W))
    np.testing.assert_array_equal(np.asarray(r1.pose.R), np.asarray(r3.pose.R))
    np.testing.assert_array_equal(np.asarray(r1.pose.t), np.asarray(r3.pose.t))


def test_async_mesh_publisher(tmp_path):
    """The reference's 1 Hz vis thread, functional: publishes snapshots
    concurrently with fusion and writes a final mesh on close."""
    import os
    import time as _time

    cfg = PipelineConfig(grid=PARAMS, trajectory_path=None,
                         bilateral_filter=False, use_groundtruth=True)
    recon = Reconstruction(CAM, cfg, initial_pose=TRUE_POSE)
    mesh_path = str(tmp_path / "live.ply")
    pub = recon.start_mesh_publisher(mesh_path, with_colors=False)
    for i in range(3):
        depth = render_scene_depth(SCENE, CAM, TRUE_POSE)
        recon.process_frame(depth, timestamp=float(i), gt_pose=TRUE_POSE)
        _time.sleep(0.05)
    recon.close()  # stops the thread + publishes the final snapshot
    assert pub.published >= 1
    assert pub.errors == 0
    assert os.path.getsize(mesh_path) > 500


def test_mesh_publisher_rate_degrade_and_decimate(tmp_path):
    """(a) An export slower than the requested interval auto-stretches the
    publisher's effective interval (REPORTED: degraded_cycles + warning),
    never queues behind the device. (b) mesh_decimate publishes a coarser
    live mesh (metric D slicing) while the final export stays full-res."""
    import os
    import time as _time
    import warnings as _warnings

    from tracking_sdf_tpu.pipeline.visualizer import MeshPublisher

    # (a) rate degrade: a 0.25 s export against a 0.05 s interval
    def slow_export(_snap):
        _time.sleep(0.25)

    with _warnings.catch_warnings(record=True) as rec:
        _warnings.simplefilter("always")
        pub = MeshPublisher(slow_export, interval=0.05)
        pub.publish({"x": jnp.zeros(())})
        _time.sleep(0.8)
        pub.close(final=False)
    assert pub.degraded_cycles >= 1
    assert pub.effective_interval > 0.2
    assert any("auto" in str(w.message) or "instead" in str(w.message)
               for w in rec)

    # (b) decimated live publisher: coarser mesh than the final export
    cfg = PipelineConfig(grid=PARAMS, trajectory_path=None,
                         bilateral_filter=False, use_groundtruth=True,
                         mesh_decimate=2, mesh_hz=20.0)
    recon = Reconstruction(CAM, cfg, initial_pose=TRUE_POSE)
    live = str(tmp_path / "live2.ply")
    pub = recon.start_mesh_publisher(live, with_colors=False)
    for i in range(2):
        depth = render_scene_depth(SCENE, CAM, TRUE_POSE)
        recon.process_frame(depth, timestamp=float(i), gt_pose=TRUE_POSE)
        _time.sleep(0.1)
    final = str(tmp_path / "final.ply")
    n_full = recon.export_mesh(final)
    recon.close()
    assert pub.errors == 0, pub.last_error
    assert pub.published >= 1
    assert os.path.getsize(live) > 200
    assert n_full > 0
    # the decimated live mesh must be strictly smaller than the full-res
    # final export (2x coarser grid -> ~4x fewer surface cells)
    assert os.path.getsize(live) < os.path.getsize(final)


def test_tracking_failure_gate_drops_bad_frames():
    """A garbage frame (all-NaN depth) must not move the pose or touch the
    grid; the next good frame recovers (reference has no such guard)."""
    cfg = PipelineConfig(grid=PARAMS, tracking=TrackingConfig(),
                         trajectory_path=None, bilateral_filter=False)
    recon = Reconstruction(CAM, cfg, initial_pose=TRUE_POSE)
    depth = render_scene_depth(SCENE, CAM, TRUE_POSE)
    recon.process_frame(depth, timestamp=0.0)
    W_before = np.asarray(recon.grid.W).sum()
    pose_before = np.asarray(recon.pose.t).copy()

    bad = jnp.full_like(jnp.asarray(depth), jnp.nan)
    stat = recon.process_frame(bad, timestamp=1.0)
    assert stat.rejected
    np.testing.assert_array_equal(np.asarray(recon.pose.t), pose_before)
    assert np.asarray(recon.grid.W).sum() == W_before

    stat = recon.process_frame(depth, timestamp=2.0)
    assert not stat.rejected
    assert np.asarray(recon.grid.W).sum() > W_before
    # single-view fused model has a measured ~5-9 mm optimum offset
    t_err, r_err = _err(recon.pose, TRUE_POSE)
    assert t_err < 0.02 and r_err < 0.02


def test_runner_bricked_fusion_mode():
    cfg = PipelineConfig(
        grid=PARAMS,
        fusion=FusionConfig(mode="bricked", brick_shape=(8, 8, 16), brick_cap=160),
        trajectory_path=None,
        bilateral_filter=False,
    )
    recon = Reconstruction(CAM, cfg, initial_pose=TRUE_POSE)
    depth = render_scene_depth(SCENE, CAM, TRUE_POSE)
    recon.process_frame(depth, timestamp=0.0)
    assert recon.last_fuse_stats is not None
    assert int(recon.last_fuse_stats.overflow) == 0
    assert float(recon.grid.W.sum()) > 0
