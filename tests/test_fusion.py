import numpy as np
import jax.numpy as jnp

from tracking_sdf_tpu.config import FusionConfig, GridParams
from tracking_sdf_tpu.core.camera import PinholeCamera, backproject
from tracking_sdf_tpu.core.lie import Pose
from tracking_sdf_tpu.data.synthetic import SphereScene, look_at, render_scene_depth
from tracking_sdf_tpu.fusion import fuse_frame, weighting
from tracking_sdf_tpu.grid import empty_grid
import ref_numpy

# Small, CPU-oracle-friendly setup (the oracle is a pure python triple loop).
M = 24
PARAMS = GridParams(m=M, width=2.0, height=2.0, depth=2.0,
                    origin=(-1.0, -1.0, -1.0), delta=0.15, epsilon=0.02)
CAM = PinholeCamera(fx=40.0, fy=40.0, cx=31.5, cy=23.5, width=64, height=48)
SCENE = SphereScene(center=(0.0, 0.0, 0.0), radius=0.5)


def _make_frame(pose):
    """Depth/points/normals for the analytic sphere; exact normals."""
    depth = render_scene_depth(SCENE, CAM, pose)
    points = backproject(CAM, depth)
    # exact sphere normals in world, rotated into camera frame, oriented
    # toward the camera (n·p < 0), like PCL's viewpoint orientation.
    pts_np = np.asarray(points)
    world = pts_np @ np.asarray(pose.R).T + np.asarray(pose.t)
    n_world = world - np.asarray(SCENE.center)
    n_world /= np.maximum(np.linalg.norm(n_world, axis=-1, keepdims=True), 1e-9)
    n_cam = n_world @ np.asarray(pose.R)  # R^T n
    flip = np.sum(n_cam * pts_np, axis=-1, keepdims=True) > 0
    n_cam = np.where(flip, -n_cam, n_cam)
    return points, jnp.asarray(n_cam, dtype=jnp.float32)


def test_fuse_single_frame_matches_reference_oracle():
    pose = look_at((0.0, -1.6, 0.2), (0.0, 0.0, 0.0))
    points, normals = _make_frame(pose)
    rng = np.random.default_rng(0)
    rgb255 = rng.uniform(0, 255, size=(CAM.height, CAM.width, 3)).astype(np.float32)

    grid = empty_grid(PARAMS)
    grid = fuse_frame(
        grid, pose, points, normals, jnp.asarray(rgb255 / 255.0),
        params=PARAMS, cam=CAM, cfg=FusionConfig(),
    )

    ref = ref_numpy.RefGrid(M, PARAMS.width, PARAMS.height, PARAMS.depth,
                            PARAMS.origin, PARAMS.delta, PARAMS.epsilon)
    ref_numpy.fuse_frame_ref(
        ref, np.asarray(pose.R, np.float64), np.asarray(pose.t, np.float64),
        np.array([[CAM.fx, 0, CAM.cx], [0, CAM.fy, CAM.cy], [0, 0, 1.0]]),
        np.asarray(points), np.asarray(normals), rgb255,
    )

    W_ours = np.asarray(grid.W)
    np.testing.assert_allclose(W_ours, ref.W, rtol=1e-3, atol=1e-4)
    observed = ref.W > 0
    assert observed.sum() > 200  # the frame actually fused something
    # canonical D is the NEGATION of the reference's stored field
    np.testing.assert_allclose(
        -np.asarray(grid.D)[observed], ref.D[observed], rtol=1e-3, atol=2e-4
    )
    color_obs = ref.Wc > 0
    assert color_obs.sum() > 200
    np.testing.assert_allclose(
        np.asarray(grid.R)[color_obs] * 255.0, ref.R[color_obs], rtol=1e-3, atol=0.1
    )
    np.testing.assert_allclose(
        np.asarray(grid.Wc)[color_obs], ref.Wc[color_obs], rtol=1e-3, atol=1e-4
    )


def test_fuse_two_frames_running_mean_matches_oracle():
    poses = [
        look_at((0.0, -1.6, 0.2), (0.0, 0.0, 0.0)),
        look_at((0.8, -1.4, -0.1), (0.0, 0.0, 0.0)),
    ]
    grid = empty_grid(PARAMS)
    ref = ref_numpy.RefGrid(M, PARAMS.width, PARAMS.height, PARAMS.depth,
                            PARAMS.origin, PARAMS.delta, PARAMS.epsilon)
    K = np.array([[CAM.fx, 0, CAM.cx], [0, CAM.fy, CAM.cy], [0, 0, 1.0]])
    for pose in poses:
        points, normals = _make_frame(pose)
        grid = fuse_frame(grid, pose, points, normals, None,
                          params=PARAMS, cam=CAM,
                          cfg=FusionConfig(fuse_color=False))
        ref_numpy.fuse_frame_ref(ref, np.asarray(pose.R, np.float64),
                                 np.asarray(pose.t, np.float64), K,
                                 np.asarray(points), np.asarray(normals))
    observed = ref.W > 0
    assert observed.sum() > 300
    np.testing.assert_allclose(np.asarray(grid.W), ref.W, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        -np.asarray(grid.D)[observed], ref.D[observed], rtol=1e-3, atol=3e-4
    )


def test_fused_sdf_approximates_true_distance_near_surface():
    """Near the surface, the fused point-to-plane TSDF should approximate the
    analytic sphere SDF (paper §IV-B)."""
    pose = look_at((0.0, -1.6, 0.0), (0.0, 0.0, 0.0))
    points, normals = _make_frame(pose)
    grid = empty_grid(PARAMS)
    grid = fuse_frame(grid, pose, points, normals, None,
                      params=PARAMS, cam=CAM, cfg=FusionConfig(fuse_color=False))
    from tracking_sdf_tpu.grid import voxel_centers_world

    x, y, z = voxel_centers_world(PARAMS)
    pts = np.stack(np.broadcast_arrays(np.asarray(x), np.asarray(y), np.asarray(z)), -1)
    true_sdf = np.linalg.norm(pts, axis=-1) - SCENE.radius
    W = np.asarray(grid.W)
    near = (W > 0) & (np.abs(true_sdf) < 0.05)
    assert near.sum() > 100
    err = np.abs(np.asarray(grid.D)[near] - true_sdf[near])
    assert np.median(err) < 0.01, np.median(err)


def test_weighting_variants():
    d = jnp.asarray([0.5, 0.1, 0.0, -0.02, -0.05, -0.1, -0.15])
    eps, delta = 0.02, 0.15
    w_exp = np.asarray(weighting("exponential", d, eps, delta))
    w_lin = np.asarray(weighting("linear", d, eps, delta))
    w_const = np.asarray(weighting("constant", d, eps, delta))
    # free space & within eps behind: full weight
    np.testing.assert_allclose(w_exp[:3], 1.0)
    np.testing.assert_allclose(w_lin[:3], 1.0)
    np.testing.assert_allclose(w_const, 1.0)
    # behind the surface: decaying
    assert np.all(np.diff(w_exp[3:]) < 0)
    assert np.all(np.diff(w_lin[3:]) <= 0)
    np.testing.assert_allclose(w_lin[-1], 0.0, atol=1e-6)  # zero at -delta
    # exponential matches the reference formula on ref-convention distances
    for dv, wv in zip(np.asarray(d), w_exp):
        assert abs(ref_numpy.weighting_ref(-dv, eps, delta) - wv) < 1e-6


def test_max_weight_clamp_is_stable_ema():
    """With max_weight set, a saturated voxel fusing the SAME observation
    repeatedly must converge toward it (exponential moving average with
    uncapped-sum denominator), never diverge. Regression for dividing by
    the CLAMPED weight, which made D grow by (w/Wmax)*d per frame forever."""
    pose = look_at((0.0, -1.6, 0.2), (0.0, 0.0, 0.0))
    points, normals = _make_frame(pose)
    cfg = FusionConfig(fuse_color=False, max_weight=3.0)

    grid = empty_grid(PARAMS)
    snaps = []
    for _ in range(12):
        grid = fuse_frame(grid, pose, points, normals, None,
                          params=PARAMS, cam=CAM, cfg=cfg)
        snaps.append(np.asarray(grid.D).copy())
    W = np.asarray(grid.W)
    sat = W >= 3.0 - 1e-6
    assert sat.sum() > 100  # the clamp actually engaged
    # same observation every frame: the fused value must be a fixed point
    # after saturation, not a linear ramp
    drift_late = np.abs(snaps[-1] - snaps[-2])[sat].max()
    assert drift_late < 1e-4, drift_late
    # and values stay within the truncation band (divergence blows past it)
    assert np.abs(snaps[-1][W > 0]).max() <= PARAMS.width * 3 + 1e-3
