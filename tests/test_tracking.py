import numpy as np
import jax.numpy as jnp

from tracking_sdf_tpu.config import GridParams, TrackingConfig
from tracking_sdf_tpu.core.camera import PinholeCamera, backproject
from tracking_sdf_tpu.core.lie import Pose, se3_exp, pose_compose, se3_log, pose_inverse
from tracking_sdf_tpu.data import SphereScene, CuboidScene, grid_from_scene, look_at, render_scene_depth
from tracking_sdf_tpu.tracking import (
    track_frame,
    strided_points,
    pixel_residuals_central,
    normal_equations,
)
import ref_numpy

PARAMS = GridParams(m=48, width=2.0, height=2.0, depth=2.0,
                    origin=(-1.0, -1.0, -1.0), delta=0.15, epsilon=0.02)
CAM = PinholeCamera(fx=60.0, fy=60.0, cx=47.5, cy=35.5, width=96, height=72)
# two objects break the sphere's rotational symmetry so all 6 DoF are observable
SCENE_A = SphereScene(center=(0.15, 0.1, 0.0), radius=0.4)
SCENE_B = CuboidScene(min_corner=(-0.75, -0.4, -0.55), max_corner=(-0.35, 0.4, 0.15))


class TwoScenes:
    def sdf(self, x):
        return jnp.minimum(SCENE_A.sdf(x), SCENE_B.sdf(x))

    def color(self, x):
        return SCENE_A.color(x)

    def intersect(self, origins, dirs):
        ta = SCENE_A.intersect(origins, dirs)
        tb = SCENE_B.intersect(origins, dirs)
        return jnp.where(jnp.isnan(ta), tb, jnp.where(jnp.isnan(tb), ta, jnp.minimum(ta, tb)))


SCENE = TwoScenes()


def _points_for(pose, stride=2):
    depth = render_scene_depth(SCENE, CAM, pose)
    pts = backproject(CAM, depth)
    return strided_points(pts, stride)


def _pose_err(a: Pose, b: Pose):
    delta = pose_compose(pose_inverse(a), b)
    xi = np.asarray(se3_log(delta))
    return np.linalg.norm(xi[:3]), np.linalg.norm(xi[3:])


def test_track_recovers_perturbed_pose_analytic():
    true_pose = look_at((0.0, -1.5, 0.25), (0.0, 0.0, 0.0))
    grid = grid_from_scene(PARAMS, SCENE)
    points = _points_for(true_pose)

    xi = jnp.asarray([0.03, -0.02, 0.04, 0.02, -0.03, 0.02], dtype=jnp.float32)
    pose0 = pose_compose(se3_exp(xi), true_pose)
    t_err0, r_err0 = _pose_err(pose0, true_pose)

    res = track_frame(grid, pose0, points, params=PARAMS,
                      cfg=TrackingConfig(jacobian="analytic", max_iterations=30))
    t_err, r_err = _pose_err(res.pose, true_pose)
    assert int(res.num_valid) > 200
    assert t_err < 0.15 * t_err0, (t_err, t_err0)
    assert r_err < 0.15 * r_err0, (r_err, r_err0)
    assert t_err < 0.004, t_err
    assert r_err < 0.004, r_err


def test_track_recovers_perturbed_pose_central_reference_mode():
    true_pose = look_at((0.0, -1.5, 0.25), (0.0, 0.0, 0.0))
    grid = grid_from_scene(PARAMS, SCENE)
    points = _points_for(true_pose)
    xi = jnp.asarray([0.02, -0.015, 0.025, 0.015, -0.02, 0.01], dtype=jnp.float32)
    pose0 = pose_compose(se3_exp(xi), true_pose)
    t_err0, r_err0 = _pose_err(pose0, true_pose)
    res = track_frame(
        grid, pose0, points, params=PARAMS,
        cfg=TrackingConfig(jacobian="central", convergence="signed",
                           pose_update="reference", max_iterations=20),
    )
    t_err, r_err = _pose_err(res.pose, true_pose)
    # The reference's probe scheme (1-voxel central differences on the
    # non-smooth Shepard interpolant) plateaus well above the analytic
    # mode's accuracy at this coarse 48^3 resolution — require a solid
    # improvement, not convergence (the exact per-pixel parity is covered
    # by test_central_residuals_match_reference_oracle).
    assert t_err < 0.7 * t_err0
    assert r_err < 0.7 * r_err0


def test_central_residuals_match_reference_oracle():
    """Per-pixel 13-probe Jacobians + normal equations == the oracle's."""
    true_pose = look_at((0.0, -1.5, 0.25), (0.0, 0.0, 0.0))
    # grid in REFERENCE convention for the oracle; ours is the negation
    grid = grid_from_scene(PARAMS, SCENE)
    ref = ref_numpy.RefGrid(PARAMS.m, PARAMS.width, PARAMS.height, PARAMS.depth,
                            PARAMS.origin, PARAMS.delta, PARAMS.epsilon)
    ref.D = -np.asarray(grid.D)
    ref.W = np.asarray(grid.W)

    pose = pose_compose(se3_exp(jnp.asarray([0.02, 0.0, -0.01, 0.01, 0.0, 0.0])), true_pose)
    depth = render_scene_depth(SCENE, CAM, pose)
    pts_img = backproject(CAM, depth)
    points = strided_points(pts_img, 3)

    phi, J, mask = pixel_residuals_central(
        grid, pose, points, params=PARAMS, v_h=1.0, w_h=0.01)
    phi, J, mask = np.asarray(phi), np.asarray(J), np.asarray(mask)

    R_np = np.asarray(pose.R, np.float64)
    t_np = np.asarray(pose.t, np.float64)
    rots = ref_numpy.build_linearized_rotations(R_np, 0.01)
    pts_np = np.asarray(points)
    n_checked = 0
    for idx in range(pts_np.shape[0]):
        p = pts_np[idx]
        if np.any(np.isnan(p)):
            assert not mask[idx]
            continue
        deriv, ok, val = ref_numpy.get_partial_derivative(
            ref, R_np, t_np, rots, p.astype(np.float64), 1.0, 0.01)
        assert bool(mask[idx]) == ok, (idx, p)
        if ok:
            n_checked += 1
            # ours is computed on -D: phi and J are both negated
            np.testing.assert_allclose(-phi[idx], val, rtol=2e-3, atol=2e-4)
            np.testing.assert_allclose(-J[idx], deriv, rtol=2e-3, atol=2e-3)
    assert n_checked > 100
    # A, b are sign-invariant (both J and phi flip): compare directly
    A, b = normal_equations(jnp.asarray(phi), jnp.asarray(J), jnp.asarray(mask))
    A_ref = np.zeros((6, 6))
    b_ref = np.zeros(6)
    for idx in range(pts_np.shape[0]):
        p = pts_np[idx]
        if np.any(np.isnan(p)):
            continue
        deriv, ok, val = ref_numpy.get_partial_derivative(
            ref, R_np, t_np, rots, p.astype(np.float64), 1.0, 0.01)
        if ok:
            A_ref += np.outer(deriv, deriv)
            b_ref += val * deriv
    np.testing.assert_allclose(np.asarray(A), A_ref, rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(b), b_ref, rtol=5e-3, atol=5e-3)


def test_full_gn_loop_matches_reference_oracle():
    """Whole-tracker parity: 3 fixed GN iterations in full reference mode
    (central differences, signed convergence, non-rotated-translation update,
    no damping) against the oracle's estimate_new_position
    (camera_tracking.cpp:66-245). Covers the solve + exp-map + composition
    chain beyond the per-pixel checks above."""
    true_pose = look_at((0.0, -1.5, 0.25), (0.0, 0.0, 0.0))
    grid = grid_from_scene(PARAMS, SCENE)
    ref = ref_numpy.RefGrid(PARAMS.m, PARAMS.width, PARAMS.height, PARAMS.depth,
                            PARAMS.origin, PARAMS.delta, PARAMS.epsilon)
    ref.D = -np.asarray(grid.D, np.float64)
    ref.W = np.asarray(grid.W, np.float64)

    pose0 = pose_compose(
        se3_exp(jnp.asarray([0.015, -0.01, 0.02, 0.01, -0.015, 0.01])), true_pose
    )
    depth = render_scene_depth(SCENE, CAM, pose0)  # rendered AT pose0: residuals
    pts_img = backproject(CAM, depth)              # nonzero but bounded

    res = track_frame(
        grid, pose0, strided_points(pts_img, 3), params=PARAMS,
        cfg=TrackingConfig(jacobian="central", convergence="signed",
                           pose_update="reference", damping=0.0,
                           max_iterations=3, max_twist_diff=-1.0),  # never "converges"
    )
    R_ref, t_ref = ref_numpy.estimate_new_position(
        ref, np.asarray(pose0.R, np.float64), np.asarray(pose0.t, np.float64),
        np.asarray(pts_img, np.float64), max_iter=3, max_twist_diff=-1.0,
    )
    assert int(res.iterations) == 3
    np.testing.assert_allclose(np.asarray(res.pose.R), R_ref, atol=2e-3)
    np.testing.assert_allclose(np.asarray(res.pose.t), t_ref, atol=2e-3)


def test_track_with_nan_holes_and_no_observations():
    grid = grid_from_scene(PARAMS, SCENE)
    pose = look_at((0.0, -1.5, 0.25), (0.0, 0.0, 0.0))
    # all-NaN points: tracker must return the initial pose, not NaN
    points = jnp.full((500, 3), jnp.nan)
    res = track_frame(grid, pose, points, params=PARAMS)
    assert int(res.num_valid) == 0
    np.testing.assert_allclose(np.asarray(res.pose.R), np.asarray(pose.R), atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.pose.t), np.asarray(pose.t), atol=1e-6)
    assert np.all(np.isfinite(np.asarray(res.pose.R)))
