import numpy as np
import jax.numpy as jnp

from tracking_sdf_tpu.core.camera import PinholeCamera, backproject
from tracking_sdf_tpu.data import SphereScene, look_at, render_scene_depth
from tracking_sdf_tpu.tracking.preprocess import (
    bilateral_filter,
    estimate_normals,
    preprocess_frame,
)

CAM = PinholeCamera(fx=80.0, fy=80.0, cx=63.5, cy=47.5, width=128, height=96)
SCENE = SphereScene(center=(0.0, 0.0, 0.0), radius=0.5)
POSE = look_at((0.0, -1.6, 0.2), (0.0, 0.0, 0.0))


def test_bilateral_denoises_and_preserves_holes():
    import jax

    depth = render_scene_depth(SCENE, CAM, POSE)
    noisy = render_scene_depth(SCENE, CAM, POSE, noise_sigma=0.01,
                               key=jax.random.PRNGKey(0))
    filtered = bilateral_filter(noisy)
    valid = np.isfinite(np.asarray(depth))
    # NaN holes preserved exactly
    assert np.array_equal(np.isfinite(np.asarray(filtered)), valid)
    # noise reduced (interior pixels)
    err_noisy = np.abs(np.asarray(noisy) - np.asarray(depth))[valid]
    err_filt = np.abs(np.asarray(filtered) - np.asarray(depth))[valid]
    assert np.median(err_filt) < 0.6 * np.median(err_noisy)


def test_bilateral_separable_close_to_full():
    """The separable approximation must denoise like the full kernel
    (same contract: holes preserved, noise reduced) and stay close to the
    full kernel away from edges — the presets A/B it on ATE, this pins
    the local behavior."""
    import jax

    from tracking_sdf_tpu.tracking.preprocess import (
        bilateral_filter_separable,
    )

    depth = render_scene_depth(SCENE, CAM, POSE)
    noisy = render_scene_depth(SCENE, CAM, POSE, noise_sigma=0.01,
                               key=jax.random.PRNGKey(0))
    full = np.asarray(bilateral_filter(noisy))
    sep = np.asarray(bilateral_filter_separable(noisy))
    valid = np.isfinite(np.asarray(depth))
    assert np.array_equal(np.isfinite(sep), valid)
    err_noisy = np.abs(np.asarray(noisy) - np.asarray(depth))[valid]
    err_sep = np.abs(sep - np.asarray(depth))[valid]
    assert np.median(err_sep) < 0.6 * np.median(err_noisy)
    # close to the full kernel in the bulk
    diff = np.abs(sep - full)[valid]
    assert np.median(diff) < 3e-3


def test_normals_match_analytic_sphere():
    depth = render_scene_depth(SCENE, CAM, POSE)
    points = backproject(CAM, depth)
    n_est = np.asarray(estimate_normals(points))

    pts = np.asarray(points)
    world = pts @ np.asarray(POSE.R).T + np.asarray(POSE.t)
    n_world = world / np.maximum(np.linalg.norm(world, axis=-1, keepdims=True), 1e-9)
    n_cam = n_world @ np.asarray(POSE.R)
    flip = np.sum(n_cam * pts, axis=-1, keepdims=True) > 0
    n_true = np.where(flip, -n_cam, n_cam)

    both = np.all(np.isfinite(n_est), -1) & np.all(np.isfinite(n_true), -1)
    assert both.sum() > 500
    cosang = np.clip(np.sum(n_est[both] * n_true[both], axis=-1), -1, 1)
    ang = np.degrees(np.arccos(cosang))
    assert np.median(ang) < 5.0, np.median(ang)
    # orientation: toward the camera
    assert np.all(np.sum(n_est[both] * pts[both], axis=-1) < 1e-6)


def test_preprocess_frame_pipeline():
    depth = render_scene_depth(SCENE, CAM, POSE)
    points, normals = preprocess_frame(depth, cam=CAM)
    assert points.shape == (CAM.height, CAM.width, 3)
    assert normals.shape == (CAM.height, CAM.width, 3)
    n_ok = np.all(np.isfinite(np.asarray(normals)), -1)
    assert n_ok.sum() > 500
    # all-NaN input survives the full pipeline
    points2, normals2 = preprocess_frame(jnp.full_like(depth, jnp.nan), cam=CAM)
    assert not np.any(np.isfinite(np.asarray(normals2)))
