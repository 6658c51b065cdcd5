"""Fused Pallas GN-reduction kernel == the XLA path (interpret mode).

Both arms share grid.interp.trilinear_from_corners and receive identical
pre-gathered inputs, so equality here pins the kernel's masking, Jacobian
assembly, and MXU reduction. The speed A/B runs on hardware
(scripts/probe_pallas_gn.py); this is the correctness gate.
"""
import jax.numpy as jnp
import numpy as np

from tracking_sdf_tpu.config import GridParams
from tracking_sdf_tpu.core.camera import backproject
from tracking_sdf_tpu.data.synthetic import (
    SphereScene, grid_from_scene, look_at, render_scene_depth)
from tracking_sdf_tpu.core.camera import PinholeCamera
from tracking_sdf_tpu.grid.interp import masked_view
from tracking_sdf_tpu.tracking.gauss_newton import (
    normal_equations, pixel_residuals_analytic)
from tracking_sdf_tpu.tracking.pallas_gn import (
    gather_corner_inputs, gn_reduce_pallas, gn_reduce_xla)

PARAMS = GridParams(m=48, width=2.0, height=2.0, depth=2.0,
                    origin=(-1.0, -1.0, -1.0), delta=0.15, epsilon=0.02)
CAM = PinholeCamera(fx=60.0, fy=60.0, cx=47.5, cy=35.5, width=96, height=72)
SCENE = SphereScene(center=(0.1, 0.05, 0.0), radius=0.45)
POSE = look_at((0.0, -1.5, 0.2), (0.0, 0.0, 0.0))


def _inputs():
    grid = grid_from_scene(PARAMS, SCENE)
    depth = render_scene_depth(SCENE, CAM, POSE)
    # NaN speckle: the masking paths must agree too
    depth = np.array(depth)  # writable copy
    rng = np.random.default_rng(0)
    depth[rng.random(depth.shape) < 0.05] = np.nan
    pts = backproject(CAM, jnp.asarray(depth)).reshape(-1, 3)
    Dm = masked_view(grid.D, grid.W)
    return grid, Dm, pts


def test_pallas_gn_matches_xla_reduce():
    grid, Dm, pts = _inputs()
    d_raw, inb, f, a, vin, scale = gather_corner_inputs(
        Dm, POSE, pts, params=PARAMS)
    A_x, b_x = gn_reduce_xla(d_raw, inb, f, a, vin, scale)
    A_p, b_p = gn_reduce_pallas(d_raw, inb, f, a, vin, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(A_p), np.asarray(A_x),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(b_p), np.asarray(b_x),
                               rtol=1e-5, atol=1e-5)


def test_corner_inputs_match_production_residuals():
    """The shared front half + XLA arm reproduce the production
    pixel_residuals_analytic + normal_equations numbers exactly (the A/B
    measures the real pipeline, not a strawman)."""
    grid, Dm, pts = _inputs()
    phi, J, mask = pixel_residuals_analytic(grid, POSE, pts, params=PARAMS,
                                            Dm=Dm)
    A_ref, b_ref = normal_equations(phi, J, mask)
    d_raw, inb, f, a, vin, scale = gather_corner_inputs(
        Dm, POSE, pts, params=PARAMS)
    A_x, b_x = gn_reduce_xla(d_raw, inb, f, a, vin, scale)
    np.testing.assert_allclose(np.asarray(A_x), np.asarray(A_ref),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(b_x), np.asarray(b_ref),
                               rtol=1e-5, atol=1e-5)
