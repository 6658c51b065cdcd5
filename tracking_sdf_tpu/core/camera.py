"""Pinhole camera model.

The reference receives K once from /camera/rgb/camera_info
(camera_tracking.cpp:22-36) and projects with (i, j) = (K x)/z, paper Eq. 2
(camera_tracking.cpp:40-47), where i is the image COLUMN and j the ROW
(cloud->at(i, j) is at(col, row)). Here the camera is a static NamedTuple of
Python floats so it can be a jit static argument; projection/backprojection
are pure jnp functions over arbitrarily-batched points.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp


class PinholeCamera(NamedTuple):
    fx: float
    fy: float
    cx: float
    cy: float
    width: int = 640
    height: int = 480

    @property
    def K(self) -> jnp.ndarray:
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=jnp.float32,
        )

    def scaled(self, factor: float) -> "PinholeCamera":
        """Camera for an image downscaled by `factor` (coarse-to-fine pyramid)."""
        return PinholeCamera(
            fx=self.fx / factor,
            fy=self.fy / factor,
            cx=(self.cx + 0.5) / factor - 0.5,
            cy=(self.cy + 0.5) / factor - 0.5,
            width=int(self.width // factor),
            height=int(self.height // factor),
        )


def tum_fr1_camera() -> PinholeCamera:
    """Calibrated intrinsics of the TUM freiburg1 sequences."""
    return PinholeCamera(fx=517.3, fy=516.5, cx=318.6, cy=255.3)


def ros_default_camera() -> PinholeCamera:
    """The factory Kinect intrinsics ROS publishes on camera_info."""
    return PinholeCamera(fx=525.0, fy=525.0, cx=319.5, cy=239.5)


def project(cam: PinholeCamera, points_cam: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame points (..., 3) -> continuous pixel coords (..., 2) = (u=col, v=row).

    Matches project_camera_to_image_plane (camera_tracking.cpp:40-47): divide
    by z AFTER applying K (identical result for a pinhole K).
    """
    x, y, z = points_cam[..., 0], points_cam[..., 1], points_cam[..., 2]
    safe_z = jnp.where(z == 0, 1.0, z)
    u = (cam.fx * x + cam.cx * z) / safe_z
    v = (cam.fy * y + cam.cy * z) / safe_z
    return jnp.stack([u, v], axis=-1)


def backproject(cam: PinholeCamera, depth: jnp.ndarray) -> jnp.ndarray:
    """Depth image (H, W) -> organized camera-frame point image (H, W, 3).

    Pixels with non-finite or <=0 depth yield NaN points, mirroring the
    organized NaN-holed clouds the reference consumes.
    """
    h, w = depth.shape
    v = jnp.arange(h, dtype=depth.dtype)[:, None]
    u = jnp.arange(w, dtype=depth.dtype)[None, :]
    valid = jnp.isfinite(depth) & (depth > 0)
    z = jnp.where(valid, depth, jnp.nan)
    x = (u - cam.cx) / cam.fx * z
    y = (v - cam.cy) / cam.fy * z
    return jnp.stack([x, y, z], axis=-1)


def pixel_rays(cam: PinholeCamera, stride: int = 1) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Unit-z ray directions in the CAMERA frame for a strided pixel lattice.

    Returns (dirs (Hs, Ws, 3), pix (Hs, Ws, 2)) where dirs have z == 1 (depth
    along a ray is then dirs * t with t = z-depth at stride 1).
    """
    v = jnp.arange(0, cam.height, stride, dtype=jnp.float32)[:, None]
    u = jnp.arange(0, cam.width, stride, dtype=jnp.float32)[None, :]
    x = (u - cam.cx) / cam.fx
    y = (v - cam.cy) / cam.fy
    ones = jnp.ones_like(x + y)
    dirs = jnp.stack([x + 0 * y, y + 0 * x, ones], axis=-1)
    pix = jnp.stack(jnp.broadcast_arrays(u + 0 * v, v + 0 * u), axis=-1)
    return dirs, pix
