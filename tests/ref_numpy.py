"""NumPy golden oracle: a direct, loopy re-implementation of the reference
algorithm's exact semantics (including its quirks), used ONLY in tests.

This is intentionally written in the REFERENCE's conventions:
  * D stored with free space NEGATIVE (the production framework negates);
  * colors fused on a 0..255 scale;
  * C-style (int) truncation casts;
  * Shepard inverse-L1 interpolation with early exact-hit return;
  * 13-probe central-difference twist Jacobians with partial-failure
    early-outs;
  * the reference's pose-update quirk (t is not rotated).

Citations point at the C++ lines whose behavior each function mirrors.
"""
from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------- lie / exp map
def f_sinc(sinx, x):  # eigen_utils.cpp:43-47
    return 1.0 if abs(x) < 1e-8 else sinx / x


def f_mcosc(cosx, x):  # eigen_utils.cpp:49-53
    return 0.5 if abs(x) < 2.5e-4 else (1.0 - cosx) / x / x


def f_msinc(sinx, x):  # eigen_utils.cpp:55-59
    return 1.0 / 6.0 if abs(x) < 2.5e-4 else (1.0 - sinx / x) / x / x


def utheta_to_matrix(u):  # eigen_utils.cpp:61-83
    theta = np.sqrt(u @ u)
    si, co = np.sin(theta), np.cos(theta)
    sinc, mcosc = f_sinc(si, theta), f_mcosc(co, theta)
    rd = np.empty((3, 3))
    rd[0, 0] = co + mcosc * u[0] * u[0]
    rd[0, 1] = -sinc * u[2] + mcosc * u[0] * u[1]
    rd[0, 2] = sinc * u[1] + mcosc * u[0] * u[2]
    rd[1, 0] = sinc * u[2] + mcosc * u[1] * u[0]
    rd[1, 1] = co + mcosc * u[1] * u[1]
    rd[1, 2] = -sinc * u[0] + mcosc * u[1] * u[2]
    rd[2, 0] = -sinc * u[1] + mcosc * u[2] * u[0]
    rd[2, 1] = sinc * u[0] + mcosc * u[2] * u[1]
    rd[2, 2] = co + mcosc * u[2] * u[2]
    return rd


def direct_exponential_map(v, dt=1.0):  # eigen_utils.cpp:85-128
    v_dt = np.asarray(v, dtype=np.float64) * dt
    u = v_dt[3:6]
    R = utheta_to_matrix(u)
    theta = np.sqrt(u @ u)
    si, co = np.sin(theta), np.cos(theta)
    sinc, mcosc, msinc = f_sinc(si, theta), f_mcosc(co, theta), f_msinc(si, theta)
    dtv = np.empty(3)
    dtv[0] = (v_dt[0] * (sinc + u[0] * u[0] * msinc)
              + v_dt[1] * (u[0] * u[1] * msinc - u[2] * mcosc)
              + v_dt[2] * (u[0] * u[2] * msinc + u[1] * mcosc))
    dtv[1] = (v_dt[0] * (u[0] * u[1] * msinc + u[2] * mcosc)
              + v_dt[1] * (sinc + u[1] * u[1] * msinc)
              + v_dt[2] * (u[1] * u[2] * msinc - u[0] * mcosc))
    dtv[2] = (v_dt[0] * (u[0] * u[2] * msinc - u[1] * mcosc)
              + v_dt[1] * (u[1] * u[2] * msinc + u[0] * mcosc)
              + v_dt[2] * (sinc + u[2] * u[2] * msinc))
    return R, dtv


# ---------------------------------------------------------------- grid helpers
class RefGrid:
    """Dense grid in the reference's conventions (sdf.cpp:8-51)."""

    def __init__(self, m, width, height, depth, origin, delta, epsilon):
        self.m, self.width, self.height, self.depth = m, width, height, depth
        self.origin = np.asarray(origin, dtype=np.float64)
        self.delta, self.epsilon = delta, epsilon
        self.D = np.full((m, m, m), width + height + depth, dtype=np.float32)
        self.W = np.zeros((m, m, m), dtype=np.float32)
        self.R = np.full((m, m, m), 0.4, dtype=np.float32)
        self.G = np.full((m, m, m), 0.4, dtype=np.float32)
        self.B = np.full((m, m, m), 0.4, dtype=np.float32)
        self.Wc = np.zeros((m, m, m), dtype=np.float32)

    def world_to_voxel(self, p):  # sdf.h:143-147
        return (p - self.origin) * (self.m / np.array(
            [self.width, self.height, self.depth])) - 0.5

    def voxel_center(self, ijk):  # sdf.h:153-157
        return (np.array([self.width, self.height, self.depth]) / self.m) * (
            np.asarray(ijk, dtype=np.float64) + 0.5) + self.origin


def interpolate_distance(D, W, coords):  # sdf.cpp:127-163
    """Returns (value, is_interpolated). coords: continuous voxel (i, j, k)."""
    m0, m1, m2 = D.shape
    i, j, k = coords
    w_sum, sum_d = 0.0, 0.0
    is_interp = False
    for io in range(2):
        for jo in range(2):
            for ko in range(2):
                ci, cj, ck = int(i) + io, int(j) + jo, int(k) + ko  # (int) = trunc
                vol = abs(ci - i) + abs(cj - j) + abs(ck - k)
                if ci < 0 or cj < 0 or ck < 0 or ci >= m0 or cj >= m1 or ck >= m2:
                    continue
                if W[ci, cj, ck] > 0:
                    is_interp = True
                    if vol < 1e-5:
                        return float(D[ci, cj, ck]), True
                    w = 1.0 / vol
                    w_sum += w
                    sum_d += w * D[ci, cj, ck]
    if w_sum == 0.0:
        return 0.0, is_interp
    return sum_d / w_sum, is_interp


def interpolate_color(R, G, B, Color_W, coords):  # sdf.cpp:164-217
    """Returns ((r, g, b) in [0, 1], is_interpolated). R/G/B on the
    reference's 0..255 scale; output divides by 255 (sdf.cpp:213-216)."""
    m0, m1, m2 = R.shape
    i, j, k = coords
    w_sum = 0.0
    sr = sg = sb = 0.0
    is_interp = False
    for io in range(2):
        for jo in range(2):
            for ko in range(2):
                ci, cj, ck = int(i) + io, int(j) + jo, int(k) + ko
                vol = abs(ci - i) + abs(cj - j) + abs(ck - k)
                if ci < 0 or cj < 0 or ck < 0 or ci >= m0 or cj >= m1 or ck >= m2:
                    continue
                if Color_W[ci, cj, ck] > 0:
                    is_interp = True
                    if vol < 1e-5:
                        return (
                            float(R[ci, cj, ck]) / 255.0,
                            float(G[ci, cj, ck]) / 255.0,
                            float(B[ci, cj, ck]) / 255.0,
                        ), True
                    w = 1.0 / vol
                    w_sum += w
                    sr += w * R[ci, cj, ck]
                    sg += w * G[ci, cj, ck]
                    sb += w * B[ci, cj, ck]
    if w_sum == 0.0:
        return (0.0, 0.0, 0.0), is_interp
    return (sr / (w_sum * 255.0), sg / (w_sum * 255.0), sb / (w_sum * 255.0)), is_interp


# ---------------------------------------------------------------- fusion
def weighting_ref(d_ref, eps, delta):  # sdf.cpp:276-279 (exponential)
    if eps <= d_ref <= delta:
        return np.exp(-0.5 * (d_ref - eps) ** 2)
    return 1.0


def fuse_frame_ref(grid: RefGrid, R_c2w, t_c2w, K, points_cam, normals_cam,
                   rgb255=None):
    """SDF::update (sdf.cpp:224-315), loopy. points/normals: (H, W, 3)."""
    m = grid.m
    h, w_img = points_cam.shape[:2]
    R_inv = np.linalg.inv(R_c2w)
    rit = -R_inv @ t_c2w
    for i in range(m):
        for j in range(m):
            for k in range(m):
                gc = grid.voxel_center((i, j, k))
                p_cam = R_inv @ gc + rit
                if p_cam[2] < 0:
                    continue
                ij = K @ p_cam
                u = ij[0] / ij[2]
                v = ij[1] / ij[2]
                iu, iv = int(u), int(v)  # trunc casts (sdf.cpp:251-252)
                if iu >= w_img or iv >= h or iu < 0 or iv < 0:
                    continue
                pt = points_cam[iv, iu]
                nm = normals_cam[iv, iu]
                if (np.isnan(pt[0]) or np.isnan(pt[1]) or np.isnan(nm[0])
                        or np.isnan(nm[1]) or np.isnan(nm[2])):
                    continue
                d_new = float((pt - p_cam) @ nm)  # point-to-plane (sdf.h:177-181)
                w_new = weighting_ref(d_new, grid.epsilon, grid.delta)
                if d_new > grid.delta:
                    continue
                if d_new < -grid.delta:
                    d_new = -grid.delta
                w_old = grid.W[i, j, k]
                grid.W[i, j, k] = w_old + w_new
                grid.D[i, j, k] = (w_old * grid.D[i, j, k] + w_new * d_new) / grid.W[i, j, k]
                if rgb255 is not None:
                    cosine = abs(nm[2]) / np.linalg.norm(nm)
                    wc_old = grid.Wc[i, j, k]
                    wc_new = w_new * cosine
                    grid.Wc[i, j, k] = wc_old + wc_new
                    c = rgb255[iv, iu]
                    grid.R[i, j, k] = (wc_old * grid.R[i, j, k] + wc_new * c[0]) / grid.Wc[i, j, k]
                    grid.G[i, j, k] = (wc_old * grid.G[i, j, k] + wc_new * c[1]) / grid.Wc[i, j, k]
                    grid.B[i, j, k] = (wc_old * grid.B[i, j, k] + wc_new * c[2]) / grid.Wc[i, j, k]


# ---------------------------------------------------------------- tracking
def get_partial_derivative(grid: RefGrid, R_c2w, t_c2w, rots, camera_point,
                           v_h, w_h):
    """camera_tracking.cpp:246-363. rots = (r1p, r1m, r2p, r2m, r3p, r3m).

    Returns (deriv (6,), is_interpolated, sdf_val). On early-out the already-
    written components of deriv keep their values (the C++ reuses the caller's
    buffer; callers must gate on the flag)."""
    deriv = np.zeros(6)
    wp = R_c2w @ camera_point + t_c2w
    vp = grid.world_to_voxel(wp)
    if np.any(vp < 0) or np.any(vp >= grid.m):
        return deriv, False, 0.0
    sdf_val, ok = interpolate_distance(grid.D, grid.W, vp)
    if not ok:
        return deriv, False, sdf_val
    v_h2 = 2.0 * v_h
    denom = [v_h2 / (grid.m / grid.width), v_h2 / (grid.m / grid.height),
             v_h2 / (grid.m / grid.depth)]
    for axis in range(3):  # translation probes (:273-316)
        pp, mm = vp.copy(), vp.copy()
        pp[axis] += v_h
        mm[axis] -= v_h
        vplus, ok = interpolate_distance(grid.D, grid.W, pp)
        if not ok:
            return deriv, False, sdf_val
        vminus, ok = interpolate_distance(grid.D, grid.W, mm)
        if not ok:
            return deriv, False, sdf_val
        deriv[axis] = (vplus - vminus) / denom[axis]
    for axis in range(3):  # rotation probes (:318-361)
        rp, rm = rots[2 * axis], rots[2 * axis + 1]
        wp_p = rp @ camera_point + t_c2w
        wp_m = rm @ camera_point + t_c2w
        vplus, ok = interpolate_distance(grid.D, grid.W, grid.world_to_voxel(wp_p))
        if not ok:
            return deriv, False, sdf_val
        vminus, ok = interpolate_distance(grid.D, grid.W, grid.world_to_voxel(wp_m))
        if not ok:
            return deriv, False, sdf_val
        deriv[3 + axis] = (vplus - vminus) / (2.0 * w_h)
    return deriv, True, sdf_val


def build_linearized_rotations(R, w_h):  # camera_tracking.cpp:92-145
    def pm(axis, sign):
        Rd = np.eye(3)
        if axis == 0:
            Rd[1, 2], Rd[2, 1] = -sign * w_h, sign * w_h
        elif axis == 1:
            Rd[0, 2], Rd[2, 0] = sign * w_h, -sign * w_h
        else:
            Rd[0, 1], Rd[1, 0] = -sign * w_h, sign * w_h
        return Rd @ R
    return (pm(0, 1), pm(0, -1), pm(1, 1), pm(1, -1), pm(2, 1), pm(2, -1))


def estimate_new_position(grid: RefGrid, R0, t0, points_cam, *,
                          max_iter=20, max_twist_diff=1e-3, v_h=1.0, w_h=0.01,
                          stride=3):
    """camera_tracking.cpp:66-245: GN loop with the reference's quirks
    (signed convergence test, non-rotated translation update)."""
    R, t = R0.copy(), t0.copy()
    h, w_img = points_cam.shape[:2]
    for _ in range(max_iter):
        rots = build_linearized_rotations(R, w_h)
        A = np.zeros((6, 6))
        b = np.zeros(6)
        for iu in range(0, w_img, stride):
            for iv in range(0, h, stride):
                pt = points_cam[iv, iu]
                if np.any(np.isnan(pt)):
                    continue
                deriv, ok, val = get_partial_derivative(
                    grid, R, t, rots, pt.astype(np.float64), v_h, w_h)
                if not ok:
                    continue
                A += np.outer(deriv, deriv)
                b += val * deriv
        twist = np.linalg.inv(A) @ b
        Re, te = direct_exponential_map(twist, 1.0)
        stop = np.all(twist < max_twist_diff)  # SIGNED comparison (:216-221)
        R = Re.T @ R  # :237
        t = t - Re.T @ te  # :238 (t NOT rotated — the reference quirk)
        if stop:
            break
    return R, t
