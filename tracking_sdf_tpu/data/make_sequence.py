"""Generate a TUM-on-disk-layout RGB-D sequence from a synthetic scene.

No real TUM dataset ships in this image, so this is the closest proxy to
the reference's de-facto integration test (trajectory vs the bundled
rgbd_dataset_freiburg1_plant-groundtruth.txt, written per frame by
sdf_reconstruction.cpp:4-17): a multi-object scene rendered along a
handheld-like 6-DoF trajectory to 16-bit depth PNGs (meters * 5000, the
TUM convention), 8-bit RGB PNGs, depth.txt/rgb.txt listings and
groundtruth.txt — then replayed through the REAL ingestion chain (native
PNG loader -> TUMDataset -> runner -> trajectory writer -> Umeyama ATE)
via `python -m tracking_sdf_tpu.cli --dataset DIR --eval`.

The world frame is chosen so frame 0's camera pose IS the runner's
REFERENCE_INITIAL_POSE (the reference hardcodes it, camera_tracking.cpp:5-7):
the scene then lands inside the tum256/tum512 grid volume exactly as a real
fr1 sequence would, with no alignment knobs anywhere.

Depth gets a Kinect-like quadratic noise sigma = noise_k * z^2 (~1.5 mm at
1 m, ~9 mm at 2.5 m) plus random dropout holes; RGB is the scenes' analytic
color fields. Usage:

    python -m tracking_sdf_tpu.data.make_sequence --out /tmp/tum_synth \
        --frames 120
"""
from __future__ import annotations

import argparse
import sys
from typing import List

import numpy as np


def _build(width: int, height: int, room: bool = False,
           cluster_shift=(0.0, 0.0, 0.0), cluster_scale: float = 1.0,
           scene_family: str = "tabletop"):
    """(scene, cam, pose0). Scene geometry is authored in frame-0 CAMERA
    coordinates (x right, y down, z forward — easy frustum reasoning) and
    mapped to world with REFERENCE_INITIAL_POSE. ``room=True`` closes the
    box (side walls + ceiling + near wall inside the grid volume) so that
    ANY camera orientation sees in-grid geometry — required when replaying
    real handheld trajectories (--trajectory-file) that look all around.
    ``cluster_shift``/``cluster_scale`` move/scale the OBJECT CLUSTER
    (table, cube, spheres — not the room) in world coords: real orbits
    circle AROUND their subject, so the cluster must sit at the orbit's
    look-at center (see _fit_cluster), not ahead of frame 0.

    ``scene_family`` selects the cluster geometry (paper Table I spans 10
    sequences over different scene types — this is the breadth axis):
      * "tabletop": table + cube + two spheres (the round-1/2 scene).
      * "desk": cluttered desk-scale geometry — monitor slab, book stack,
        keyboard, mugs, small-box clutter (fr1/desk-like surface density).
      * "plant": thin-structure scene — potted plant with sphere-chain
        stems and thin-slab leaves (fr1/plant-like: sparse, thin geometry
        with depth shadows at every stem silhouette)."""
    import jax.numpy as jnp

    from tracking_sdf_tpu.core.camera import PinholeCamera, tum_fr1_camera
    from tracking_sdf_tpu.data.synthetic import CuboidScene, SphereScene
    from tracking_sdf_tpu.pipeline.runner import REFERENCE_INITIAL_POSE

    pose0 = REFERENCE_INITIAL_POSE
    R0 = np.asarray(pose0.R)
    t0 = np.asarray(pose0.t)

    def w(p):  # camera-0 point -> world
        return R0 @ np.asarray(p, np.float32) + t0

    def box(lo, hi):
        a, b = w(lo), w(hi)
        return CuboidScene(tuple(np.minimum(a, b)), tuple(np.maximum(a, b)))

    sh = np.asarray(cluster_shift, np.float32)
    sc = float(cluster_scale)
    ctr = w((0.0, 0.45, 1.6))  # cluster reference point (table center-ish)

    def cbox(lo, hi):  # cluster box: world-shift + scale about ctr
        a = (w(lo) - ctr) * sc + ctr + sh
        b = (w(hi) - ctr) * sc + ctr + sh
        return CuboidScene(tuple(np.minimum(a, b)), tuple(np.maximum(a, b)))

    def csph(c, r):
        return SphereScene(
            center=tuple((w(c) - ctr) * sc + ctr + sh), radius=r * sc)

    def chain(p0, p1, n, r0_, r1_):
        """n spheres along the segment p0->p1 with radius lerping r0_->r1_
        (stems/branches: thin structure from exact-intersection prims)."""
        a, b = np.asarray(p0, np.float32), np.asarray(p1, np.float32)
        return [csph(tuple(a + (b - a) * (i / max(n - 1, 1))),
                     r0_ + (r1_ - r0_) * (i / max(n - 1, 1)))
                for i in range(n)]

    objects = [
        # floor (camera-down y=+0.85) and back wall (z=2.6) bound the room
        box((-4.0, 0.85, -0.5), (4.0, 1.05, 4.0)),
        box((-4.0, -2.0, 2.6), (4.0, 1.05, 2.9)),
    ]
    if scene_family == "tabletop":
        objects += [
            # table with a cube sitting on it
            cbox((-0.55, 0.35, 1.30), (0.45, 0.85, 1.95)),
            cbox((-0.30, 0.05, 1.45), (0.00, 0.35, 1.75)),
            csph((0.45, 0.10, 1.60), 0.25),
            csph((-0.55, 0.45, 1.05), 0.18),
        ]
    elif scene_family == "desk":
        objects += [
            # desk slab + monitor (slab on a foot), keyboard, book stack,
            # two mugs, loose small boxes — high surface density, many
            # depth discontinuities at close range
            cbox((-0.65, 0.40, 1.25), (0.55, 0.85, 2.00)),   # desk top
            cbox((-0.45, -0.12, 1.80), (0.15, 0.28, 1.86)),  # monitor panel
            cbox((-0.20, 0.28, 1.80), (-0.10, 0.40, 1.88)),  # monitor foot
            cbox((-0.30, 0.355, 1.40), (0.12, 0.40, 1.62)),  # keyboard
            cbox((0.25, 0.22, 1.70), (0.45, 0.40, 1.92)),    # book stack
            cbox((0.24, 0.10, 1.72), (0.44, 0.22, 1.90)),    # top book
            csph((-0.50, 0.34, 1.55), 0.06),                 # mug
            csph((0.18, 0.34, 1.48), 0.05),                  # mug 2
            cbox((-0.58, 0.28, 1.78), (-0.46, 0.40, 1.90)),  # box clutter
            cbox((0.02, 0.30, 1.94), (0.14, 0.40, 2.00)),    # box clutter 2
            csph((-0.05, 0.30, 1.70), 0.10),                 # ball
        ]
    elif scene_family == "plant":
        # potted plant on a stand: thin sphere-chain stems + thin-slab
        # leaves. Thin structure = sparse SDF support, grazing silhouettes.
        objects += [
            cbox((-0.20, 0.55, 1.45), (0.20, 0.85, 1.85)),   # stand
            cbox((-0.14, 0.38, 1.51), (0.14, 0.58, 1.79)),   # pot
        ]
        top = np.asarray((0.0, 0.40, 1.65), np.float32)
        objects += chain(top, (0.0, -0.25, 1.65), 9, 0.035, 0.02)  # trunk
        for (dx, dz, hy) in ((0.28, 0.10, -0.05), (-0.30, 0.05, -0.10),
                             (0.15, -0.22, -0.15), (-0.12, 0.25, -0.02),
                             (0.05, 0.28, -0.18), (-0.25, -0.18, -0.12)):
            tip = (top[0] + dx, hy, top[2] + dz)
            objects += chain((0.0, 0.15, 1.65), tip, 6, 0.022, 0.012)
            # leaf slab at the stem tip (axis-aligned thin box)
            objects.append(cbox(
                (tip[0] - 0.09, tip[1] - 0.012, tip[2] - 0.07),
                (tip[0] + 0.09, tip[1] + 0.012, tip[2] + 0.07)))
    else:
        raise ValueError(f"unknown scene family: {scene_family!r}")
    if room:
        objects += [
            box((-2.7, -2.0, -0.5), (-2.5, 1.05, 4.0)),   # left wall
            box((2.5, -2.0, -0.5), (2.7, 1.05, 4.0)),     # right wall
            box((-4.0, -1.5, -0.5), (4.0, -1.3, 4.0)),    # ceiling
            box((-4.0, -2.0, -1.4), (4.0, 1.05, -1.2)),   # behind-camera wall
        ]

    class Scene:
        """Union of the objects; color follows the nearest-hit object."""

        def sdf(self, x):
            d = objects[0].sdf(x)
            for o in objects[1:]:
                d = jnp.minimum(d, o.sdf(x))
            return d

        def intersect(self, o_, d_):
            ts = jnp.stack([ob.intersect(o_, d_) for ob in objects])
            return jnp.nanmin(ts, axis=0)

        def intersect_argmin(self, o_, d_):
            ts = jnp.stack([ob.intersect(o_, d_) for ob in objects])
            filled = jnp.where(jnp.isnan(ts), jnp.inf, ts)
            idx = jnp.argmin(filled, axis=0)
            t = jnp.take_along_axis(ts, idx[None], axis=0)[0]
            return t, idx

        def color_at(self, pts, idx):
            cols = jnp.stack([ob.color(pts) for ob in objects])
            return jnp.take_along_axis(
                cols, idx[None, ..., None], axis=0)[0]

    cam = tum_fr1_camera()
    if (width, height) != (cam.width, cam.height):
        s = width / cam.width
        cam = PinholeCamera(fx=cam.fx * s, fy=cam.fy * s,
                            cx=cam.cx * s, cy=cam.cy * s,
                            width=width, height=height)
    return Scene(), cam, pose0


def _trajectory(pose0, n_frames: int) -> List:
    """Handheld-like 6-DoF path: multi-frequency sinusoidal twist increments
    (~12 mm + ~0.5 deg/frame) — smooth but never constant-velocity, like a
    person scanning a tabletop."""
    import jax.numpy as jnp

    from tracking_sdf_tpu.core.lie import pose_compose, se3_exp

    poses = [pose0]
    for k in range(1, n_frames):
        s = 2.0 * np.pi * k
        xi = np.asarray([
            0.009 * np.sin(s / 90) + 0.003 * np.sin(s / 17),   # x sweep
            0.006 * np.cos(s / 70) + 0.002 * np.sin(s / 23),   # y bob
            0.005 * np.sin(s / 55) + 0.002 * np.cos(s / 13),   # z push
            0.004 * np.cos(s / 80) + 0.0015 * np.sin(s / 19),  # pitch
            -0.006 * np.sin(s / 90) - 0.002 * np.sin(s / 29),  # yaw (counter-
            0.003 * np.sin(s / 60),                            # roll  sweep)
        ], np.float32)
        poses.append(pose_compose(poses[-1], se3_exp(jnp.asarray(xi))))
    return poses


def _trajectory_from_file(pose0, path: str, n_frames: int,
                          fps: float = 30.0, start_s: float = 0.0):
    """Resample a real TUM groundtruth trajectory (timestamp tx ty tz qx
    qy qz qw; e.g. the fr1/plant file the reference bundles) at ``fps``
    and re-anchor it so frame 0 sits at ``pose0``:
    T'_k = pose0 ∘ (T_0^-1 ∘ T_k). Real handheld motion — accelerations,
    tremor, fast rotations — over the synthetic scene: the most realistic
    motion available without the actual RGB-D frames."""
    import jax.numpy as jnp

    from tracking_sdf_tpu.core.lie import (
        Pose, matrix_from_quaternion, pose_compose, pose_inverse)

    rows = [line.split() for line in open(path)
            if line.strip() and not line.startswith("#")]
    ts = np.asarray([float(r[0]) for r in rows])
    tr = np.asarray([[float(v) for v in r[1:4]] for r in rows])
    qu = np.asarray([[float(v) for v in r[4:8]] for r in rows])
    t0 = ts[0] + start_s
    want = t0 + np.arange(n_frames) / fps
    if want[-1] > ts[-1]:
        raise SystemExit(
            f"--trajectory-file spans {ts[-1] - ts[0]:.1f} s; "
            f"{n_frames} frames at {fps} fps from +{start_s:.1f} s "
            f"need {want[-1] - ts[0]:.1f} s")
    idx = np.searchsorted(ts, want)
    raw = [Pose(matrix_from_quaternion(jnp.asarray(qu[i], jnp.float32)),
                jnp.asarray(tr[i], jnp.float32)) for i in idx]
    anchor = pose_compose(pose0, pose_inverse(raw[0]))
    return [pose_compose(anchor, p) for p in raw]


def _fit_cluster(poses, look_dist: float = 1.0, clearance: float = 0.2):
    """(cluster_shift, cluster_scale) placing the object cluster at the
    trajectory's median LOOK-AT point with the camera path kept clear.

    A real orbit circles around its subject; anchoring the cluster 1.6 m
    ahead of frame 0 put it ON the camera's path (measured: the 1200-frame
    fr1/plant replay collided with the table at ~frame 450 and diverged).
    The cluster is centered at median(t_k + look_dist * R_k z_k) and shrunk
    until every camera position keeps ``clearance`` meters from the
    cluster's bounding sphere."""
    t = np.stack([np.asarray(p.t) for p in poses])
    z = np.stack([np.asarray(p.R)[:, 2] for p in poses])
    target = np.median(t + look_dist * z, axis=0)
    ctr0 = np.asarray([0.0, -1.6, 1.45], np.float32)  # unshifted center-ish
    shift = (target - ctr0).astype(np.float32)
    # cluster bounding radius around its center (table diagonal ~0.75 m)
    r0 = 0.8
    scale = 1.0
    for _ in range(6):
        d = np.linalg.norm(t - target, axis=1).min()
        if d >= r0 * scale + clearance:
            break
        scale *= 0.85
    return tuple(shift), scale


def _ir_shadow_mask(z: np.ndarray, fx: float, baseline: float) -> np.ndarray:
    """Structured-light occlusion shadows (Kinect pathology #1).

    The IR projector sits a stereo baseline to the LEFT of the IR camera
    (at x = -b; Kinect: ~75 mm); surface points hidden from the PROJECTOR
    get no pattern and no depth. A point at camera column u and depth z
    maps to projector column u_p = u + fx*b/z (x_proj = x_cam + b).
    Scanning each row left-to-right, a pixel is shadowed when an EARLIER
    (smaller-u) pixel already claimed a projector column >= u_p: for
    u1 < u2 with u_p1 >= u_p2, c/z1 - c/z2 >= u2 - u1 > 0 forces z1 < z2,
    i.e. the earlier surface is nearer along that projector ray. This
    puts the NaN band on the BACKGROUND just right of each occluder —
    the physical Kinect artifact (width fx*b*(1/z_near - 1/z_far) px).
    (Round-4 self-review fix: the first version used u - fx*b/z, which
    masked the foreground's near edge instead.)"""
    zs = np.where(np.isfinite(z), z, 1e6)
    u = np.arange(z.shape[1], dtype=np.float32)[None, :]
    up = u + fx * baseline / zs
    prior = np.roll(np.maximum.accumulate(up, axis=1), 1, axis=1)
    prior[:, 0] = -np.inf
    return up <= prior - 1e-3


def _flying_pixels(z: np.ndarray, rng, frac: float = 0.6,
                   grad_thresh: float = 0.08) -> np.ndarray:
    """Edge flying pixels (pathology #2): at depth discontinuities the
    sensor returns values INTERPOLATED between fore- and background (ToF
    mixed pixels / correlation window straddling the edge). A random
    ``frac`` of discontinuity pixels get z = a*z_here + (1-a)*z_neighbor,
    a ~ U(0.2, 0.8) — points hanging in free space that fusion must
    reject or average away."""
    zf = np.where(np.isfinite(z), z, np.nan)
    out = z.copy()
    for axis, shift in ((1, 1), (1, -1), (0, 1), (0, -1)):
        zn = np.roll(zf, shift, axis=axis)
        # np.roll wraps: the first/last row or column would compare
        # against the OPPOSITE border and fabricate frame-edge
        # discontinuities (round-4 self-review) — mask the wrapped line
        zn_valid = np.ones(z.shape, dtype=bool)
        if axis == 1:
            zn_valid[:, 0 if shift == 1 else -1] = False
        else:
            zn_valid[0 if shift == 1 else -1, :] = False
        edge = zn_valid & (np.abs(zn - zf) > grad_thresh)
        pick = edge & (rng.random(z.shape) < frac / 4.0) \
            & np.isfinite(zf) & np.isfinite(zn)
        a = rng.uniform(0.2, 0.8, size=z.shape).astype(np.float32)
        out = np.where(pick, a * zf + (1.0 - a) * zn, out)
    return out


def _reflective_patches(z: np.ndarray, rng, walkers, step: float = 4.0,
                        radius=(8.0, 26.0)) -> np.ndarray:
    """Reflective/absorbing dropout patches (pathology #3): specular or
    dark materials return no depth over contiguous BLOBS, not salt-and-
    pepper. ``walkers`` (mutated in place) random-walk ellipse centers
    across frames so the patches are temporally coherent like a real
    shiny surface crossing the view."""
    H, W = z.shape
    out = z.copy()
    yy, xx = np.mgrid[0:H, 0:W]
    for wk in walkers:
        wk[0] = (wk[0] + rng.normal(0, step)) % H
        wk[1] = (wk[1] + rng.normal(0, step)) % W
        ry = rng.uniform(*radius)
        rx = rng.uniform(*radius)
        mask = (((yy - wk[0]) / ry) ** 2 + ((xx - wk[1]) / rx) ** 2) < 1.0
        out[mask] = np.nan
    return out


def _exposure_rgb(rgb: np.ndarray, k: int, rng) -> np.ndarray:
    """Exposure/auto-white-balance drift (pathology #4): the reference's
    color fusion runs on a rolling-shutter auto-exposure camera; emulate a
    smoothly varying global gain (+-25%) with per-frame flicker and a
    static vignette. Photometric constancy assumptions break exactly as
    on real fr1 footage."""
    gain = (1.0 + 0.22 * np.sin(k / 19.0) + 0.08 * np.sin(k / 5.3)
            + rng.normal(0, 0.015))
    h, w = rgb.shape[:2]
    yy, xx = np.mgrid[0:h, 0:w]
    r2 = (((yy - h / 2) / (h / 2)) ** 2 + ((xx - w / 2) / (w / 2)) ** 2)
    vignette = (1.0 - 0.18 * r2)[..., None]
    return np.clip(rgb * gain * vignette, 0.0, 1.0).astype(np.float32)


def generate(root: str, n_frames: int = 120, width: int = 640,
             height: int = 480, noise_k: float = 1.5e-3,
             dropout: float = 0.01, seed: int = 0,
             progress: bool = False, trajectory_file: str = None,
             traj_fps: float = 30.0, traj_start: float = 0.0,
             room: bool = False, fit_trajectory: bool = False,
             scene_family: str = "tabletop",
             pathology: bool = False, ir_baseline: float = 0.075,
             n_patches: int = 3, burst=None) -> dict:
    """Render and write the sequence; returns summary stats."""
    import jax
    import jax.numpy as jnp

    from tracking_sdf_tpu.core.camera import pixel_rays
    from tracking_sdf_tpu.core.lie import quaternion_from_matrix
    from tracking_sdf_tpu.data.tum import write_synthetic_tum

    scene, cam, pose0 = _build(width, height, room=room,
                               scene_family=scene_family)
    if trajectory_file:
        poses = _trajectory_from_file(pose0, trajectory_file, n_frames,
                                      traj_fps, traj_start)
        if fit_trajectory:
            shift, scale = _fit_cluster(poses)
            if progress:
                print(f"  cluster fit: shift {np.round(shift, 2)}, "
                      f"scale {scale:.2f}", file=sys.stderr)
            scene, cam, pose0 = _build(width, height, room=room,
                                       cluster_shift=shift,
                                       cluster_scale=scale,
                                       scene_family=scene_family)
    else:
        poses = _trajectory(pose0, n_frames)

    dirs_cam, _ = pixel_rays(cam)  # (H, W, 3), z == 1 -> t is z-depth

    @jax.jit
    def render(R, t):
        d_world = jnp.einsum("ij,hwj->hwi", R, dirs_cam)
        origins = jnp.broadcast_to(t, d_world.shape)
        z, idx = scene.intersect_argmin(origins, d_world)
        pts = origins + z[..., None] * d_world
        rgb = scene.color_at(pts, idx)
        return z, rgb

    rng = np.random.default_rng(seed)
    depths, rgbs, gts = [], [], []
    min_valid = 1.0
    # temporally-coherent reflective-patch centers (pathology mode)
    walkers = [[rng.uniform(0, height), rng.uniform(0, width)]
               for _ in range(n_patches)]
    for i, pose in enumerate(poses):
        z, rgb = render(pose.R, pose.t)
        z = np.asarray(z, np.float32)
        rgb = np.asarray(np.clip(rgb, 0.0, 1.0), np.float32)
        # sensor-pathology mode (round 4, VERDICT r3 missing #1): the
        # clean quadratic-noise model is too kind to discriminate
        # anything (the Table II weighting spread collapses on it);
        # these four artifacts reproduce what real Kinect depth does
        if pathology:
            z = _flying_pixels(z, rng)
            z[_ir_shadow_mask(z, cam.fx, ir_baseline)] = np.nan
            z = _reflective_patches(z, rng, walkers)
            rgb = _exposure_rgb(rgb, i, rng)
        # Kinect-like quadratic depth noise + random dropout holes
        if noise_k > 0:
            z = z + (noise_k * z * z * rng.standard_normal(z.shape)
                     ).astype(np.float32)
        if dropout > 0:
            z[rng.random(z.shape) < dropout] = np.nan
        # dropout BURST (failure-gate study): a few frames of near-total
        # depth loss, like the sensor saturating against a window — the
        # tracker must reject them and re-acquire afterwards
        if burst is not None:
            b0, blen, bfrac = burst
            if b0 <= i < b0 + blen:
                z[rng.random(z.shape) < bfrac] = np.nan
        valid = float(np.isfinite(z).mean())
        min_valid = min(min_valid, valid)
        depths.append(z)
        rgbs.append(rgb)
        q = np.asarray(quaternion_from_matrix(pose.R), np.float32)
        gts.append((np.asarray(pose.t, np.float32), q))
        if progress and i % 20 == 0:
            print(f"  frame {i}/{n_frames} valid={valid:.2f}",
                  file=sys.stderr, flush=True)

    write_synthetic_tum(root, depths, rgbs, gts)
    return {"frames": n_frames, "min_valid_frac": min_valid,
            "camera": (cam.fx, cam.fy, cam.cx, cam.cy, width, height)}


def _parse_burst(spec):
    if not spec:
        return None
    parts = spec.split(":")
    return (int(parts[0]), int(parts[1]),
            float(parts[2]) if len(parts) > 2 else 0.95)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="generate a synthetic TUM-layout RGB-D sequence")
    p.add_argument("--out", required=True)
    p.add_argument("--frames", type=int, default=120)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--noise-k", type=float, default=1.5e-3,
                   help="depth noise sigma = noise_k * z^2 (0 disables)")
    p.add_argument("--dropout", type=float, default=0.01,
                   help="random NaN-hole fraction")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--trajectory-file", default=None,
                   help="replay a real TUM groundtruth trajectory "
                        "(resampled at --traj-fps, re-anchored to the "
                        "scene) instead of the synthetic sinusoid path")
    p.add_argument("--traj-fps", type=float, default=30.0)
    p.add_argument("--traj-start", type=float, default=0.0,
                   help="seconds into the trajectory file to start at")
    p.add_argument("--room", action="store_true",
                   help="close the room (side/behind walls + ceiling) so "
                        "any orientation sees in-grid geometry")
    p.add_argument("--fit-trajectory", action="store_true",
                   help="center the object cluster at the trajectory's "
                        "median look-at point and keep the camera path "
                        "clear of it (real orbits circle their subject)")
    p.add_argument("--scene", default="tabletop",
                   choices=("tabletop", "desk", "plant"),
                   help="object-cluster family: tabletop (default), desk "
                        "(cluttered close-range), plant (thin structure)")
    p.add_argument("--pathology", action="store_true",
                   help="Kinect sensor pathologies on top of the noise "
                        "model: IR-baseline occlusion shadows, edge flying "
                        "pixels, temporally-coherent reflective dropout "
                        "patches, exposure-varying RGB")
    p.add_argument("--ir-baseline", type=float, default=0.075,
                   help="projector-camera stereo baseline (m) for the "
                        "occlusion-shadow pathology")
    p.add_argument("--patches", type=int, default=3,
                   help="number of reflective dropout patches")
    p.add_argument("--burst", default=None, metavar="START:LEN[:FRAC]",
                   help="dropout burst: NaN FRAC (default 0.95) of pixels "
                        "for LEN frames starting at START (failure-gate "
                        "study)")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")  # rendering never needs the chip
    stats = generate(args.out, args.frames, args.width, args.height,
                     args.noise_k, args.dropout, args.seed, progress=True,
                     trajectory_file=args.trajectory_file,
                     traj_fps=args.traj_fps, traj_start=args.traj_start,
                     room=args.room, fit_trajectory=args.fit_trajectory,
                     scene_family=args.scene, pathology=args.pathology,
                     ir_baseline=args.ir_baseline, n_patches=args.patches,
                     burst=_parse_burst(args.burst))
    print(f"wrote {stats['frames']} frames to {args.out} "
          f"(min valid-depth fraction {stats['min_valid_frac']:.2f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
