"""TUM-format trajectories: writing, reading, ATE/RPE evaluation.

The reference appends each tracked pose to ./trajectory.txt as
``timestamp tx ty tz qx qy qz qw`` (writePoseToFile,
sdf_reconstruction.cpp:4-17) for offline comparison against the bundled
groundtruth (rgbd_dataset_freiburg1_plant-groundtruth.txt, 3 header lines)
with the standard TUM ATE/RPE tooling — the de-facto integration test
(SURVEY.md §4.3). Here the whole loop is first-class: writer, reader,
timestamp association, Horn/Umeyama alignment, ATE RMSE and RPE.
"""
from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np

from tracking_sdf_tpu.core.lie import Pose, matrix_from_quaternion, quaternion_from_matrix


@dataclasses.dataclass
class Trajectory:
    """Timestamped camera-to-world poses."""

    timestamps: np.ndarray  # (N,)
    translations: np.ndarray  # (N, 3)
    quaternions: np.ndarray  # (N, 4) (qx, qy, qz, qw)

    def __len__(self) -> int:
        return len(self.timestamps)

    def rotation_matrices(self) -> np.ndarray:
        # f64 numpy (not jnp/f32): metric evaluation must not add rotation
        # noise — arccos near 1 amplifies f32 error to ~1e-3 rad.
        q = np.asarray(self.quaternions, dtype=np.float64)
        x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
        n = (q ** 2).sum(-1)
        s = np.where(n > 0, 2.0 / np.where(n > 0, n, 1.0), 0.0)
        xx, yy, zz = x * x * s, y * y * s, z * z * s
        xy, xz, yz = x * y * s, x * z * s, y * z * s
        wx, wy, wz = w * x * s, w * y * s, w * z * s
        R = np.empty(q.shape[:-1] + (3, 3))
        R[..., 0, 0] = 1.0 - (yy + zz); R[..., 0, 1] = xy - wz; R[..., 0, 2] = xz + wy
        R[..., 1, 0] = xy + wz; R[..., 1, 1] = 1.0 - (xx + zz); R[..., 1, 2] = yz - wx
        R[..., 2, 0] = xz - wy; R[..., 2, 1] = yz + wx; R[..., 2, 2] = 1.0 - (xx + yy)
        return R

    def pose(self, i: int) -> Pose:
        import jax.numpy as jnp

        R = matrix_from_quaternion(jnp.asarray(self.quaternions[i]))
        return Pose(R, jnp.asarray(self.translations[i], dtype=jnp.float32))


class TrajectoryWriter:
    """Streaming TUM-format writer (matches writePoseToFile's layout
    `stamp tx ty tz qx qy qz qw`, sdf_reconstruction.cpp:12)."""

    def __init__(self, path: str, append: bool = False):
        # LAZY open on first write: the runner constructs the writer before
        # a checkpoint restore is known, and an eager "w" open would
        # truncate the pre-resume trajectory before set_append(True) runs
        self._path = path
        self._append = append
        self._f = None

    @property
    def started(self) -> bool:
        return self._f is not None

    def set_append(self, append: bool) -> None:
        """Switch to append mode; only before the first write (the runner
        calls this from restore_checkpoint to preserve pre-resume poses)."""
        if self._f is not None:
            raise RuntimeError("set_append after first write")
        self._append = append

    def write(self, timestamp: float, pose: Pose) -> None:
        if self._f is None:
            self._f = open(self._path, "a" if self._append else "w")
        t = np.asarray(pose.t, dtype=np.float64)
        q = np.asarray(quaternion_from_matrix(pose.R), dtype=np.float64)
        self._f.write(
            f"{timestamp:.6f} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} "
            f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}\n"
        )
        self._f.flush()

    def close(self) -> None:
        if self._f is not None:
            self._f.close()
            self._f = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_trajectory(path: str) -> Trajectory:
    """Read a TUM trajectory/groundtruth file ('#' headers skipped)."""
    ts, tr, qu = [], [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            vals = [float(v) for v in line.split()]
            if len(vals) != 8:
                continue
            ts.append(vals[0])
            tr.append(vals[1:4])
            qu.append(vals[4:8])
    return Trajectory(np.asarray(ts), np.asarray(tr), np.asarray(qu))


def associate(
    a_stamps: np.ndarray, b_stamps: np.ndarray, max_dt: float = 0.02
) -> List[Tuple[int, int]]:
    """Greedy nearest-timestamp matching (the standard TUM associate.py rule)."""
    pairs = []
    j = 0
    used = set()
    for i, ta in enumerate(a_stamps):
        j = int(np.searchsorted(b_stamps, ta))
        best, best_dt = None, max_dt
        for jj in (j - 1, j, j + 1):
            if 0 <= jj < len(b_stamps) and jj not in used:
                dt = abs(b_stamps[jj] - ta)
                if dt <= best_dt:
                    best, best_dt = jj, dt
        if best is not None:
            pairs.append((i, best))
            used.add(best)
    return pairs


def align_umeyama(src: np.ndarray, dst: np.ndarray, with_scale: bool = False):
    """Least-squares similarity transform aligning src -> dst (Horn/Umeyama).

    Returns (s, R, t) with dst ≈ s * R @ src + t.
    """
    mu_s, mu_d = src.mean(0), dst.mean(0)
    xs, xd = src - mu_s, dst - mu_d
    C = xd.T @ xs / len(src)
    U, S, Vt = np.linalg.svd(C)
    sgn = np.sign(np.linalg.det(U @ Vt))
    D = np.diag([1.0, 1.0, sgn])
    R = U @ D @ Vt
    if with_scale:
        var_s = (xs ** 2).sum() / len(src)
        s = float(np.trace(np.diag(S) @ D) / var_s)
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def ate_rmse(
    estimated: Trajectory,
    groundtruth: Trajectory,
    max_dt: float = 0.02,
    align: bool = True,
) -> Tuple[float, int]:
    """Absolute trajectory error RMSE (m) after SE(3) alignment.

    The metric of the paper's Table I (§V-B). Returns (rmse, n_matched).
    """
    pairs = associate(estimated.timestamps, groundtruth.timestamps, max_dt)
    if len(pairs) < 2:
        return float("nan"), len(pairs)
    ia = np.asarray([p[0] for p in pairs])
    ib = np.asarray([p[1] for p in pairs])
    src = estimated.translations[ia]
    dst = groundtruth.translations[ib]
    if align:
        s, R, t = align_umeyama(src, dst)
        src = (s * (R @ src.T)).T + t
    err = np.linalg.norm(src - dst, axis=1)
    return float(np.sqrt((err ** 2).mean())), len(pairs)


def rpe_rmse(
    estimated: Trajectory,
    groundtruth: Trajectory,
    delta: int = 1,
    max_dt: float = 0.02,
) -> Tuple[float, float]:
    """Relative pose error over `delta`-frame intervals.

    Returns (translational RMSE in m, rotational RMSE in rad).
    """
    pairs = associate(estimated.timestamps, groundtruth.timestamps, max_dt)
    if len(pairs) < delta + 1:
        return float("nan"), float("nan")
    Re = estimated.rotation_matrices()
    Rg = groundtruth.rotation_matrices()
    te, tg = estimated.translations, groundtruth.translations
    t_errs, r_errs = [], []
    for k in range(len(pairs) - delta):
        i0, j0 = pairs[k]
        i1, j1 = pairs[k + delta]

        def rel(R0, t0, R1, t1):
            R = R0.T @ R1
            t = R0.T @ (t1 - t0)
            return R, t

        Rei, tei = rel(Re[i0], te[i0], Re[i1], te[i1])
        Rgi, tgi = rel(Rg[j0], tg[j0], Rg[j1], tg[j1])
        Rd = Rei.T @ Rgi
        td = Rei.T @ (tgi - tei)
        t_errs.append(np.linalg.norm(td))
        r_errs.append(np.arccos(np.clip((np.trace(Rd) - 1) / 2, -1.0, 1.0)))
    return float(np.sqrt(np.mean(np.square(t_errs)))), float(
        np.sqrt(np.mean(np.square(r_errs)))
    )
