"""Checkpoint / resume for reconstruction state.

The reference has NO checkpointing (SURVEY.md §5): its only persistent
artifact is the appended trajectory.txt, and a crash loses the whole grid.
Here the full reconstruction state — grid, pose, frame counter — snapshots
to a directory as a single .npz replaced atomically (temp + os.replace),
enabling stop/resume and the elastic-recovery story. Deliberately NOT
orbax: the state is one small pytree of same-shaped arrays, a single
atomic file replace IS the whole durability story (bitwise-resume test),
and host-local .npz keeps restore dependency-free; multi-host runs
device_get through the addressable shards (save_checkpoint) so the same
file works across topology changes. Swap in orbax if per-shard async
saves of much larger grids ever become the bottleneck.
"""
from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from tracking_sdf_tpu.core.lie import Pose
from tracking_sdf_tpu.grid.grid import TSDFGrid

_STATE_FILE = "state.npz"
_META_FILE = "meta.json"


def save_checkpoint(
    path: str,
    grid: TSDFGrid,
    pose: Pose,
    frame_num: int,
    extra: Optional[dict] = None,
    pose_prev: Optional[Pose] = None,
) -> None:
    """Write a checkpoint directory (atomic via temp+rename).

    ``pose_prev`` preserves the constant-velocity tracker-initialization
    state so a resumed run is bitwise-identical to an uninterrupted one."""
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, _STATE_FILE + ".tmp")
    arrays = {f"grid_{name}": np.asarray(leaf) for name, leaf in zip(grid._fields, grid)}
    arrays["pose_R"] = np.asarray(pose.R)
    arrays["pose_t"] = np.asarray(pose.t)
    if pose_prev is not None:
        arrays["pose_prev_R"] = np.asarray(pose_prev.R)
        arrays["pose_prev_t"] = np.asarray(pose_prev.t)
    # frame_num rides INSIDE the npz so grid+counter replace in ONE atomic
    # rename (a crash between two file replaces would pair a new grid with
    # a stale counter and double-fuse frames on resume); meta.json is a
    # human-readable mirror, not the source of truth on load.
    arrays["frame_num"] = np.int64(frame_num)
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, os.path.join(path, _STATE_FILE))
    meta = {"frame_num": int(frame_num), **(extra or {})}
    tmp_meta = os.path.join(path, _META_FILE + ".tmp")
    with open(tmp_meta, "w") as f:
        json.dump(meta, f)
    os.replace(tmp_meta, os.path.join(path, _META_FILE))


def load_checkpoint(
    path: str,
) -> Tuple[TSDFGrid, Pose, int, dict, Optional[Pose]]:
    """Read a checkpoint directory -> (grid, pose, frame_num, meta, pose_prev)."""
    with np.load(os.path.join(path, _STATE_FILE)) as z:
        grid = TSDFGrid(*(jnp.asarray(z[f"grid_{name}"]) for name in TSDFGrid._fields))
        pose = Pose(jnp.asarray(z["pose_R"]), jnp.asarray(z["pose_t"]))
        pose_prev = None
        if "pose_prev_R" in z:
            pose_prev = Pose(jnp.asarray(z["pose_prev_R"]),
                             jnp.asarray(z["pose_prev_t"]))
        frame_in_npz = int(z["frame_num"]) if "frame_num" in z else None
    with open(os.path.join(path, _META_FILE)) as f:
        meta = json.load(f)
    meta_frame = int(meta.pop("frame_num"))
    # the npz is the atomic source of truth; meta.json is a readable mirror
    # (older checkpoints predate the in-npz counter — fall back then)
    frame_num = frame_in_npz if frame_in_npz is not None else meta_frame
    return grid, pose, frame_num, meta, pose_prev


def exists(path: str) -> bool:
    return os.path.exists(os.path.join(path, _STATE_FILE)) and os.path.exists(
        os.path.join(path, _META_FILE)
    )
