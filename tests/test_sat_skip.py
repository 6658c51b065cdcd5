"""Saturated-FREE skip (FusionConfig.sat_skip): bitwise exactness.

With a max_weight clamp, a FREE brick's update becomes a bitwise no-op once
W saturates and D reaches its running-mean fixed point. fuse_frame_brickmajor
detects that per brick (comparing the to-be-stored rows against the stored
rows), records it in a carried bitset, and skips recorded bricks' FREE
updates on later frames. These tests pin the exactness contract:

  skip-on == skip-off BITWISE on every leaf, every frame — including through
  a scene change that turns saturated-FREE bricks FULL (exercising the
  clear-on-FULL invalidation) and back to FREE again.

Phases: A (sphere at rest, frames saturate FREE bricks at max_weight=3),
B (sphere translated into previously-free bricks -> those bricks classify
FULL, their sat bits must clear), A again (bricks return to FREE and must
RESUME updates until they re-prove no-op).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from tracking_sdf_tpu.config import FusionConfig, GridParams
from tracking_sdf_tpu.core.camera import PinholeCamera, backproject
from tracking_sdf_tpu.data.synthetic import (
    CuboidScene,
    SphereScene,
    look_at,
    render_scene_depth,
)
from tracking_sdf_tpu.fusion.brickmajor import (
    empty_brick_grid,
    fuse_frame_brickmajor,
)
from tracking_sdf_tpu.tracking import estimate_normals

PARAMS = GridParams(m=48, width=2.0, height=2.0, depth=2.0,
                    origin=(-1.0, -1.0, -1.0), delta=0.15, epsilon=0.02)
CAM = PinholeCamera(fx=60.0, fy=60.0, cx=47.5, cy=35.5, width=96, height=72)
BS = (8, 8, 8)
NB = (48 // 8) ** 3
POSE = look_at((0.0, -1.5, 0.25), (0.0, 0.0, 0.0))
WALL = CuboidScene(min_corner=(-4.0, 0.8, -4.0), max_corner=(4.0, 1.2, 4.0))


def _scene(sphere_y):
    sphere = SphereScene(center=(0.15, sphere_y, 0.0), radius=0.4)

    class Scene:
        def sdf(self, x):
            return jnp.minimum(sphere.sdf(x), WALL.sdf(x))

        def color(self, x):
            return sphere.color(x)

        def intersect(self, o, d):
            t = sphere.intersect(o, d)
            tb = WALL.intersect(o, d)
            return jnp.where(jnp.isnan(t), tb,
                             jnp.where(jnp.isnan(tb), t, jnp.minimum(t, tb)))

    return Scene()


def _frame(scene):
    depth = render_scene_depth(scene, CAM, POSE)
    pts = backproject(CAM, depth)
    normals = estimate_normals(pts)
    rgb = jnp.stack([jnp.full(depth.shape, 0.7), jnp.full(depth.shape, 0.4),
                     jnp.full(depth.shape, 0.2)], -1).astype(jnp.float32)
    return pts, normals, rgb


# phase A saturates; phase B moves the sphere toward the camera into bricks
# that were FREE (forcing FULL classification there); then A again
FRAME_A = _frame(_scene(0.1))
FRAME_B = _frame(_scene(-0.45))
SCHEDULE = [FRAME_A] * 6 + [FRAME_B] * 3 + [FRAME_A] * 4


@pytest.mark.parametrize("fold", [False, True], ids=["nofold", "fold"])
@pytest.mark.parametrize("hier", [0, 3], ids=["flat", "hier3"])
def test_sat_skip_bitwise_equals_noskip(fold, hier):
    cfg = FusionConfig(fuse_color=True, max_weight=3.0, free_fold=fold,
                       hier_classify=hier, cap_mixed=8)
    g_ref = empty_brick_grid(PARAMS, BS)
    g_skip = empty_brick_grid(PARAMS, BS)
    sat = jnp.zeros((NB,), bool)
    saw_sat = 0
    saw_skip = False
    for f, (pts, normals, rgb) in enumerate(SCHEDULE):
        g_ref, _, st_ref = fuse_frame_brickmajor(
            g_ref, POSE, pts, normals, rgb, params=PARAMS, cam=CAM,
            cfg=cfg, bs=BS, cap=256, cap_free=256, emit_dm=False)
        g_skip, _, st_skip, sat = fuse_frame_brickmajor(
            g_skip, POSE, pts, normals, rgb, params=PARAMS, cam=CAM,
            cfg=cfg, bs=BS, cap=256, cap_free=256, emit_dm=False, sat=sat)
        for name, a, b in zip(g_ref._fields, g_ref, g_skip):
            aa, bb = np.asarray(a), np.asarray(b)
            same = (aa == bb) | (np.isnan(aa) & np.isnan(bb))
            assert same.all(), (
                f"frame {f} leaf {name}: {np.count_nonzero(~same)} voxels "
                f"differ with sat_skip")
        # classification agreement: FULL sets identical; FREE differs only
        # by skipped (saturated) bricks
        assert int(st_ref.n_full) == int(st_skip.n_full)
        assert int(st_skip.n_free) <= int(st_ref.n_free)
        if int(st_skip.n_free) < int(st_ref.n_free):
            saw_skip = True
        saw_sat = max(saw_sat, int(st_skip.n_sat))
    # the skip must have actually engaged (saturation at max_weight=3 after
    # ~4 identical FREE observations) and actually removed candidates
    assert saw_sat > 0, "no brick ever proved saturated"
    assert saw_skip, "saturated bricks never left the FREE candidate set"
    # after the final A-phase frames the bitset must be re-populated
    assert int(jnp.sum(sat)) > 0


def test_sat_clears_on_full_touch():
    """A brick that was saturated-FREE and then receives a FULL update must
    drop out of the bitset that frame (the clear-on-FULL invariant)."""
    cfg = FusionConfig(fuse_color=False, max_weight=3.0, free_fold=True)
    g = empty_brick_grid(PARAMS, BS)
    sat = jnp.zeros((NB,), bool)
    pts, normals, _ = FRAME_A
    for _ in range(6):
        g, _, st, sat = fuse_frame_brickmajor(
            g, POSE, pts, normals, None, params=PARAMS, cam=CAM, cfg=cfg,
            bs=BS, cap=256, cap_free=256, emit_dm=False, sat=sat)
    n_sat_a = int(jnp.sum(sat))
    assert n_sat_a > 0
    ptsb, normalsb, _ = FRAME_B
    g, _, st, sat = fuse_frame_brickmajor(
        g, POSE, ptsb, normalsb, None, params=PARAMS, cam=CAM, cfg=cfg,
        bs=BS, cap=256, cap_free=256, emit_dm=False, sat=sat)
    # the moved sphere turns some previously-saturated bricks FULL; their
    # bits must clear (strictly fewer saturated than before unless the
    # sphere missed every saturated brick, which this geometry guarantees
    # it does not)
    assert int(jnp.sum(sat)) < n_sat_a


def test_sat_skip_inert_without_max_weight():
    """max_weight=None: W never saturates, no brick ever proves no-op."""
    cfg = FusionConfig(fuse_color=False, max_weight=None, free_fold=True)
    g = empty_brick_grid(PARAMS, BS)
    sat = jnp.zeros((NB,), bool)
    pts, normals, _ = FRAME_A
    for _ in range(5):
        g, _, st, sat = fuse_frame_brickmajor(
            g, POSE, pts, normals, None, params=PARAMS, cam=CAM, cfg=cfg,
            bs=BS, cap=256, cap_free=256, emit_dm=False, sat=sat)
    assert int(jnp.sum(sat)) == 0
