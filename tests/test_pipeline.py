"""Pipeline tier: trajectory IO/metrics, TUM dataset roundtrip, end-to-end runner."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from tracking_sdf_tpu.config import (
    FusionConfig,
    GridParams,
    PipelineConfig,
    RaycastConfig,
    TrackingConfig,
)
from tracking_sdf_tpu.core.camera import PinholeCamera
from tracking_sdf_tpu.core.lie import (
    Pose,
    pose_compose,
    pose_inverse,
    quaternion_from_matrix,
    se3_exp,
    se3_log,
)
from tracking_sdf_tpu.data.synthetic import (
    CuboidScene,
    SphereScene,
    look_at,
    render_scene_depth,
)
from tracking_sdf_tpu.data.tum import TUMDataset, write_synthetic_tum
from tracking_sdf_tpu.pipeline import (
    Reconstruction,
    TrajectoryWriter,
    align_umeyama,
    associate,
    ate_rmse,
    read_trajectory,
    rpe_rmse,
)

PARAMS = GridParams(m=48, width=2.0, height=2.0, depth=2.0,
                    origin=(-1.0, -1.0, -1.0), delta=0.15, epsilon=0.02)
CAM = PinholeCamera(fx=60.0, fy=60.0, cx=47.5, cy=35.5, width=96, height=72)
SPHERE = SphereScene(center=(0.15, 0.1, 0.0), radius=0.4)
BOX = CuboidScene(min_corner=(-0.75, -0.4, -0.55), max_corner=(-0.35, 0.4, 0.15))


class Scene:
    def sdf(self, x):
        return jnp.minimum(SPHERE.sdf(x), BOX.sdf(x))

    def color(self, x):
        return SPHERE.color(x)

    def intersect(self, o, d):
        ta, tb = SPHERE.intersect(o, d), BOX.intersect(o, d)
        return jnp.where(jnp.isnan(ta), tb,
                         jnp.where(jnp.isnan(tb), ta, jnp.minimum(ta, tb)))


SCENE = Scene()


def _orbit(n):
    poses = []
    for i in range(n):
        a = 0.12 * np.sin(2 * np.pi * i / n)
        eye = (0.45 * np.sin(a), -1.45 * np.cos(a * 0.5), 0.25)
        poses.append(look_at(eye, (0.0, 0.0, 0.0)))
    return poses


# --------------------------------------------------------------------------- #
# trajectory + metrics


def test_trajectory_roundtrip(tmp_path):
    path = str(tmp_path / "traj.txt")
    poses = _orbit(5)
    with TrajectoryWriter(path) as w:
        for i, p in enumerate(poses):
            w.write(100.0 + i * 0.1, p)
    traj = read_trajectory(path)
    assert len(traj) == 5
    np.testing.assert_allclose(traj.timestamps, 100.0 + 0.1 * np.arange(5), atol=1e-6)
    np.testing.assert_allclose(
        traj.translations[2], np.asarray(poses[2].t), atol=1e-5
    )
    R2 = traj.rotation_matrices()[2]
    np.testing.assert_allclose(R2, np.asarray(poses[2].R), atol=1e-5)


def test_associate_greedy_nearest():
    a = np.asarray([0.0, 1.0, 2.0, 3.0])
    b = np.asarray([0.005, 1.5, 2.99, 3.01])
    pairs = associate(a, b, max_dt=0.02)
    assert (0, 0) in pairs and (3, 3) in pairs
    assert all(abs(a[i] - b[j]) <= 0.02 for i, j in pairs)


def test_umeyama_alignment_recovers_rigid_transform():
    rng = np.random.default_rng(0)
    src = rng.normal(size=(40, 3))
    R_true = np.asarray(se3_exp(jnp.asarray([0, 0, 0, 0.3, -0.2, 0.5])).R)
    t_true = np.asarray([0.5, -1.0, 2.0])
    dst = (R_true @ src.T).T + t_true
    s, R, t = align_umeyama(src, dst)
    np.testing.assert_allclose(R, R_true, atol=1e-6)
    np.testing.assert_allclose(t, t_true, atol=1e-6)
    assert abs(s - 1.0) < 1e-9


def test_ate_zero_for_identical_and_rigidly_moved():
    poses = _orbit(8)
    stamps = 10.0 + 0.1 * np.arange(8)
    tr = np.stack([np.asarray(p.t) for p in poses])
    qu = np.stack([np.asarray(quaternion_from_matrix(p.R)) for p in poses])
    from tracking_sdf_tpu.pipeline import Trajectory

    gt = Trajectory(stamps, tr, qu)
    rmse, n = ate_rmse(gt, gt)
    assert n == 8 and rmse < 1e-9
    # rigidly transformed copy still has ATE ~0 after alignment
    R = np.asarray(se3_exp(jnp.asarray([0, 0, 0, 0.2, 0.1, -0.3])).R)
    moved = Trajectory(stamps, (R @ tr.T).T + np.asarray([1.0, 2.0, 3.0]), qu)
    rmse2, _ = ate_rmse(moved, gt)
    assert rmse2 < 1e-6
    t_rpe, r_rpe = rpe_rmse(gt, gt)
    assert t_rpe < 1e-9 and r_rpe < 1e-6


# --------------------------------------------------------------------------- #
# TUM dataset


def test_tum_write_read_roundtrip(tmp_path):
    root = str(tmp_path / "seq")
    poses = _orbit(3)
    depths, rgbs, gts = [], [], []
    for p in poses:
        d = np.asarray(render_scene_depth(SCENE, CAM, p))
        depths.append(d)
        rgbs.append(np.full(d.shape + (3,), 0.5, np.float32))
        gts.append((np.asarray(p.t), np.asarray(quaternion_from_matrix(p.R))))
    write_synthetic_tum(root, depths, rgbs, gts)

    ds = TUMDataset(root)
    assert len(ds) == 3
    assert ds.groundtruth is not None and len(ds.groundtruth) == 3
    f1 = ds[1]
    # 16-bit quantization at 1/5000 m resolution
    both = np.isfinite(depths[1]) & np.isfinite(f1.depth)
    assert np.isfinite(f1.depth).sum() > 0
    np.testing.assert_allclose(f1.depth[both], depths[1][both], atol=1.1 / 5000.0)
    # NaN holes preserved through the 0-encoding
    assert np.array_equal(np.isfinite(f1.depth), np.isfinite(depths[1]))
    assert f1.rgb is not None
    np.testing.assert_allclose(f1.rgb, rgbs[1], atol=1.0 / 255.0)
    assert f1.gt_pose is not None
    np.testing.assert_allclose(f1.gt_pose[0], gts[1][0], atol=1e-5)


# --------------------------------------------------------------------------- #
# end-to-end runner


def _pipeline_cfg(tmp_path, **kw):
    return PipelineConfig(
        grid=PARAMS,
        tracking=TrackingConfig(max_iterations=20),
        fusion=FusionConfig(),
        raycast=RaycastConfig(t_near=0.05, t_far=4.0),
        trajectory_path=str(tmp_path / "traj.txt"),
        bilateral_filter=False,  # synthetic depth is exact
        **kw,
    )


def test_runner_tracks_synthetic_sequence(tmp_path):
    poses = _orbit(6)
    cfg = _pipeline_cfg(tmp_path)
    recon = Reconstruction(CAM, cfg, initial_pose=poses[0])
    for i, p in enumerate(poses):
        depth = render_scene_depth(SCENE, CAM, p)
        recon.process_frame(depth, timestamp=100.0 + i * 0.1)
    recon.close()

    # tracked pose follows the true orbit
    err = se3_log(pose_compose(pose_inverse(recon.pose), poses[-1]))
    # Loop-integrity tolerance ~1 voxel: frame-to-model tracking against a
    # FUSED model on a coarse 4.2 cm grid has an inherent ~1 cm optimum
    # offset (measured: tracking from the true pose converges 5-9 mm away).
    # The tight accuracy gates live in test_tracking (analytic grid).
    err = np.asarray(err)
    assert np.linalg.norm(err[:3]) < 0.04, err
    assert np.linalg.norm(err[3:]) < 0.05, err

    # trajectory file written and ATE vs true orbit is small
    est = read_trajectory(str(tmp_path / "traj.txt"))
    assert len(est) == 6
    from tracking_sdf_tpu.pipeline import Trajectory

    gt = Trajectory(
        100.0 + 0.1 * np.arange(6),
        np.stack([np.asarray(p.t) for p in poses]),
        np.stack([np.asarray(quaternion_from_matrix(p.R)) for p in poses]),
    )
    rmse, n = ate_rmse(est, gt)
    assert n == 6 and rmse < 0.03, rmse

    # render from the final model: depth close to analytic where hit
    r = recon.render(poses[0], with_color=True)
    gt_d = np.asarray(render_scene_depth(SCENE, CAM, poses[0]))
    both = np.asarray(r.hit) & np.isfinite(gt_d)
    assert both.sum() > 500
    med = np.median(np.abs(np.asarray(r.depth)[both] - gt_d[both]))
    assert med < 0.02, med


def test_runner_groundtruth_mode_and_mesh(tmp_path):
    poses = _orbit(4)
    cfg = _pipeline_cfg(tmp_path, use_groundtruth=True)
    recon = Reconstruction(CAM, cfg, initial_pose=poses[0])
    for i, p in enumerate(poses):
        depth = render_scene_depth(SCENE, CAM, p)
        recon.process_frame(depth, timestamp=float(i), gt_pose=p)
    recon.close()
    # groundtruth mode: pose exactly the provided one, no GN iterations
    assert all(s.gn_iterations == 0 for s in recon.stats)
    np.testing.assert_allclose(np.asarray(recon.pose.t), np.asarray(poses[-1].t))

    mesh_path = str(tmp_path / "scene.ply")
    n_tri = recon.export_mesh(mesh_path)
    assert n_tri > 100
    assert os.path.getsize(mesh_path) > 1000


def test_cli_tum_dataset_with_eval(tmp_path, capsys):
    """CLI on an on-disk TUM sequence: trajectory + ATE in the summary."""
    import json

    from tracking_sdf_tpu.cli import main

    root = str(tmp_path / "seq")
    poses = _orbit(5)
    depths, gts = [], []
    for p in poses:
        depths.append(np.asarray(render_scene_depth(SCENE, CAM, p)))
        gts.append((np.asarray(p.t), np.asarray(quaternion_from_matrix(p.R))))
    write_synthetic_tum(root, depths, None, gts)

    # fusion-only oracle mode: poses from groundtruth, ATE must be ~0
    traj = str(tmp_path / "t.txt")
    rc = main([
        "--preset", "synthetic64", "--dataset", root, "--no-color",
        "--groundtruth-poses", "--trajectory", traj, "--eval", "--json",
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["frames"] == 5.0
    assert summary["ate_pairs"] == 5.0
    assert summary["ate_rmse_m"] < 1e-5, summary

    # note: the synthetic64 preset's camera differs from tum_fr1_camera();
    # this test only exercises the dataset+oracle+eval plumbing, so the
    # mismatch is irrelevant (poses come from groundtruth).


def test_cli_synthetic_end_to_end(tmp_path, capsys):
    from tracking_sdf_tpu.cli import main

    traj = str(tmp_path / "t.txt")
    mesh = str(tmp_path / "m.ply")
    png = str(tmp_path / "panel.png")
    rc = main([
        "--preset", "synthetic64", "--synthetic", "--frames", "5",
        "--trajectory", traj, "--mesh", mesh, "--render", png, "--json",
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    import json

    summary = json.loads(out)
    assert summary["frames"] == 5.0
    assert os.path.exists(traj) and os.path.exists(mesh)
    # --render drove raycast + image_io: a real PNG came out
    assert os.path.getsize(png) > 1000
    from PIL import Image
    w, h = Image.open(png).size
    assert w > 0 and h > 0


import pytest


def test_runner_bfloat16_storage_tracks_like_dense(tmp_path):
    """storage_dtype='bfloat16' through the full runner: the per-store
    value quantization (delta/256) must not disturb tracking — poses stay
    within a small fraction of a voxel of the dense-f32 run."""
    import dataclasses

    poses = _orbit(5)
    cfg_d = _pipeline_cfg(tmp_path)
    cfg_b = dataclasses.replace(
        cfg_d,
        fusion=FusionConfig(mode="brickmajor", brick_shape=(8, 8, 16),
                            brick_cap=256, storage_dtype="bfloat16"),
    )
    rd = Reconstruction(CAM, cfg_d, initial_pose=poses[0])
    rb = Reconstruction(CAM, cfg_b, initial_pose=poses[0])
    assert rb._bgrid.D.dtype == jnp.bfloat16
    assert rb._bgrid.W.dtype == jnp.float32
    for i, p in enumerate(poses):
        depth = render_scene_depth(SCENE, CAM, p)
        rd.process_frame(depth, timestamp=float(i))
        rb.process_frame(depth, timestamp=float(i))
    rd.close()
    rb.close()
    assert int(rb.last_fuse_stats.overflow) == 0
    # bf16 drift bound: well under a voxel (voxel = width/m)
    vox = cfg_d.grid.width / cfg_d.grid.m
    err = float(np.linalg.norm(np.asarray(rb.pose.t) - np.asarray(rd.pose.t)))
    assert err < 0.2 * vox, err
    gd, gb = rd.grid, rb.grid
    # the slightly different tracked poses flip observation masks for a
    # handful of borderline voxels — require W equal on >99.9% of the grid
    # and D close wherever both runs observed
    Wd, Wb = np.asarray(gd.W), np.asarray(gb.W)
    frac_neq = np.mean(~np.isclose(Wb, Wd, atol=1e-2))
    assert frac_neq < 1e-3, frac_neq
    ok = (Wd > 0) & (Wb > 0) & np.isclose(Wb, Wd, atol=1e-2)
    derr = np.abs(np.asarray(gb.D)[ok] - np.asarray(gd.D)[ok])
    # bulk of the field: quantization-scale agreement; the tail is
    # pose-drift-induced (the two runs track slightly different
    # trajectories, so near-silhouette voxels see different d) — bound it
    # by the measured pose difference, not the bf16 quantum
    assert np.median(derr) < 2 * cfg_d.grid.delta / 256, np.median(derr)
    assert np.percentile(derr, 99.9) < max(10 * err, 0.01), derr.max()


@pytest.mark.parametrize("mode", ["brickmajor", "packed"])
def test_runner_brickmajor_mode_matches_dense(tmp_path, mode):
    """mode='brickmajor'/'packed' through the full runner: tracks the same
    orbit as dense mode (same poses to f32 tolerance at pixel_share=1),
    exports a mesh off the materialized dense view, and
    checkpoint-roundtrips."""
    poses = _orbit(5)
    cfg_d = _pipeline_cfg(tmp_path)
    import dataclasses
    cfg_b = dataclasses.replace(
        cfg_d,
        fusion=FusionConfig(mode=mode, brick_shape=(8, 8, 16),
                            brick_cap=256),
    )
    rd = Reconstruction(CAM, cfg_d, initial_pose=poses[0])
    rb = Reconstruction(CAM, cfg_b, initial_pose=poses[0])
    for i, p in enumerate(poses):
        depth = render_scene_depth(SCENE, CAM, p)
        rd.process_frame(depth, timestamp=float(i))
        rb.process_frame(depth, timestamp=float(i))
    rd.close()
    rb.close()
    assert int(rb.last_fuse_stats.overflow) == 0
    np.testing.assert_allclose(np.asarray(rb.pose.t), np.asarray(rd.pose.t),
                               atol=1e-4)
    gd, gb = rd.grid, rb.grid  # rb.grid materializes from brick rows
    np.testing.assert_allclose(np.asarray(gb.W), np.asarray(gd.W), atol=1e-3)
    ok = np.asarray(gd.W) > 0
    np.testing.assert_allclose(np.asarray(gb.D)[ok], np.asarray(gd.D)[ok],
                               atol=1e-3)

    mesh_path = str(tmp_path / "bm.ply")
    assert rb.export_mesh(mesh_path) > 100

    # checkpoint through the dense view; restore converts back to bricks
    ckpt = str(tmp_path / "bm.ckpt")
    rb2 = Reconstruction(CAM, cfg_b, initial_pose=poses[0])
    rb.save_checkpoint(ckpt)
    rb2.restore_checkpoint(ckpt)
    assert rb2.frame_num == rb.frame_num
    D2, D1 = ((r._bgrid.data[:, 0] if mode == "packed" else r._bgrid.D)
              for r in (rb2, rb))
    np.testing.assert_allclose(np.asarray(D2), np.asarray(D1))
    # _dm is the zero-copy BrickMaskedView over the brick rows; compare the
    # D lanes only (the packed view's rows interleave all six channels)
    np.testing.assert_array_equal(np.isnan(np.asarray(D2)),
                                  np.isnan(np.asarray(D1)))


def test_process_chunk_matches_per_frame(tmp_path):
    """Chunked device-side processing (N frames in ONE dispatch) must
    reproduce the per-frame loop: same poses, same rejection flags, same
    grid. Includes a rejected frame (all-NaN depth) mid-chunk to pin the
    in-graph failure gate + fusion-no-op + velocity-reset semantics, and
    a uint16 raw-depth chunk to pin the on-device TUM decode."""
    import dataclasses

    from tracking_sdf_tpu.config import FusionConfig, PipelineConfig

    cfg = PipelineConfig(
        grid=PARAMS,
        fusion=FusionConfig(mode="brickmajor", brick_shape=(8, 8, 8),
                            brick_cap=512, brick_cap_free=256,
                            fuse_color=False),
        pyramid_levels=(2, 1),
        trajectory_path=None, bilateral_filter=False,
    )
    poses = _orbit(7)
    depths = [render_scene_depth(SCENE, CAM, p) for p in poses]
    depths[4] = jnp.full_like(depths[4], jnp.nan)  # gate must fire

    r_seq = Reconstruction(CAM, cfg, initial_pose=poses[0])
    for i, d in enumerate(depths):
        r_seq.process_frame(d, timestamp=float(i))

    r_chk = Reconstruction(CAM, cfg, initial_pose=poses[0])
    r_chk.process_frame(depths[0], timestamp=0.0)  # bootstrap frame
    stats = r_chk.process_chunk(jnp.stack(depths[1:]),
                                timestamps=[float(i) for i in range(1, 7)])
    assert len(stats) == 6
    assert [s.rejected for s in stats] == \
        [s.rejected for s in r_seq.stats[1:]]
    assert stats[3].rejected  # the NaN frame
    np.testing.assert_allclose(np.asarray(r_chk.pose.t),
                               np.asarray(r_seq.pose.t), atol=1e-5)
    np.testing.assert_allclose(np.asarray(r_chk.pose.R),
                               np.asarray(r_seq.pose.R), atol=1e-5)
    g1, g2 = r_seq.grid, r_chk.grid
    np.testing.assert_allclose(np.asarray(g2.W), np.asarray(g1.W),
                               atol=1e-5)
    ok = np.asarray(g1.W) > 0
    np.testing.assert_allclose(np.asarray(g2.D)[ok], np.asarray(g1.D)[ok],
                               atol=1e-5)
    # per-frame GN iteration counts match (same math, same schedule)
    assert [s.gn_iterations for s in stats] == \
        [s.gn_iterations for s in r_seq.stats[1:]]
    # phase split restored (round 4): chunked stats carry a measured
    # fuse_ms (calibrated on-device loop) and an iteration-weighted
    # track_ms, not the old track=wall/n, fuse=0 placeholder
    assert all(s.fuse_ms > 0 for s in stats if not s.rejected)
    assert all(s.fuse_ms == 0 for s in stats if s.rejected)
    assert all(s.track_ms > 0 for s in stats)

    # uint16 raw chunk: on-device TUM decode (v/5000, 0 = NaN hole)
    r_raw = Reconstruction(CAM, cfg, initial_pose=poses[0])
    r_raw.process_frame(depths[0], timestamp=0.0)
    raw = []
    for d in depths[1:4]:
        a = np.asarray(d)
        u = np.where(np.isfinite(a), np.round(a * 5000.0), 0.0)
        raw.append(u.astype(np.uint16))
    r_raw.process_chunk(np.stack(raw),
                        timestamps=[1.0, 2.0, 3.0])
    # quantization is 0.1 mm — pose must stay with the float path's
    r_f = Reconstruction(CAM, cfg, initial_pose=poses[0])
    for i, d in enumerate(depths[:4]):
        r_f.process_frame(d, timestamp=float(i))
    assert float(jnp.linalg.norm(r_raw.pose.t - r_f.pose.t)) < 2e-3


def test_color_every_subsampling():
    """FusionConfig.color_every=2: geometry (D/W) must be IDENTICAL to the
    every-frame-color run (tracking reads only D), color weight must only
    accumulate on the cadence frames, and the chunked path must follow the
    same absolute-frame cadence."""
    import dataclasses

    from tracking_sdf_tpu.config import FusionConfig, PipelineConfig

    def cfg_ce(ce):
        return PipelineConfig(
            grid=PARAMS,
            fusion=FusionConfig(mode="brickmajor", brick_shape=(8, 8, 8),
                                brick_cap=512, brick_cap_free=256,
                                color_every=ce),
            trajectory_path=None, bilateral_filter=False)

    poses = _orbit(5)
    depths = [render_scene_depth(SCENE, CAM, p) for p in poses]
    rgbs = [jnp.full(jnp.asarray(d).shape + (3,), 0.25 + 0.1 * i,
                     dtype=jnp.float32) for i, d in enumerate(depths)]

    r1 = Reconstruction(CAM, cfg_ce(1), initial_pose=poses[0])
    r2 = Reconstruction(CAM, cfg_ce(2), initial_pose=poses[0])
    for i in range(5):
        r1.process_frame(depths[i], rgbs[i], timestamp=float(i))
        r2.process_frame(depths[i], rgbs[i], timestamp=float(i))
    g1, g2 = r1.grid, r2.grid
    # geometry equal up to cross-program boundary flips: the no-color
    # program compiles a different fusion layout, and an ulp change in d
    # at the truncation gate (d >= -delta) flips whether ONE
    # boundary-band voxel fuses (measured: 1 of 110k, |dD| 1.4 cm). Pin
    # the flip FRACTION, not elementwise equality.
    w1, w2 = np.asarray(g1.W), np.asarray(g2.W)
    assert np.mean(~np.isclose(w1, w2, atol=1e-5)) < 1e-4
    d1, d2 = np.asarray(g1.D), np.asarray(g2.D)
    both = (w1 > 0) & (w2 > 0) & np.isclose(w1, w2, atol=1e-5)
    np.testing.assert_allclose(d2[both], d1[both], atol=1e-4)
    # color weight: ce=2 fused color on frames 2 and 4 only (frame_num
    # 1..5; frame_num % 2 == 0) — strictly less accumulated weight
    assert 0 < float(g2.Wc.sum()) < float(g1.Wc.sum())
    # colored voxels still carry sane values
    fused = np.asarray(g2.Wc) > 0
    assert fused.any()
    assert np.nanmax(np.asarray(g2.R)[fused]) <= 1.0

    # chunked path: same absolute cadence -> same grid as per-frame ce=2
    r3 = Reconstruction(CAM, cfg_ce(2), initial_pose=poses[0])
    r3.process_frame(depths[0], rgbs[0], timestamp=0.0)
    r3.process_chunk(jnp.stack([jnp.asarray(d) for d in depths[1:]]),
                     jnp.stack(rgbs[1:]),
                     timestamps=[1.0, 2.0, 3.0, 4.0])
    g3 = r3.grid
    # same boundary-flip tolerance class as above (chunk vs per-frame are
    # different programs too)
    assert np.mean(~np.isclose(np.asarray(g3.Wc), np.asarray(g2.Wc),
                               atol=1e-5)) < 1e-4
    assert np.mean(~np.isclose(np.asarray(g3.W), np.asarray(g2.W),
                               atol=1e-5)) < 1e-4


def test_realtime_pacer_drop_semantics():
    """RealtimePacer: queue-size-1 paced arrival (sdf_reconstruction.cpp:89
    semantics). A consumer slower than the sensor gets the NEWEST arrived
    frame (stale ones counted dropped); a fast consumer blocks for the
    next arrival and drops nothing."""
    import time as _time

    from tracking_sdf_tpu.pipeline import RealtimePacer

    data = list(range(60))
    # slow consumer: ~3 frame periods of work per frame at 200 Hz
    pacer = RealtimePacer(data, hz=200.0)
    seen = []
    for item in pacer:
        seen.append(item)
        _time.sleep(3 / 200.0)
    assert seen[-1] == 59  # the newest frame is always reachable
    assert seen == sorted(seen)  # monotone, no reordering
    assert pacer.dropped > 0
    assert pacer.dropped + pacer.yielded == len(data)
    # fast consumer: paces to the arrival clock, zero drops
    pacer2 = RealtimePacer(data[:10], hz=500.0)
    t0 = _time.perf_counter()
    out = list(pacer2)
    wall = _time.perf_counter() - t0
    assert out == data[:10]
    assert pacer2.dropped == 0
    # waited for arrivals (the default 2 warmup frames are un-paced)
    assert wall >= 7 / 500.0


def test_realtime_cli_end_to_end(tmp_path):
    """--realtime paced replay through the full CLI: still tracks (ATE
    gate) while reporting drop counts in the JSON summary."""
    import json
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "tracking_sdf_tpu.cli", "--cpu",
         "--preset", "synthetic64", "--synthetic", "--frames", "8",
         "--realtime", "120", "--trajectory", str(tmp_path / "t.txt"),
         "--eval", "--json"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=500)
    assert r.returncode == 0, r.stderr[-3000:]
    s = json.loads(r.stdout.splitlines()[-1])
    # CPU frames take >> 1/120 s: the pacer must have dropped stale frames
    assert s["realtime_dropped"] > 0
    assert s["realtime_yielded"] + s["realtime_dropped"] == 8
    assert s["frames"] == s["realtime_yielded"]
    # and tracking survived the larger inter-frame motion
    assert s["ate_rmse_m"] is not None and s["ate_rmse_m"] < 0.08


def test_cli_zero_overrides_expressible():
    """Round-4 regression (review finding): presets now ship
    max_weight=128 / brick_cap_free>0, so '0' must actually express
    'clamp off' / 'follow brick_cap' instead of falling into falsy-zero
    no-ops."""
    from tracking_sdf_tpu import cli
    from tracking_sdf_tpu.config import preset as real_preset

    captured = {}

    class _Stop(Exception):
        pass

    def fake_reconstruction(cam, cfg, **kw):
        captured["cfg"] = cfg
        raise _Stop

    import tracking_sdf_tpu.pipeline as pl
    orig = pl.Reconstruction
    pl.Reconstruction = fake_reconstruction
    try:
        try:
            cli.main(["--cpu", "--preset", "tum512", "--synthetic",
                      "--frames", "1", "--max-weight", "0",
                      "--brick-cap-free", "0",
                      "--weight-dtype", "float32"])
        except _Stop:
            pass
    finally:
        pl.Reconstruction = orig
    f = captured["cfg"].fusion
    assert real_preset("tum512").fusion.max_weight == 128.0
    assert f.max_weight is None
    assert f.brick_cap_free == 0
    assert f.weight_dtype == "float32"
    # negative default keeps the preset values
    captured.clear()
    pl.Reconstruction = fake_reconstruction
    try:
        try:
            cli.main(["--cpu", "--preset", "tum512", "--synthetic",
                      "--frames", "1"])
        except _Stop:
            pass
    finally:
        pl.Reconstruction = orig
    f = captured["cfg"].fusion
    assert f.max_weight == 128.0 and f.brick_cap_free == 8192


# (round 5: --realtime --multihost is now SUPPORTED via the rank-0-paced
# broadcast pacer — tests/test_multiprocess.py::test_multihost_cli_realtime
# replaces the old rejection test)
