"""Native C++ PNG loader vs the PIL reference path: bit-exact decode + order."""
import numpy as np
import pytest

from tracking_sdf_tpu.data import native
from tracking_sdf_tpu.data.tum import load_depth_png, load_rgb_png, write_synthetic_tum

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


@pytest.fixture(scope="module")
def seq(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("native_seq"))
    rng = np.random.default_rng(0)
    depths, rgbs = [], []
    for i in range(6):
        d = rng.uniform(0.4, 4.0, size=(48, 64)).astype(np.float32)
        d[rng.random((48, 64)) < 0.15] = np.nan  # Kinect holes
        depths.append(d)
        rgbs.append(rng.random((48, 64, 3)).astype(np.float32))
    write_synthetic_tum(root, depths, rgbs)
    return root, depths, rgbs


def _listing(root, name):
    import os

    out = []
    with open(os.path.join(root, name)) as f:
        for line in f:
            if line.startswith("#"):
                continue
            out.append(os.path.join(root, line.split()[1]))
    return out


def test_native_depth_decode_matches_pil(seq):
    root, depths, _ = seq
    for path in _listing(root, "depth.txt"):
        a = native.decode_depth(path)
        b = load_depth_png(path)
        assert a.shape == b.shape
        np.testing.assert_array_equal(np.isnan(a), np.isnan(b))
        both = ~np.isnan(a)
        np.testing.assert_array_equal(a[both], b[both])


def test_native_rgb_decode_matches_pil(seq):
    root, _, rgbs = seq
    for path in _listing(root, "rgb.txt"):
        a = native.decode_rgb(path)
        b = load_rgb_png(path)
        np.testing.assert_array_equal(a, b.astype(np.float32))


def test_prefetching_loader_ordered_and_complete(seq):
    root, depths, rgbs = seq
    dp = _listing(root, "depth.txt")
    rp = _listing(root, "rgb.txt")
    with native.PrefetchingLoader(dp, rp, prefetch=3, threads=4) as ld:
        assert (ld.width, ld.height) == (64, 48)
        seen = []
        for idx, depth, rgb in ld:
            seen.append(idx)
            ref = load_depth_png(dp[idx])
            both = ~np.isnan(ref)
            np.testing.assert_array_equal(depth[both], ref[both])
            assert rgb is not None
    assert seen == list(range(6))


def test_prefetching_loader_depth_only(seq):
    root, depths, _ = seq
    dp = _listing(root, "depth.txt")
    with native.PrefetchingLoader(dp, None, prefetch=2, threads=2) as ld:
        frames = list(ld)
    assert [i for i, _, _ in frames] == list(range(6))
    assert all(rgb is None for _, _, rgb in frames)


def test_corrupt_png_rejected_not_crash(tmp_path):
    """Hardening regression: fuzzed/corrupt PNGs must yield a decode ERROR
    (rc < 0 -> Python exception), never a crash or overflow. Covers the
    absurd-IHDR-dims path (2^30 x 2^30 would have bad_alloc'd across the
    extern-C boundary and killed the process) and int-overflow dims."""
    import struct
    import zlib as _zlib

    import pytest

    def png(w, h, bit_depth=16, color_type=0, payload=b"\x00" * 10):
        ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, 0)
        def chunk(typ, data):
            c = struct.pack(">I", len(data)) + typ + data
            return c + struct.pack(">I", _zlib.crc32(typ + data))
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", _zlib.compress(payload))
                + chunk(b"IEND", b""))

    cases = {
        "huge.png": png(1 << 30, 1 << 30),        # bad_alloc territory
        "overflow.png": png(65535, 65535),        # 32-bit elem-count overflow
        "trunc.png": png(64, 48)[:20],            # truncated stream
        "zero.png": png(0, 0),
    }
    for name, data in cases.items():
        p = tmp_path / name
        p.write_bytes(data)
        with pytest.raises(Exception):
            native.decode_depth(str(p))


def test_prefetching_loader_raw_mode(seq):
    """raw=True yields the exact TUM wire bytes: depth uint16 (PIL u16
    roundtrip bit-exact, 0 = the NaN holes), rgb uint8 (PIL u8 roundtrip),
    in order."""
    from PIL import Image

    root, depths, rgbs = seq
    dp = _listing(root, "depth.txt")
    rp = _listing(root, "rgb.txt")
    with native.PrefetchingLoader(dp, rp, raw=True) as ld:
        got = list(ld)
    assert [i for i, _, _ in got] == list(range(len(dp)))
    for (i, d16, r8), dpath, rpath in zip(got, dp, rp):
        assert d16.dtype == np.uint16 and r8.dtype == np.uint8
        ref16 = np.asarray(Image.open(dpath)).astype(np.uint16)
        np.testing.assert_array_equal(d16, ref16)
        # holes (NaN in the float fixture) are exactly the 0 pixels
        np.testing.assert_array_equal(d16 == 0, np.isnan(depths[i]))
        ref8 = np.asarray(Image.open(rpath).convert("RGB"))
        np.testing.assert_array_equal(r8, ref8)


def test_stream_raw_through_runner_chunks(tmp_path):
    """TUMDataset.stream(raw=True) -> run(chunk=N): the full wire path
    (u16/u8 host buffers, on-device decode) must land on the same pose as
    the float-wire path. Needs a TRACKABLE scene (the random-noise `seq`
    fixture amplifies ulp-level decode-placement reassociation
    chaotically): a smooth sinusoidal depth surface with texture."""
    import jax.numpy as jnp

    from tracking_sdf_tpu.config import FusionConfig, GridParams, PipelineConfig
    from tracking_sdf_tpu.core.camera import PinholeCamera
    from tracking_sdf_tpu.data.tum import TUMDataset
    from tracking_sdf_tpu.pipeline.runner import Reconstruction

    root = str(tmp_path / "raw_seq")
    ys, xs = np.mgrid[0:48, 0:64]
    depths, rgbs = [], []
    for i in range(6):
        d = 1.0 + 0.3 * np.sin(xs / 10.0 + 0.05 * i) + 0.2 * np.cos(ys / 7.0)
        depths.append(d.astype(np.float32))
        rgbs.append((0.5 + 0.3 * np.sin(xs / 5.0))[..., None]
                    .repeat(3, -1).astype(np.float32))
    write_synthetic_tum(root, depths, rgbs)

    cfg = PipelineConfig(
        grid=GridParams(m=48),
        fusion=FusionConfig(mode="brickmajor", brick_shape=(8, 8, 8),
                            brick_cap=216, brick_cap_free=216),
        trajectory_path=None, bilateral_filter=False)
    cam = PinholeCamera(fx=48.0, fy=48.0, cx=31.5, cy=23.5,
                        width=64, height=48)
    r_raw = Reconstruction(cam, cfg)
    r_raw.run(TUMDataset(root).stream(raw=True), chunk=3)
    r_f32 = Reconstruction(cam, cfg)
    r_f32.run(TUMDataset(root).stream(), chunk=3)
    assert r_raw.frame_num == r_f32.frame_num == 6
    d = float(jnp.linalg.norm(r_raw.pose.t - r_f32.pose.t))
    assert d < 1e-5, d


def test_raw_open_mode_race_regression(seq):
    """The raw flag must be set BEFORE the worker pool spawns: the old
    open_raw wrapper flipped it after tsdf_loader_open started the
    threads, and workers winning the race decoded in float mode — the raw
    consumer then handed Python uninitialized np.empty buffers (rare
    garbage-depth / missing-rgb frames under load). 25 fresh raw opens
    with a full pool make the old race fire with high probability."""
    from PIL import Image

    root, depths, rgbs = seq
    dp = _listing(root, "depth.txt")
    rp = _listing(root, "rgb.txt")
    ref16 = [np.asarray(Image.open(p)).astype(np.uint16) for p in dp]
    for _ in range(25):
        with native.PrefetchingLoader(dp, rp, raw=True, threads=16) as ld:
            got = list(ld)
        assert [i for i, _, _ in got] == list(range(len(dp)))
        for i, d16, r8 in got:
            assert r8 is not None, f"frame {i} lost rgb (mode race)"
            np.testing.assert_array_equal(d16, ref16[i])
