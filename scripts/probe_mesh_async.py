"""Throughput in the reference's OPERATING MODE: tracking+fusion with the
concurrent mesh publisher running (sdf_reconstruction.cpp:97 runs a 1 Hz
visualization thread for the entire session; VERDICT r2 missing-item #2:
this number had never been measured).

Runs the 120-frame TUM-layout dataset (regenerate: data.make_sequence
--out /tmp/tum_synth120 --frames 120) through the full Reconstruction at
the tum256 preset with the publisher OFF / 1 Hz / 0.2 Hz (and a
decimate-2 1 Hz variant), recording sustained fps, the worst 1-second
window, and what the publisher actually achieved (published count +
effective interval after auto-degrade).

On one exclusively-claimed TPU the mesh pass SERIALIZES with the frame
loop at the device even though the host thread is async — this probe
measures exactly that contention.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np

from tracking_sdf_tpu import config
from tracking_sdf_tpu.core.camera import tum_fr1_camera
from tracking_sdf_tpu.data.tum import TUMDataset
from tracking_sdf_tpu.pipeline.runner import Reconstruction

ROOT = os.environ.get("DATASET", "/tmp/tum_synth120")
PRESET = os.environ.get("PRESET", "tum256")
N = int(os.environ.get("FRAMES", "120"))


def run(mesh_hz, decimate, label):
    cfg = config.preset(PRESET)
    import dataclasses

    cfg = dataclasses.replace(cfg, trajectory_path=None, mesh_hz=mesh_hz,
                              mesh_decimate=decimate)
    ds = TUMDataset(ROOT, with_rgb=True)
    cam = tum_fr1_camera()
    recon = Reconstruction(cam, cfg)
    pub = None
    if mesh_hz > 0:
        pub = recon.start_mesh_publisher("/tmp/live_probe.ply",
                                         with_colors=True)
    times = []
    t_wall0 = None
    for i, frame in enumerate(ds):
        if i >= N:
            break
        t0 = time.perf_counter()
        recon.process_frame(frame.depth, frame.rgb, timestamp=frame.timestamp)
        times.append(time.perf_counter() - t0)
        if i == 9:  # warm: skip compile frames in the sustained window
            t_wall0 = time.perf_counter()
            times_warm_start = len(times)
    warm = np.asarray(times[times_warm_start:])
    sustained = len(warm) / warm.sum()
    # worst 1-second window: max over sliding sums of frame times
    worst = None
    acc, j = 0.0, 0
    counts = []
    for k in range(len(warm)):
        acc += warm[k]
        while acc > 1.0 and j <= k:
            acc -= warm[j]
            j += 1
        counts.append(k - j + 1)
    worst = min(counts[len(counts) // 4:]) if counts else 0
    pub_line = ""
    if pub is not None:
        pub_line = (f"  published {pub.published}  degraded "
                    f"{pub.degraded_cycles}  eff_int "
                    f"{pub.effective_interval:.2f}s  last_export "
                    f"{pub.last_export_s:.2f}s")
    recon.close()
    print(f"{label:24s} sustained {sustained:6.1f} fps  "
          f"worst-1s {worst:3d} fps{pub_line}", flush=True)


run(0.0, 1, "publisher OFF")
run(1.0, 1, "1 Hz color full-res")
run(1.0, 2, "1 Hz color decimate-2")
run(0.2, 1, "0.2 Hz color full-res")
