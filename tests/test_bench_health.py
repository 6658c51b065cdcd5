"""Simulated-outage tests for bench.py's fast-fail health probe.

Round-4 postmortem (VERDICT r4 weak #1): a TPU-tunnel outage made bench.py
hang 25+ min with no parseable output until the driver's rc=124 kill. These
tests pin the new behavior: a dead backend yields a machine-readable
{"value": null, "error": ...} JSON line and a prompt nonzero exit.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    sys.path.insert(0, REPO)
    import bench
    return bench


def test_probe_healthy():
    bench = _load_bench()
    ok = bench.backend_health_probe(
        timeout_s=30, argv=[sys.executable, "-c", "print('HEALTH_OK')"])
    assert ok is None


def test_probe_nonzero_exit():
    bench = _load_bench()
    err = bench.backend_health_probe(
        timeout_s=30,
        argv=[sys.executable, "-c",
              "import sys; print('boom', file=sys.stderr); sys.exit(7)"])
    assert err is not None and "rc=7" in err and "boom" in err


def test_probe_timeout():
    bench = _load_bench()
    err = bench.backend_health_probe(
        timeout_s=1.0,
        argv=[sys.executable, "-c", "import time; time.sleep(30)"])
    assert err is not None and "timed out" in err


def test_probe_missing_ok_marker():
    # backend "runs" but never reaches the matmul print (e.g. axon init hang
    # killed by an inner mechanism): no HEALTH_OK -> unhealthy
    bench = _load_bench()
    err = bench.backend_health_probe(
        timeout_s=30, argv=[sys.executable, "-c", "print('hello')"])
    assert err is not None


def test_bench_main_fast_fails_with_parseable_json():
    """End-to-end: `python bench.py` with a failing probe exits rc=2 quickly
    and prints exactly one JSON line with value=null + an error field."""
    env = dict(os.environ)
    env["BENCH_HEALTH_CMD"] = "/bin/false"
    env.pop("PYTHONPATH", None)  # PYTHONPATH breaks axon plugin registration
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=90, env=env, cwd=REPO)
    assert r.returncode == 2, (r.returncode, r.stdout, r.stderr)
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, lines
    rec = json.loads(lines[0])
    assert rec["metric"] == "fused_frames_per_s_per_chip"
    assert rec["value"] is None
    assert "backend unavailable" in rec["error"]
