"""Paced, arrival-driven replay: the reference's live-sensor semantics.

The reference tracker is driven by sensor arrival with a QUEUE-SIZE-1
subscription (sdf_reconstruction.cpp:89: `nh.subscribe(..., 1,
kinect_callback)`): frames arrive at the sensor rate regardless of
processing speed, and when the callback is still busy every frame but the
newest is DROPPED — the tracker must then bridge the larger inter-frame
motion. The offline runner pulls an iterator at its own pace, which hides
that failure mode; `RealtimePacer` restores it for any indexable dataset.

Semantics: the first ``warmup`` frames (default 2) are delivered un-paced
and exempt from dropping — they carry the jit compiles, like a live
system warming its pipeline before the sensor starts. The arrival clock
then starts with the next frame "arriving now": frame i arrives at wall
time (i - warmup)/hz after that. Each pull yields the NEWEST arrived
frame, counting every older unconsumed frame as dropped (stale); if the
consumer is ahead of the sensor it blocks until the next arrival, exactly
like a callback waiting for data.
"""
from __future__ import annotations

import time


class RealtimePacer:
    """Wrap an indexable dataset in queue-size-1 paced-arrival semantics.

    Attributes after (or during) iteration:
      dropped  — frames skipped because a newer one had already arrived
      yielded  — frames actually delivered
    """

    def __init__(self, dataset, hz: float = 30.0, warmup: int = 2):
        if hz <= 0:
            raise ValueError(f"hz must be positive, got {hz}")
        self._ds = dataset
        self._hz = float(hz)
        # frames delivered un-paced before the arrival clock starts: the
        # first TWO frames' processing carries the jit compiles (fusion
        # on frame 1, tracking on frame 2 — tens of seconds each through
        # a remote compile helper), which would otherwise expire the
        # whole stream before steady state is ever measured — a live
        # system warms its pipeline before the sensor starts
        self._warmup = max(int(warmup), 0)
        self.dropped = 0
        self.yielded = 0
        # forwarded so --eval keeps working on the wrapped dataset
        self.groundtruth = getattr(dataset, "groundtruth", None)

    def __len__(self):
        return len(self._ds)

    def __iter__(self):
        n = len(self._ds)
        i = 0  # next unconsumed frame index
        while i < min(self._warmup, n):
            self.yielded += 1
            yield self._ds[i]
            i += 1
        t0 = time.perf_counter() - i / self._hz  # frame i arrives NOW
        while i < n:
            elapsed = time.perf_counter() - t0
            latest = min(int(elapsed * self._hz), n - 1)
            if latest < i:
                # consumer ahead of the sensor: block until frame i arrives
                time.sleep(max(i / self._hz - elapsed, 0.0))
                latest = i
            self.dropped += latest - i
            self.yielded += 1
            yield self._ds[latest]
            i = latest + 1
