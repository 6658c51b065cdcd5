from tracking_sdf_tpu.pipeline.trajectory import (
    Trajectory,
    TrajectoryWriter,
    read_trajectory,
    associate,
    align_umeyama,
    ate_rmse,
    rpe_rmse,
)
from tracking_sdf_tpu.pipeline.realtime import (
    MultihostRealtimePacer,
    RealtimePacer,
)
from tracking_sdf_tpu.pipeline.runner import (
    Reconstruction,
    FrameStats,
    REFERENCE_INITIAL_POSE,
)

__all__ = [
    "Trajectory",
    "TrajectoryWriter",
    "read_trajectory",
    "associate",
    "align_umeyama",
    "ate_rmse",
    "rpe_rmse",
    "MultihostRealtimePacer",
    "RealtimePacer",
    "Reconstruction",
    "FrameStats",
    "REFERENCE_INITIAL_POSE",
]
