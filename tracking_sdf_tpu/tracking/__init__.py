from tracking_sdf_tpu.tracking.gauss_newton import (
    track_frame,
    pixel_residuals_analytic,
    pixel_residuals_central,
    normal_equations,
    strided_points,
)
from tracking_sdf_tpu.tracking.preprocess import (
    bilateral_filter,
    estimate_normals,
    preprocess_frame,
)
