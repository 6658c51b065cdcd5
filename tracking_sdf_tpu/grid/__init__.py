from tracking_sdf_tpu.grid.grid import (
    TSDFGrid,
    empty_grid,
    world_to_voxel,
    voxel_to_world,
    voxel_centers_world,
)
from tracking_sdf_tpu.grid.interp import (
    trilinear,
    trilinear_with_grad,
    shepard_l1,
    interp_color,
)
