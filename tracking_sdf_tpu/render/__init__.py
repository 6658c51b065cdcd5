from tracking_sdf_tpu.render.raycast import raycast, RenderResult
from tracking_sdf_tpu.render.marching_cubes import marching_cubes, export_ply
