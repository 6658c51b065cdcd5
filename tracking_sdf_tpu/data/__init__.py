from tracking_sdf_tpu.data.synthetic import (
    SphereScene,
    CuboidScene,
    grid_from_scene,
    render_scene_depth,
    orbit_poses,
    look_at,
)
