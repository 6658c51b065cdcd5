from tracking_sdf_tpu.fusion.fuse import fuse_frame, weighting, make_fuse_fn
