from tracking_sdf_tpu.utils.profiling import Timer, device_timer, trace

__all__ = ["Timer", "device_timer", "trace"]
