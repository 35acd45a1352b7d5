from cvsim_tpu.utils.log import get_logger, Progress, profile_trace

__all__ = ["get_logger", "Progress", "profile_trace"]
