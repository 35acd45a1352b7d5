from cvsim_tpu.models import yiq
from cvsim_tpu.models import yuv422

__all__ = ["yiq", "yuv422"]
