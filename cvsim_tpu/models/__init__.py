from cvsim_tpu.models import yiq
from cvsim_tpu.models import yuv422
from cvsim_tpu.models import tools
from cvsim_tpu.models import restore
from cvsim_tpu.models import raw28

__all__ = ["yiq", "yuv422", "tools", "restore", "raw28"]
