from cvsim_tpu.host import y4m, wavio, timing, fieldops

__all__ = ["y4m", "wavio", "timing", "fieldops"]
