"""Model engines. Submodules import lazily (PEP 562): the device engines
(yiq/yuv422/raw28/fused twins) pull in jax, and the host-numpy sibling
tools must be importable without paying that (~2 s per one-shot CLI
process; see cli/tools.py)."""

import importlib

__all__ = ["yiq", "yuv422", "tools", "tools_np", "restore", "raw28"]


def __getattr__(name):
    if name in __all__:
        return importlib.import_module(f"cvsim_tpu.models.{name}")
    raise AttributeError(f"module 'cvsim_tpu.models' has no attribute {name!r}")
