"""Serialized-executable cache for the AOT GOP programs (VERDICT r4 #6).

The engines AOT-compile their batch programs at build time
(lower().compile(), pipeline.py/_build_gop_program and pipeline_yiq.py).
On a real TPU host the HD single-tile fused program costs a one-time
~4-minute XLA compile per process (docs/STATUS.md round-4 leads) — a
cold-start cost a deployment pays on every boot. This module caches the
COMPILED executable bytes (jax.experimental.serialize_executable) keyed on
the program identity, so a cold process deserializes in seconds instead of
recompiling.

Cache policy mirrors cli/main._enable_compile_cache's round-3 finding:
on the tunneled axon backend a deserialized executable's first execution
takes a pathological load path in the device client (measured 300-590+ s
vs ~7 s for a fresh remote compile that leaves the program resident
server-side), so the cache stays OFF there unless CVSIM_EXEC_CACHE is set
explicitly. Real local TPU/CPU hosts default ON. Entries are keyed on
(program key, jax version, backend, device kind, device count) — a
serialized executable only loads against the topology it was built for.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import sys


def _env_path():
    """CVSIM_EXEC_CACHE: unset = default policy; "0"/"" = off; "1" = on at
    the default location; any other value = on at that directory."""
    return os.environ.get("CVSIM_EXEC_CACHE")


def cache_dir() -> str | None:
    """Resolved cache directory, or None when the cache is disabled."""
    env = _env_path()
    if env is not None:
        if env in ("0", ""):
            return None
        if env != "1":
            return env
    elif "axon" in os.environ.get("JAX_PLATFORMS", ""):
        return None   # round-3 poison guard (module docstring)
    return os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "cvsim_tpu_exec")


# Bump whenever the compiled GOP programs change shape or kernels (the
# key carries config/shapes/jax-version but nothing ties it to this
# repo's code): a stale entry is bit-identical-or-gone, but would keep
# serving the OLD program's performance. r5.2 = merged single-tile
# kernel + in-kernel head switch.
CODE_VERSION = "r5.2"


def _entry_path(base: str, key_parts) -> str:
    import jax

    dev = jax.devices()[0]
    h = hashlib.sha256()
    for part in (key_parts, CODE_VERSION, jax.__version__,
                 jax.default_backend(),
                 getattr(dev, "device_kind", ""), jax.device_count()):
        h.update(repr(part).encode())
        h.update(b"\x00")
    return os.path.join(base, h.hexdigest()[:32] + ".jaxexec")


def get_or_compile(key_parts, lowered):
    """compiled executable for `lowered` (a jax.stages.Lowered), via the
    cache when enabled. Any cache failure (corrupt entry, topology change,
    serialization unsupported for this program) falls back to a fresh
    compile — the cache is an accelerator, never a correctness dependency.
    """
    base = cache_dir()
    if base is None:
        return lowered.compile()
    import jax

    if jax.device_count() != 1:
        # deserialized portable executables reject unsharded args under a
        # multi-device client ("expected args ... to have N shards");
        # single-device processes are the cold-start case that matters
        # (the HD program). Multi-chip cold-start stays a fresh compile.
        return lowered.compile()
    from jax.experimental import serialize_executable as se

    path = _entry_path(base, key_parts)
    try:
        with open(path, "rb") as f:
            payload = pickle.load(f)
        return se.deserialize_and_load(*payload)
    except (OSError, pickle.UnpicklingError, EOFError):
        pass
    except Exception as e:   # topology/version drift inside jax internals
        print(f"[execache] stale entry ignored ({type(e).__name__}: {e})",
              file=sys.stderr)
    compiled = lowered.compile()
    try:
        payload = se.serialize(compiled)
        os.makedirs(base, exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump(payload, f)
        os.replace(tmp, path)
    except Exception as e:
        print(f"[execache] serialize skipped ({type(e).__name__}: {e})",
              file=sys.stderr)
    return compiled
