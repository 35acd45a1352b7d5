"""Process-wide compiled-program cache.

Pipelines are constructed per command, but a resident `cvsim serve`
process runs many commands; without this cache every warm daemon command
re-lowered and re-compiled its batch program (a fresh ~7-14 s remote
compile per invocation on tunneled backends — the very cost the daemon
exists to amortize). Programs are pure functions of the frozen RunConfig
plus static geometry, so caching on those keys is sound: equal keys
produce identical jaxprs.

The persistent XLA disk cache cannot serve this role on axon-tunneled
hosts (deserialized executables take a pathological first-execution
path; docs/STATUS.md round-3 stall diagnosis) — this in-memory handle
cache reuses the *loaded server-side program*, which is exactly the fast
path.
"""

from __future__ import annotations

_CACHE: dict = {}


def get_or_build(key, build):
    prog = _CACHE.get(key)
    if prog is None:
        prog = build()
        _CACHE[key] = prog
    return prog


def clear():
    _CACHE.clear()
