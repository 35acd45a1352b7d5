"""Serialized-executable cache (host/execache.py, VERDICT r4 #6).

A cold process must be able to load the engines' AOT-compiled GOP
programs from disk instead of re-paying the XLA compile (the HD
single-tile program costs ~4 min per process on real TPU hosts). The
cache is scoped to single-device processes — deserialized portable
executables reject unsharded args under a multi-device client — so the
functional tests run in a 1-device CPU subprocess (this suite's conftest
forces an 8-device mesh).
"""

import os
import subprocess
import sys
import textwrap

import pytest

from cvsim_tpu.host import execache

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_single_device(body: str, cache_dir: str, tmp: str) -> str:
    """Run `body` in a fresh 1-device CPU process with the cache at
    cache_dir; returns stdout. Asserts inside `body` surface as rc != 0."""
    script = textwrap.dedent("""
        import sys
        sys.path.insert(0, %r)
        import jax
        jax.config.update("jax_platforms", "cpu")
        assert jax.device_count() == 1
        import jax.numpy as jnp
        from cvsim_tpu.host import execache
        TMP = %r
    """) % (REPO, tmp) + textwrap.dedent(body)
    env = dict(os.environ, CVSIM_EXEC_CACHE=cache_dir)
    env.pop("XLA_FLAGS", None)
    r = subprocess.run([sys.executable, "-c", script], env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-3000:]
    return r.stdout


def test_policy(monkeypatch):
    monkeypatch.setenv("CVSIM_EXEC_CACHE", "0")
    assert execache.cache_dir() is None
    monkeypatch.setenv("CVSIM_EXEC_CACHE", "/x/y")
    assert execache.cache_dir() == "/x/y"
    monkeypatch.delenv("CVSIM_EXEC_CACHE")
    # axon poison guard (round-3 stall): default OFF on the tunneled backend
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    assert execache.cache_dir() is None
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert execache.cache_dir() is not None


def test_multi_device_client_bypasses_cache(tmp_path, monkeypatch):
    """Under this suite's 8-device CPU mesh the cache must stand aside
    (fresh compile, nothing written) rather than produce executables that
    reject unsharded args."""
    import jax
    import jax.numpy as jnp

    assert jax.device_count() > 1
    monkeypatch.setenv("CVSIM_EXEC_CACHE", str(tmp_path))
    lowered = jax.jit(lambda x: (x * 3 + 1).sum()).lower(
        jax.ShapeDtypeStruct((8, 8), jnp.float32))
    compiled = execache.get_or_compile(("unit", "multidev"), lowered)
    x = jnp.arange(64, dtype=jnp.float32).reshape(8, 8)
    assert float(compiled(x)) == 6112.0
    assert not os.listdir(tmp_path)


def test_hit_skips_compile_and_matches(tmp_path):
    out = _run_single_device("""
        class Poisoned:
            def compile(self):
                raise AssertionError("cache miss: compile() was called")

        def tiny():
            f = jax.jit(lambda x: (x * 3 + 1).sum())
            return f.lower(jax.ShapeDtypeStruct((8, 8), jnp.float32))

        x = jnp.arange(64, dtype=jnp.float32).reshape(8, 8)
        compiled = execache.get_or_compile(("unit", "tiny", 1), tiny())
        want = float(compiled(x))
        loaded = execache.get_or_compile(("unit", "tiny", 1), Poisoned())
        assert float(loaded(x)) == want, (float(loaded(x)), want)
        try:
            execache.get_or_compile(("unit", "tiny", 2), Poisoned())
            raise SystemExit("different key unexpectedly hit")
        except AssertionError:
            pass
        # corrupt entry falls back to a fresh compile
        import os
        (entry,) = [e for e in os.listdir(execache.cache_dir())]
        with open(os.path.join(execache.cache_dir(), entry), "wb") as f:
            f.write(b"not a pickle")
        c2 = execache.get_or_compile(("unit", "tiny", 1), tiny())
        assert float(c2(x)) == want
        print("OK", want)
    """, str(tmp_path / "cache"), str(tmp_path))
    assert "OK" in out
    assert os.listdir(tmp_path / "cache")


def test_pipeline_output_identical_through_cache(tmp_path):
    """The gen-2 engine's GOP program, fresh-compiled then cache-loaded in
    a second cold process: outputs must be byte-identical."""
    body = """
        import numpy as np
        from cvsim_tpu.host import progcache, y4m
        from cvsim_tpu.host.pipeline_yiq import YIQPipeline
        from cvsim_tpu.presets import parse_composite_flags
        import os

        src = os.path.join(TMP, "in.y4m")
        if not os.path.exists(src):
            from fractions import Fraction
            rng = np.random.default_rng(0)
            hdr = y4m.Y4MHeader(width=128, height=96,
                                fps=Fraction(30000, 1001))
            with open(src, "wb") as f:
                wr = y4m.Y4MWriter(f, hdr)
                for k in range(4):
                    wr.write(rng.integers(16, 236, (96, 128)).astype(np.uint8),
                             rng.integers(16, 241, (48, 64)).astype(np.uint8),
                             rng.integers(16, 241, (48, 64)).astype(np.uint8))
        st = parse_composite_flags(["-width", "128", "-seed", "2"], gen2=True)
        cfg = st.to_run_config(gen1=False)
        pipe = YIQPipeline(cfg, gop=4, progress=False)
        out = os.path.join(TMP, OUT_NAME)
        with open(src, "rb") as fin, open(out, "wb") as fout:
            pipe.run_video([y4m.Y4MReader(fin)], fout)
        print("wrote", out)
    """
    body = textwrap.dedent(body)
    cache = str(tmp_path / "cache")
    _run_single_device("OUT_NAME = 'a.y4m'\n" + body, cache, str(tmp_path))
    assert os.listdir(cache)
    _run_single_device("OUT_NAME = 'b.y4m'\n" + body, cache, str(tmp_path))
    a = (tmp_path / "a.y4m").read_bytes()
    b = (tmp_path / "b.y4m").read_bytes()
    assert a and a == b
