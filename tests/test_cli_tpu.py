"""Hardware-gated CLI test: the fused Pallas path through the REAL tool.

Round-1 weak spot: CI runs the CLI on CPU only, so the auto-dispatched
fused kernels were exercised in-product only by manual checksum runs. This
test spawns the CLI in a subprocess WITHOUT the conftest CPU pin (so it
sees whatever accelerator the environment has) and demands the fused
(default) and XLA (CVSIM_FUSED=0) paths produce byte-identical output.

Skipped when no TPU is attached (the two paths then coincide trivially) —
run on a TPU host to validate the product path on hardware:
    python -m pytest tests/test_cli_tpu.py -q
"""

import os
import subprocess
import sys

import pytest

from tests.test_cli import make_clip, read_all, W


def _tpu_available() -> bool:
    probe = subprocess.run(
        [sys.executable, "-c",
         "import jax; print(jax.default_backend())"],
        capture_output=True, text=True, timeout=600,
        env={k: v for k, v in os.environ.items()
             if k not in ("JAX_PLATFORMS",)} | {"JAX_PLATFORMS": ""})
    return probe.returncode == 0 and "tpu" in probe.stdout


@pytest.mark.skipif("CVSIM_TPU_TESTS" not in os.environ,
                    reason="set CVSIM_TPU_TESTS=1 on a TPU host (slow: "
                           "first Pallas compile is minutes on dev tunnels)")
def test_cli_fused_equals_xla_on_hardware(tmp_path):
    if not _tpu_available():
        pytest.skip("no TPU backend available")
    src = make_clip(str(tmp_path / "in.y4m"))
    outs = {}
    for tag, fused in (("fused", "1"), ("xla", "0")):
        out = str(tmp_path / f"{tag}.y4m")
        env = dict(os.environ, CVSIM_FUSED=fused)
        env.pop("JAX_PLATFORMS", None)
        r = subprocess.run(
            [sys.executable, "-m", "cvsim_tpu", "to-composite",
             "-i", src, "-o", out, "-width", str(W),
             "-vhs", "-vhs-speed", "ep", "-seed", "3"],
            env=env, capture_output=True, text=True, timeout=1200,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        assert r.returncode == 0, r.stderr[-2000:]
        outs[tag] = open(out, "rb").read()
    assert outs["fused"] == outs["xla"]
    assert len(read_all(str(tmp_path / "fused.y4m"))[1]) == 8


@pytest.mark.skipif("CVSIM_TPU_TESTS" not in os.environ,
                    reason="set CVSIM_TPU_TESTS=1 on a TPU host")
def test_line_sharded_kernels_native_on_hardware():
    """The line-sharded fused kernels (row_ref SMEM operand, nonzero
    global-row offsets, forced tiled mode) compiled NATIVELY on the real
    chip: the sequential one-device emulation of the sharded program —
    same shard bodies as run_sharded_chain_fused_lines — must byte-equal
    the unsharded fused dispatch. CPU CI proves the same equality in
    interpret mode (tests/test_parallel.py); only this run proves the
    Mosaic compilation of the row-offset kernels."""
    if not _tpu_available():
        pytest.skip("no TPU backend available")
    code = """
import numpy as np, jax, jax.numpy as jnp
from cvsim_tpu.config import CompositeConfig, VHSSpeed
from cvsim_tpu.models.fused_yiq import composite_layer_rgb_fused
from cvsim_tpu.parallel.mesh import run_fused_lines_local
cfg = CompositeConfig(
    emulating_vhs=True, vhs_tape_speed=VHSSpeed.EP,
    video_noise=6, video_chroma_noise=22, video_chroma_phase_noise=6,
    video_chroma_loss=8, vhs_head_switching=True)
rng = np.random.default_rng(4)
b, l, w = 2, 64, 128
rgb = rng.integers(0, 256, size=(b, l, w, 3)).astype(np.int32)
fieldno = jnp.arange(b, dtype=jnp.int32)
parity = jnp.asarray(np.arange(b) & 1, jnp.int32)
key = jax.random.PRNGKey(11)
whole = np.asarray(composite_layer_rgb_fused(
    jnp.asarray(rgb), fieldno, parity, key, cfg=cfg))
shard = np.asarray(run_fused_lines_local(
    cfg, rgb, fieldno, parity, key, sp=4, interpret=False))
np.testing.assert_array_equal(shard, whole)
print('LINE_SHARD_NATIVE_OK')
"""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True,
        text=True, timeout=1200,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0 and "LINE_SHARD_NATIVE_OK" in r.stdout, (
        r.stdout + r.stderr[-2000:])


@pytest.mark.skipif("CVSIM_TPU_TESTS" not in os.environ,
                    reason="set CVSIM_TPU_TESTS=1 on a TPU host")
def test_cli_devices_flag_on_hardware(tmp_path):
    """-devices 1 on the real chip: the shard_map-wrapped fused chain inside
    the GOP program (the multi-chip deployment seam) must byte-equal the
    plain single-device dispatch. CPU CI proves the seam on an 8-device
    virtual mesh where the per-shard dispatch falls back to XLA; only this
    run exercises shard_map AROUND a Pallas call on hardware."""
    if not _tpu_available():
        pytest.skip("no TPU backend available")
    src = make_clip(str(tmp_path / "in.y4m"))
    outs = {}
    for tag, extra in (("plain", []), ("mesh1", ["-devices", "1"])):
        out = str(tmp_path / f"{tag}.y4m")
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        r = subprocess.run(
            [sys.executable, "-m", "cvsim_tpu", "to-composite",
             "-i", src, "-o", out, "-width", str(W),
             "-vhs", "-seed", "5"] + extra,
            env=env, capture_output=True, text=True, timeout=1200,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        assert r.returncode == 0, r.stderr[-2000:]
        outs[tag] = open(out, "rb").read()
    assert outs["plain"] == outs["mesh1"]
