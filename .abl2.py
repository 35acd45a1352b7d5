import time, dataclasses
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from cvsim_tpu.config import CompositeConfig, VHSSpeed
from cvsim_tpu.models.fused_yiq import composite_layer_rgb_fused

base = CompositeConfig(emulating_vhs=True, vhs_tape_speed=VHSSpeed.EP,
                       vhs_head_switching=True, video_noise=6,
                       video_chroma_noise=22, video_chroma_phase_noise=6,
                       video_chroma_loss=8)
rng = np.random.default_rng(1)
B = 64
rgb = jnp.asarray(rng.integers(0, 256, (B, 540, 1920, 3)), jnp.int32)
fn = jnp.arange(B, dtype=jnp.int32); par = fn & 1
key = jax.random.PRNGKey(9)

def run(tag, cfg):
    f = jax.jit(lambda r_, f_, p, k, off: composite_layer_rgb_fused(
        r_, f_ + off, p, k, cfg=cfg).astype(jnp.int32).sum())
    t0=time.time(); _ = int(np.asarray(f(rgb, fn, par, key, 0))); c=time.time()-t0
    best=0
    for r in range(1,4):
        t0=time.time(); _ = int(np.asarray(f(rgb, fn, par, key, r)))
        best=max(best, B/(time.time()-t0))
    print(f"{tag}: {best:.0f} fields/s (first {c:.0f}s)", flush=True)

run("full", base)
run("no-headswitch", dataclasses.replace(base, vhs_head_switching=False))
run("no-noise", dataclasses.replace(
    base, video_noise=0, video_chroma_noise=0, video_chroma_phase_noise=0,
    video_chroma_loss=0, vhs_head_switching=False))
