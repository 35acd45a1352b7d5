import time
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from cvsim_tpu.config import CompositeConfig, VHSSpeed
from cvsim_tpu.models.fused_yuv import composite_video_process_fused

cfg = CompositeConfig(emulating_vhs=True, vhs_tape_speed=VHSSpeed.EP,
                      vhs_head_switching=True, video_noise=6,
                      video_chroma_noise=22, video_chroma_phase_noise=6,
                      video_chroma_loss=8, chroma_phase_noise_gen1_bug=True)
rng = np.random.default_rng(1)
B = 64
y = jnp.asarray(rng.integers(16, 236, (B, 540, 1920)), jnp.int32)
u = jnp.asarray(rng.integers(16, 241, (B, 540, 960)), jnp.int32)
v = jnp.asarray(rng.integers(16, 241, (B, 540, 960)), jnp.int32)
fn = jnp.arange(B, dtype=jnp.int32); par = fn & 1
key = jax.random.PRNGKey(9)
f = jax.jit(lambda *a: composite_video_process_fused(*a, cfg=cfg))
t0=time.time(); o = f(y, u, v, fn, par, key)
s=[np.asarray(p).sum() for p in o]
print("gen1 HD compile+run %.1fs sums" % (time.time()-t0), s)
for _ in range(3):
    t0=time.time(); o = f(y, u, v, fn, par, key)
    for p in o: p.block_until_ready()
    print("gen-1 1080i fused: %.1f fields/s" % (B/(time.time()-t0)))
