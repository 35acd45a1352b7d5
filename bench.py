#!/usr/bin/env python
"""Benchmark: full gen-2 VHS-EP chain, 480i fields/sec on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline = TPU fields/sec divided by the single-thread scalar C++
baseline's fields/sec on this host (cvsim_tpu/native/scalar_baseline.cpp —
the reference's per-field cost class, since the FFmpeg-3.x reference cannot
be built here; see BASELINE.md). Details go to stderr.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))

W, LINES = 704, 240          # 480i field
BATCH = 256                  # fields per device call (~4.3s of video)
REPS = 5


def baseline_fields_per_sec() -> float:
    src = os.path.join(REPO, "cvsim_tpu", "native", "scalar_baseline.cpp")
    exe = os.path.join(REPO, ".bench_scalar_baseline")
    if not os.path.exists(exe) or os.path.getmtime(exe) < os.path.getmtime(src):
        subprocess.run(["g++", "-O2", "-o", exe, src], check=True)
    # Median of 3 runs: single-run host CPU timing wobbles ~10%, which
    # showed up as vs_baseline noise across rounds.
    runs = []
    for _ in range(3):
        out = subprocess.run([exe, "60", str(W), str(LINES)],
                             capture_output=True, text=True, check=True)
        runs.append(float(json.loads(out.stdout.strip())["fields_per_sec"]))
    fps = sorted(runs)[1]
    print(f"[bench] scalar C++ baseline: {fps:.1f} fields/s "
          f"({fps/59.94:.2f}x realtime; runs {[round(r,1) for r in runs]})",
          file=sys.stderr)
    return fps


def tpu_fields_per_sec() -> float:
    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))

    from cvsim_tpu.config import CompositeConfig, VHSSpeed
    from cvsim_tpu.models import yiq

    dev = jax.devices()[0]
    print(f"[bench] device: {dev}", file=sys.stderr)

    cfg = CompositeConfig(
        emulating_vhs=True, vhs_tape_speed=VHSSpeed.EP,
        vhs_head_switching=True, video_noise=6, video_chroma_noise=22,
        video_chroma_phase_noise=6, video_chroma_loss=8)

    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.integers(0, 256, size=(BATCH, LINES, W, 3)), jnp.int32)
    fieldno = jnp.arange(BATCH, dtype=jnp.int32)
    parity = (jnp.arange(BATCH, dtype=jnp.int32) & 1)
    key = jax.random.PRNGKey(0)

    # Reduce the full output on-device to a scalar: forces every output
    # element to be computed (no dead-code elimination) while keeping D2H to
    # 4 bytes — this dev environment tunnels the TPU, so bulk D2H bandwidth
    # is not representative of production hosts.
    reduce_out = jax.jit(lambda o: o.astype(jnp.int32).sum())
    keys = jax.random.split(key, 16)

    def run_one(k):
        out = yiq.composite_layer_rgb_auto(rgb, fieldno, parity, keys[k],
                                           cfg=cfg)
        return reduce_out(out)

    t0 = time.time()
    int(run_one(0))
    print(f"[bench] compile+first run: {time.time()-t0:.1f}s", file=sys.stderr)

    # sustained throughput: K batches dispatched back-to-back (async) so the
    # per-call RPC latency pipelines away, as in the streaming pipelines
    K = 8
    best = float("inf")
    for r in range(REPS):
        t0 = time.time()
        sums = [run_one(k % 16) for k in range(K)]
        _ = [int(s) for s in sums]
        dt = time.time() - t0
        best = min(best, dt)
        print(f"[bench] rep {r}: {dt*1e3:.1f}ms for {K} batches -> "
              f"{K*BATCH/dt:.1f} fields/s sustained", file=sys.stderr)
    return K * BATCH / best


def main():
    base_fps = baseline_fields_per_sec()
    tpu_fps = tpu_fields_per_sec()
    rt = tpu_fps / 59.94
    print(f"[bench] TPU: {tpu_fps:.1f} fields/s = {rt:.1f}x realtime; "
          f"speedup vs scalar baseline: {tpu_fps/base_fps:.1f}x", file=sys.stderr)
    print(json.dumps({
        "metric": "480i_fields_per_sec_full_vhs_ep_chain_1chip",
        "value": round(tpu_fps, 2),
        "unit": "fields/s",
        "vs_baseline": round(tpu_fps / base_fps, 2),
    }))


if __name__ == "__main__":
    main()
