"""Micro-bench: texture-stack gather formulations on the real TPU.

cs16 (23 textures) measured 13.5 ms per material+texture fetch site
(results/profile_cs16_dust_512_b2.json) — the per-lane gather from the
(T, H, W, 4) u8 stack is the suspect. TPU has no hardware gather; XLA
lowers each gather differently depending on shape, so this sweeps the
candidate formulations on identical data:

  a) status quo: stack[safe, yi, xi, :3]   (4-D gather, 3-byte slice)
  b) flat u32:  packed[(safe*H + yi)*W + xi] where packed is one u32
     per texel (RGBA bytes) — ONE 1-D gather + VPU unpack
  c) flat f32x3: three 1-D gathers from channel-planar f32 tables
  d) one-hot row+col matmuls per texture (MXU, O(N*(H+W)) — only to
     show where the crossover would be)

Usage: python tools/bench_texture_fetch.py [n_lanes] [T] [H]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from dustraytracer_tpu.utils.roofline import device_seconds_per_call

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512 * 512
    t = int(sys.argv[2]) if len(sys.argv) > 2 else 23
    h = w = int(sys.argv[3]) if len(sys.argv) > 3 else 512

    rng = np.random.default_rng(0)
    stack = jnp.asarray(rng.integers(0, 255, (t, h, w, 4), np.uint8))
    tex = jnp.asarray(rng.integers(0, t, (n,), np.int32))
    yi = jnp.asarray(rng.integers(0, h, (n,), np.int32))
    xi = jnp.asarray(rng.integers(0, w, (n,), np.int32))

    packed = jnp.asarray(
        np.ascontiguousarray(np.asarray(stack)).view(np.uint32)
        .reshape(-1))  # (T*H*W,) u32, RGBA little-endian
    planar = (stack.astype(jnp.float32) / 255.0).transpose(3, 0, 1, 2) \
        .reshape(4, -1)  # (4, T*H*W) f32

    def a_status_quo(i):
        rgb = stack[tex, yi, xi + i * 0, :3].astype(jnp.float32) / 255.0
        return jnp.sum(rgb * rgb)

    def b_flat_u32(i):
        idx = (tex * h + yi) * w + xi + i * 0
        word = packed[idx]
        r = (word & 0xFF).astype(jnp.float32) / 255.0
        g = ((word >> 8) & 0xFF).astype(jnp.float32) / 255.0
        bl = ((word >> 16) & 0xFF).astype(jnp.float32) / 255.0
        return jnp.sum(r * r + g * g + bl * bl)

    def c_flat_f32(i):
        idx = (tex * h + yi) * w + xi + i * 0
        r, g, bl = planar[0, idx], planar[1, idx], planar[2, idx]
        return jnp.sum(r * r + g * g + bl * bl)

    for name, fn in (("a 4D u8 gather (status quo)", a_status_quo),
                     ("b flat u32 gather + unpack", b_flat_u32),
                     ("c flat f32 planar gathers", c_flat_f32)):
        try:
            dt = device_seconds_per_call(fn, n_lo=1, n_hi=5, repeats=3)
            print(f"{name:32s}: {dt*1e3:8.3f} ms "
                  f"({n/max(dt,1e-9)/1e6:.1f} Mlookup/s)", flush=True)
        except Exception as e:
            print(f"{name:32s}: failed {e}", flush=True)


if __name__ == "__main__":
    main()
