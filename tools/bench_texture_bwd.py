"""Texture-gradient backward on the real TPU: scatter VJP vs the
one-hot matmul transpose (render/texture.py::_float_fetch, round 5).

Times ONE fetch-site backward at frame scale (U = 512x512 fetch events,
cs16-like id distribution) for each mode, plus the forward for scale.
The r4 profile measured the scatter at 1374.8 ms/sample on cs16
(results/profile_cs16_dust_512_b2.json "texture fetch bwd (stack)").

Usage: python tools/bench_texture_bwd.py [scene.glb] [U]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from dustraytracer_tpu.render.texture import _float_fetch, decode_textures
    from dustraytracer_tpu.scene import load_scene
    from dustraytracer_tpu.utils.roofline import device_seconds_per_call

    path = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/models/source/cs16_dust.glb"
    u = int(sys.argv[2]) if len(sys.argv) > 2 else 512 * 512

    scene = decode_textures(load_scene(path))
    T, H, W, _ = scene.tex_stack.shape
    print(f"{os.path.basename(path)}: stack {scene.tex_stack.shape} "
          f"({T*H*W/1e6:.2f}M texels), U={u}", flush=True)

    rng = np.random.default_rng(0)
    # id distribution ~ real hits: texture ids weighted by triangle count
    mats = np.asarray(scene.tri_mat)[:scene.n_tris]
    tex_of_mat = np.asarray(scene.mat_albedo_tex)
    tex_pool = tex_of_mat[mats]
    tex_pool = tex_pool[tex_pool >= 0]
    t_ids = jnp.asarray(rng.choice(tex_pool, u).astype(np.int32))
    hw = np.asarray(scene.tex_hw)
    th = hw[np.asarray(t_ids), 0]
    tw = hw[np.asarray(t_ids), 1]
    y_ids = jnp.asarray((rng.uniform(0, 1, u) * th).astype(np.int32))
    x_ids = jnp.asarray((rng.uniform(0, 1, u) * tw).astype(np.int32))
    cot = jnp.asarray(rng.normal(size=(u, 3)).astype(np.float32))

    out = {"scene": os.path.basename(path), "stack": list(scene.tex_stack.shape),
           "U": u, "device": jax.devices()[0].device_kind}

    def loss(mode, stack, eps):
        # eps-perturbation defeats XLA CSE across in-graph repeats
        r = _float_fetch(mode, stack.shape, stack.dtype)(
            stack * (1.0 + eps * 1e-9), t_ids, y_ids, x_ids)
        return jnp.sum(r * cot)

    fwd = device_seconds_per_call(
        lambda i: loss("auto", scene.tex_stack, jnp.float32(i)))
    out["fwd_ms"] = round(fwd * 1e3, 3)
    print(f"  forward fetch: {out['fwd_ms']} ms", flush=True)

    for mode in ("matmul", "scatter"):
        g = jax.grad(lambda s, i: loss(mode, s, i))
        lo, hi = (2, 8) if mode == "matmul" else (1, 3)
        sec = device_seconds_per_call(
            lambda i: jnp.sum(g(scene.tex_stack, jnp.float32(i))),
            n_lo=lo, n_hi=hi)
        out[f"bwd_{mode}_ms"] = round(sec * 1e3, 3)
        print(f"  backward ({mode}): {out[f'bwd_{mode}_ms']} ms", flush=True)

    # grads agree across engines at frame scale
    gm = jax.jit(jax.grad(lambda s: loss("matmul", s, jnp.float32(0))))(
        scene.tex_stack)
    gs = jax.jit(jax.grad(lambda s: loss("scatter", s, jnp.float32(0))))(
        scene.tex_stack)
    gm, gs = np.asarray(gm), np.asarray(gs)
    scale = np.abs(gs).max()
    out["max_abs_diff_rel"] = float(np.abs(gm - gs).max() / max(scale, 1e-30))
    print(f"  max |matmul-scatter| / max|g|: {out['max_abs_diff_rel']:.3e}",
          flush=True)

    os.makedirs("results", exist_ok=True)
    with open("results/tex_bwd_bench.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
