"""Texture sampling: point or bilinear, wrapped UVs, gamma-2 decode.

Behavioral parity with `Texture::getPixel`
(`/root/reference/DustRayTracer/src/Core/Scene/Texture.cu:33-58`): repeat
wrapping via u - floor(u), nearest texel, RGB in [0,1] squared as the
approximate sRGB->linear decode. The texture *stack* (T, H, W, 4) u8 with
per-texture true dims replaces the reference's per-texture managed
buffers so one gather shape serves every material under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _wrap(x):
    return x - jnp.floor(x)


def packed_texels(scene):
    """(T*H*W,) u32 view of the u8 RGBA stack — one 32-bit word per
    texel. A texel lookup becomes ONE 1-D gather + VPU byte unpack
    instead of a 4-D gather of byte slices: measured 413 vs 94
    Mlookup/s on v5e (tools/bench_texture_fetch.py, round 4)."""
    return jax.lax.bitcast_convert_type(
        scene.tex_stack, jnp.uint32).reshape(-1)


def sample_texture(scene, tex_idx, uv, bilinear: bool = False):
    """Sample albedo RGB (linearized). tex_idx: (...,) i32 (>= 0); uv (..., 2).

    Out-of-stack rows from padded textures never get sampled because
    `tex_idx` is clamped by callers to valid entries.
    """
    safe = jnp.maximum(tex_idx, 0)
    hw = scene.tex_hw[safe]
    h = hw[..., 0].astype(jnp.float32)
    w = hw[..., 1].astype(jnp.float32)
    fu = _wrap(uv[..., 0]) * w
    fv = _wrap(uv[..., 1]) * h

    is_u8 = scene.tex_stack.dtype == jnp.uint8
    if is_u8:
        flat = packed_texels(scene)
        hs, ws = scene.tex_stack.shape[1], scene.tex_stack.shape[2]

    def fetch(xi, yi):
        xi = jnp.clip(xi, 0, hw[..., 1] - 1)
        yi = jnp.clip(yi, 0, hw[..., 0] - 1)
        if is_u8:
            word = flat[(safe * hs + yi) * ws + xi]
            rgb = jnp.stack(
                [(word & 0xFF).astype(jnp.float32),
                 ((word >> 8) & 0xFF).astype(jnp.float32),
                 ((word >> 16) & 0xFF).astype(jnp.float32)],
                axis=-1) / 255.0
            return rgb * rgb  # gamma-2 decode (Texture.cu:56)
        # float stacks store LINEAR texel values (the learnable-texture
        # path for inverse rendering) — no decode; gathers keep the
        # texel-gradient scatter path intact
        return scene.tex_stack[safe, yi, xi, :3]

    if not bilinear:
        return fetch(fu.astype(jnp.int32), fv.astype(jnp.int32))

    x0 = jnp.floor(fu - 0.5)
    y0 = jnp.floor(fv - 0.5)
    tx = (fu - 0.5 - x0)[..., None]
    ty = (fv - 0.5 - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    c00 = fetch(x0i, y0i)
    c10 = fetch(x0i + 1, y0i)
    c01 = fetch(x0i, y0i + 1)
    c11 = fetch(x0i + 1, y0i + 1)
    top = c00 * (1 - tx) + c10 * tx
    bot = c01 * (1 - tx) + c11 * tx
    return top * (1 - ty) + bot * ty


def decode_textures(scene):
    """Convert the uint8 texture stack to a LINEAR float32 stack.

    Float stacks are sampled without the gamma-2 decode, making every
    texel a differentiable parameter — the learnable-texture path for
    inverse rendering (BASELINE config 5: texture gradients). The render
    is value-identical to the uint8 path."""
    import jax.numpy as jnp

    u8 = scene.tex_stack
    if u8.dtype != jnp.uint8:
        return scene
    f = u8.astype(jnp.float32) / 255.0
    rgb = f[..., :3] ** 2  # match the u8 path's gamma-2 decode
    alpha = f[..., 3:4]
    return scene.replace(tex_stack=jnp.concatenate([rgb, alpha], axis=-1))
