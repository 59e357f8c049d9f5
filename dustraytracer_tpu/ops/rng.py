"""Counter-based PCG RNG + rejection-free samplers, vectorized in uint32.

The reference uses a scalar PCG hash advanced through a mutable seed
(`/root/reference/DustRayTracer/src/Core/CudaMath/Random.cu:6-17`) and
*rejection-sampled* ball/disk draws (loop-until-inside). Rejection loops
are hostile to a SIMD machine with static control flow, so the samplers
here are closed-form (Archimedes cylinder projection for the sphere,
radius-cbrt scaling for the ball, sqrt for the disk) — identical
distributions, zero divergence.

The reference also has a seed-correlation bug (`RayGen.cuh:74-75`:
`seed = (x + y*w) * frameidx`, so frame 0 zeroes every seed and rows
correlate). We decorrelate by hashing pixel index and frame index through
two PCG rounds.

State is an explicit (N,) uint32 array threaded functionally — same
stream semantics as the reference's `uint32_t& seed`, but jit/vmap/shard
safe.
"""

from __future__ import annotations

import jax.numpy as jnp

_UINT_MAX = 0xFFFFFFFF  # python int: module-level jnp arrays become hoisted
# constants that the jit fastpath mishandles (buffer-count crashes)


def pcg_hash(x):
    """PCG output permutation (`Random.cu:6-11` semantics)."""
    x = jnp.asarray(x, jnp.uint32)
    state = x * jnp.uint32(747796405) + jnp.uint32(2891336453)
    word = ((state >> ((state >> jnp.uint32(28)) + jnp.uint32(4))) ^ state) \
        * jnp.uint32(277803737)
    return (word >> jnp.uint32(22)) ^ word


def seed_pixels(pixel_idx, frame_idx):
    """Decorrelated per-pixel stream heads (fixes `RayGen.cuh:74-75`)."""
    p = jnp.asarray(pixel_idx, jnp.uint32)
    f = jnp.asarray(frame_idx, jnp.uint32)
    return pcg_hash(p ^ (pcg_hash(f) + jnp.uint32(0x9E3779B9)))


def random_float(state):
    """Advance the stream; return (new_state, uniform [0,1))."""
    state = pcg_hash(state)
    u = state.astype(jnp.float32) / 4294967296.0
    return state, u


def random_unit_vec3(state):
    """Uniform direction on the unit sphere (same distribution as the
    reference's normalized rejection sample, `Random.cu:33-44`)."""
    state, u1 = random_float(state)
    state, u2 = random_float(state)
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = (2.0 * jnp.pi) * u2
    vec = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
    return state, vec


def random_in_ball(state):
    """Uniform point in the unit ball (the reference's unnormalized
    rejection sample, used for the diffuse bounce `RayGen.cuh:133-134`)."""
    state, sphere = random_unit_vec3(state)
    state, u = random_float(state)
    radius = jnp.cbrt(jnp.maximum(u, 1e-12))
    return state, sphere * radius[..., None]


def random_in_disk(state):
    """Uniform point in the unit disk (defocus sampling,
    `Camera.cu:108-115`)."""
    state, u1 = random_float(state)
    state, u2 = random_float(state)
    r = jnp.sqrt(u1)
    phi = (2.0 * jnp.pi) * u2
    return state, jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)
