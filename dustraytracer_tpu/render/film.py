"""Progressive accumulation film — explicit, resumable render state.

The reference keeps a device float3 accumulation buffer plus a frame
index, computing a running mean each frame and resetting on any camera or
setting change (`/root/reference/DustRayTracer/src/Core/Renderer.cu:
80-136`, `RenderKernel.cu:29-31`). Here that state is an explicit pytree
threaded through a pure update — trivially checkpointable (orbax/numpy),
shardable over pixel tiles, and donate-able under jit.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from dustraytracer_tpu.render.integrator import render_sample
from dustraytracer_tpu.scene.settings import LightParams, RenderSettings


@jax.tree_util.register_dataclass
@dataclass
class Film:
    accum: jax.Array  # (H, W, 3) f32 running sum of post-processed samples
    frame: jax.Array  # () i32 number of accumulated samples

    def replace(self, **kw) -> "Film":
        return dataclasses.replace(self, **kw)


def film_init(width: int, height: int) -> Film:
    """Fresh accumulation state (`Renderer::resetAccumulationBuffer`,
    `Renderer.cu:132-136`)."""
    return Film(accum=jnp.zeros((height, width, 3), jnp.float32),
                frame=jnp.int32(0))


def film_add(film: Film, sample: jax.Array) -> Film:
    return Film(accum=film.accum + sample, frame=film.frame + 1)


def film_image(film: Film) -> jax.Array:
    """Running mean (`RenderKernel.cu:29-31`)."""
    return film.accum / jnp.maximum(film.frame, 1).astype(jnp.float32)


def render_progressive(scene, camera, settings: RenderSettings, *,
                       width: int, height: int, spp: int,
                       lights: LightParams | None = None,
                       film: Film | None = None) -> Film:
    """Accumulate `spp` samples (respecting `settings.max_samples`, the
    reference's sample-cap gate `Renderer.cu:82`). Host loop over a jitted
    per-sample step so progress is observable and interruptible."""
    lights = lights or LightParams.from_settings(settings)
    film = film or film_init(width, height)
    start = int(film.frame)
    for s in range(start, min(start + spp, settings.max_samples)):
        sample = render_sample(scene, camera, lights, jnp.uint32(s),
                               width=width, height=height, settings=settings)
        film = film_add(film, sample)
    return film
