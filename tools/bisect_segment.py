"""Bisect one integrator segment on the real TPU: cumulative subgraphs.

The suzanne b=1 frame costs ~12.8 ms while its known parts (raygen,
sorted closest trace, shade fetch, NEE anyhit) sum to ~6 ms in
isolation, and the memory probe killed the one-hot-materialization
theory (results/probe_mem.log: onehot temps 3.1 MB). This tool builds
the segment INCREMENTALLY — each stage is the previous plus one more
real piece, jitted whole — so the deltas attribute the in-situ cost
with the real fusion context.

Usage: python tools/bisect_segment.py [scene.glb] [size]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from dustraytracer_tpu.ops.rng import (random_float, random_in_ball,
                                           random_unit_vec3, seed_pixels)
    from dustraytracer_tpu.render.integrator import (_albedo,
                                                     _fetch_material,
                                                     _make_tracers, _sky,
                                                     render_sample,
                                                     shade_hits)
    from dustraytracer_tpu.scene import load_scene, make_camera
    from dustraytracer_tpu.scene.camera import generate_rays
    from dustraytracer_tpu.scene.settings import LightParams, RenderSettings
    from dustraytracer_tpu.utils.roofline import delta_time_dispatch

    scene_path = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/models/suzanne_plane.glb"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    scene = load_scene(scene_path)
    from bench_scenes import CAMERAS
    rel = os.path.relpath(scene_path, "/root/reference/models")
    campos = CAMERAS.get(rel, dict(position=(0, 1.5, 5),
                                   look_at=(0, 0.5, 0), vfov_deg=45.0))
    camera = make_camera(**campos)
    settings = RenderSettings(bounces=1, enable_tonemap=False,
                              enable_gamma=False)
    lights = LightParams.from_settings(settings)
    W = H = size
    n = W * H
    ids = jnp.arange(n, dtype=jnp.int32)
    from dustraytracer_tpu.render.integrator import _resolve_fetch
    fetch = _resolve_fetch(scene, settings)
    print(f"(shading fetch: {fetch!r})", flush=True)
    tracers = _make_tracers(scene, settings)
    closest, anyhit = tracers
    sun_pos = lights.sun_position()
    sun_col = lights.sun_color * lights.sun_intensity

    def upto(stop):
        def f(frame):
            acc = jnp.float32(0.0)
            rng = seed_pixels(ids.astype(jnp.uint32), frame)
            rng, origin, direction = generate_rays(camera, W, H, rng,
                                                   pixel_ids=ids)
            acc += jnp.sum(origin) + jnp.sum(direction)
            if stop == "raygen":
                return acc
            res = closest(origin, direction)
            hit_idx = res["hit_idx"]
            acc += jnp.sum(res["t"] * (res["t"] < 1e30)) \
                + jnp.sum(hit_idx)
            if stop == "trace":
                return acc
            sh = shade_hits(scene, origin, direction, hit_idx, fetch)
            acc += sum(jnp.sum(v.astype(jnp.float32))
                       for v in sh.values())
            if stop == "shade_hits":
                return acc
            matd = _fetch_material(scene, sh["material"], fetch)
            alb = _albedo(scene, matd, sh["uv"])
            throughput = jnp.where((hit_idx >= 0)[:, None], alb, 1.0)
            sky = _sky(direction, lights)
            light = jnp.where((hit_idx < 0)[:, None],
                              sky * lights.sky_intensity, 0.0)
            acc += jnp.sum(throughput) + jnp.sum(light)
            if stop == "albedo_sky":
                return acc
            new_origin = sh["world_position"] + sh["normal"] * 1e-3
            rng, jit_vec = random_unit_vec3(rng)
            shadow_dir = sun_pos[None, :] + jit_vec * 1.5
            nee_o = jnp.where((hit_idx >= 0)[:, None], new_origin, 3.0e37)
            occ = anyhit(nee_o, shadow_dir)
            light = light + jnp.where(
                ((hit_idx >= 0) & ~occ)[:, None],
                sun_col[None, :] * throughput, 0.0)
            acc += jnp.sum(light)
            if stop == "nee":
                return acc
            rng, ball = random_in_ball(rng)
            bounce_dir = sh["normal"] + ball
            acc += jnp.sum(bounce_dir)
            return acc
        return jax.jit(f)

    box = [0]
    prev = 0.0
    for stop in ("raygen", "trace", "shade_hits", "albedo_sky", "nee",
                 "bounce"):
        g = upto(stop)

        def disp(g=g):
            box[0] += 1
            return g(jnp.uint32(box[0]))

        t = delta_time_dispatch(disp, float, reps=6)
        print(f"upto {stop:12s}: {t*1e3:8.2f} ms  (+{(t-prev)*1e3:6.2f})",
              flush=True)
        prev = t

    # the real thing for comparison
    full = jax.jit(lambda frame: jnp.sum(render_sample(
        scene, camera, lights, frame, width=W, height=H,
        settings=settings)))

    def fdisp():
        box[0] += 1
        return full(jnp.uint32(box[0]))

    t = delta_time_dispatch(fdisp, float, reps=6)
    print(f"full render b=1   : {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
