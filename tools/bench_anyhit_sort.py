"""Does the NEE shadow wave need its own payload sort?

Shadow rays all aim at the sun: one shared direction octant, and their
origins inherit the coherence of the (already sorted) closest wave's
hit points. The 8-operand payload sort + unsort wrap costs ~0.8 ms per
wave on suzanne (r4 profile: anyhit_sorted composite 1.69 ms vs 0.89 ms
for the bare kernel on sorted rays) — this measures sorted vs unsorted
anyhit on REAL NEE waves (origins = hit points of a bounce wave, in
pixel order) per scene.

Usage: python tools/bench_anyhit_sort.py [scene ...]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT = ["suzanne_plane.glb", "source/cs16_dust.glb"]
SIZE = 512


def main():
    from bench_scenes import CAMERAS
    from dustraytracer_tpu.ops.rng import seed_pixels
    from dustraytracer_tpu.ops.traverse_sweep import traverse_cluster_sweep
    from dustraytracer_tpu.render.integrator import _sorted_tracers
    from dustraytracer_tpu.scene import load_scene, make_camera
    from dustraytracer_tpu.scene.camera import generate_rays
    from dustraytracer_tpu.scene.settings import LightParams, RenderSettings
    from dustraytracer_tpu.utils.roofline import device_seconds_per_call

    rows = []
    n = SIZE * SIZE
    ids = jnp.arange(n, dtype=jnp.int32)
    for name in (sys.argv[1:] or DEFAULT):
        path = f"/root/reference/models/{name}"
        scene = load_scene(path)
        rel = os.path.relpath(path, "/root/reference/models")
        campos = CAMERAS.get(rel, dict(position=(0, 1.5, 5),
                                       look_at=(0, 0.5, 0), vfov_deg=45.0))
        camera = make_camera(**campos)
        rng = seed_pixels(ids.astype(jnp.uint32), jnp.uint32(0))
        _r, o, d = generate_rays(camera, SIZE, SIZE, rng, pixel_ids=ids)
        # build a REAL NEE wave: closest hit -> origins at hit points,
        # direction = jittered sun (pixel order, exactly what _segment
        # feeds trace_anyhit)
        res = jax.jit(lambda: traverse_cluster_sweep(scene.cluster, o, d))()
        hit = res["hit_idx"] >= 0
        nee_o = jnp.where(hit[:, None], o + d * res["t"][:, None], 3.0e37)
        lights = LightParams.from_settings(RenderSettings())
        sun = lights.sun_position()
        key = jax.random.PRNGKey(0)
        jit_vec = jax.random.normal(key, (n, 3)) * 0.5
        nee_d = sun[None, :] + jit_vec * 1.5
        nee_o, nee_d = jax.block_until_ready((nee_o, nee_d))

        def bare(i):
            r = traverse_cluster_sweep(
                scene.cluster, nee_o + jnp.float32(i) * 1e-6, nee_d,
                anyhit=True)
            return jnp.sum(r["t"])

        _, anyhit_sorted = _sorted_tracers(
            scene,
            lambda oo, dd: traverse_cluster_sweep(scene.cluster, oo, dd),
            lambda oo, dd: traverse_cluster_sweep(
                scene.cluster, oo, dd, anyhit=True)["hit_idx"] >= 0)

        def wrapped(i):
            occ = anyhit_sorted(nee_o + jnp.float32(i) * 1e-6, nee_d)
            return jnp.sum(occ.astype(jnp.float32))

        t_bare = device_seconds_per_call(bare)
        t_wrap = device_seconds_per_call(wrapped)
        row = {"scene": os.path.basename(name),
               "anyhit_unsorted_ms": round(t_bare * 1e3, 3),
               "anyhit_sorted_wrap_ms": round(t_wrap * 1e3, 3)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    with open("results/anyhit_sort_bench.json", "w") as f:
        json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
