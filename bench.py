"""Benchmark: rays/sec/chip forward+backward, cornell_box (BASELINE.json).

Prints ONE JSON line:
  {"metric": "rays_per_sec_chip_fwd_bwd", "value": N, "unit": "rays/s",
   "vs_baseline": N}

Workload (BASELINE.json config 1 scaled to the bench duty): cornell_box,
256x256, 2-bounce paths with sun NEE (so 4 traced rays per pixel sample:
2 path segments + 2 shadow rays), forward render + backward gradients
w.r.t. material albedo, emissive and light parameters.

The reference publishes no numbers (BASELINE.md); the baseline constant
below is this framework's own first recorded TPU v5e measurement, so
vs_baseline tracks our perf progress round over round.
"""

from __future__ import annotations

import json
import time

import numpy as np

# Self-baseline: first recorded measurement on TPU v5 lite (round 1,
# threaded-gather traversal, scan integrator). Updated only when the
# workload definition changes.
BASELINE_RAYS_PER_SEC = 448303.1

WIDTH = HEIGHT = 256
BOUNCES = 2
SPP_TIMED = 16


def main():
    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "cpu":
        # CPU only: cached Mosaic (Pallas) executables HANG when reloaded
        # through the axon TPU plugin's persistent cache
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from dustraytracer_tpu.render.integrator import render_sample
    from dustraytracer_tpu.scene import load_scene, make_camera
    from dustraytracer_tpu.scene.settings import LightParams, RenderSettings

    scene = load_scene("/root/reference/models/cornell_box.glb")
    camera = make_camera(position=(0, 1.25, 1.18), look_at=(0, 1.1, -1.25),
                         vfov_deg=75.0)
    settings = RenderSettings(bounces=BOUNCES, enable_tonemap=False,
                              enable_gamma=False)
    lights = LightParams.from_settings(settings)

    def loss_fn(albedo, emissive, lights, frame):
        sc = scene.replace(mat_albedo=albedo, mat_emissive=emissive)
        img = render_sample(sc, camera, lights, frame,
                            width=WIDTH, height=HEIGHT, settings=settings)
        return jnp.mean(img)

    step = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1, 2)))

    out = step(scene.mat_albedo, scene.mat_emissive, lights, jnp.uint32(0))
    jax.block_until_ready(out)  # compile
    warm = [step(scene.mat_albedo, scene.mat_emissive, lights,
                 jnp.uint32(90 + f)) for f in range(4)]
    jax.block_until_ready(warm)  # steady state (first dispatches ramp)

    # pipeline all timed dispatches, sync once: per-dispatch host
    # round-trips over the axon tunnel would otherwise dominate
    t0 = time.perf_counter()
    outs = [step(scene.mat_albedo, scene.mat_emissive, lights,
                 jnp.uint32(1 + f)) for f in range(SPP_TIMED)]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0

    n_pixels = WIDTH * HEIGHT
    rays_per_sample = BOUNCES * 2  # path segments + sun shadow rays
    total_rays = n_pixels * SPP_TIMED * rays_per_sample
    rays_per_sec = total_rays / dt

    vs = (rays_per_sec / BASELINE_RAYS_PER_SEC
          if BASELINE_RAYS_PER_SEC else 1.0)
    print(json.dumps({
        "metric": "rays_per_sec_chip_fwd_bwd",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
