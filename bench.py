"""Benchmark: rays/sec/chip forward+backward on the BVH kernel path.

Prints ONE JSON line:
  {"metric": "rays_per_sec_chip_fwd_bwd", "value": N, "unit": "rays/s",
   "vs_baseline": N, ...extra diagnostics...}

Workload (BASELINE.json config 2): suzanne_plane (970 triangles), 512x512,
4-bounce paths with sun NEE (8 traced rays per pixel sample: 4 path
segments + 4 shadow rays), forward render + backward gradients w.r.t.
material albedo, emissive and light parameters. Unlike round 1's
cornell_box headline (34 tris, all-pairs brute-force path), this exercises
the min-sweep Pallas traversal kernel — the thing the framework is about.

Also reported (not the headline): the traversal kernel in isolation on
the same primary-ray wave, with its speed-of-light percentage from the
measured-peaks roofline model (utils/roofline.py, BASELINE.json:5), and
brute-force cornell_box for continuity with round 1.

The reference publishes no numbers (BASELINE.md); the baseline constant
is this framework's round-1 recorded TPU v5e measurement of THIS workload
(bench_report.json r1: suzanne_512 fwdbwd_mrays_per_s = 10.116), so
vs_baseline tracks our perf progress round over round.
"""

from __future__ import annotations

import json
import time

import numpy as np

# Round-1 recorded suzanne_512 fwd+bwd throughput on TPU v5 lite
# (bench_report.json, pre-ray-sort). Updated only when the workload
# definition changes.
BASELINE_RAYS_PER_SEC = 10.116e6

WIDTH = HEIGHT = 512
BOUNCES = 4
SPP_TIMED = 8


def main():
    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "cpu":
        # CPU only: cached Mosaic (Pallas) executables HANG when reloaded
        # through the axon TPU plugin's persistent cache
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from dustraytracer_tpu.ops.rng import seed_pixels
    from dustraytracer_tpu.render.integrator import render_sample
    from dustraytracer_tpu.scene import load_scene, make_camera
    from dustraytracer_tpu.scene.camera import generate_rays
    from dustraytracer_tpu.scene.settings import LightParams, RenderSettings

    scene = load_scene("/root/reference/models/suzanne_plane.glb")
    camera = make_camera(position=(0, 1.5, 5), look_at=(0, 0.5, 0),
                         vfov_deg=45.0)
    settings = RenderSettings(bounces=BOUNCES, enable_tonemap=False,
                              enable_gamma=False)
    lights = LightParams.from_settings(settings)

    def loss_fn(albedo, emissive, lights, frame):
        sc = scene.replace(mat_albedo=albedo, mat_emissive=emissive)
        img = render_sample(sc, camera, lights, frame,
                            width=WIDTH, height=HEIGHT, settings=settings)
        return jnp.mean(img)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1, 2)))

    # Synchronization: fetch the scalar loss to the host. Through the
    # axon tunnel block_until_ready can return before device completion
    # (utils/roofline.py measure_peaks docstring); a host fetch is the
    # only reliable fence. The device executes queued dispatches
    # serially, so timing N dispatches + one final fetch measures the
    # true aggregate device time (plus one ~tens-of-ms tunnel latency,
    # amortized over SPP_TIMED).
    compile_t0 = time.perf_counter()
    out = grad_fn(scene.mat_albedo, scene.mat_emissive, lights,
                  jnp.uint32(0))
    float(out[0])
    compile_s = time.perf_counter() - compile_t0
    # warm the dispatch pipeline (first post-compile steps pay transfer
    # setup through the tunnel)
    for i in range(2):
        out = grad_fn(scene.mat_albedo, scene.mat_emissive, lights,
                      jnp.uint32(1 + i))
    float(out[0])

    t0 = time.perf_counter()
    for i in range(SPP_TIMED):
        out = grad_fn(scene.mat_albedo, scene.mat_emissive, lights,
                      jnp.uint32(10 + i))
    float(out[0])
    dt = (time.perf_counter() - t0) / SPP_TIMED

    rays_per_sample = WIDTH * HEIGHT * 2 * BOUNCES  # segments + NEE shadow
    rays_per_sec = rays_per_sample / dt

    result = {
        "metric": "rays_per_sec_chip_fwd_bwd",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
        "workload": f"suzanne_plane {WIDTH}x{HEIGHT} b{BOUNCES} fwd+bwd",
        "ms_per_sample": round(dt * 1e3, 2),
        "compile_s": round(compile_s, 1),
    }

    # --- traversal kernel in isolation + speed-of-light (BASELINE.json:5)
    try:
        from dustraytracer_tpu.ops.traverse_sweep import \
            traverse_cluster_sweep
        from dustraytracer_tpu.utils.roofline import (measure_peaks,
                                                      measure_sweep_rates,
                                                      sol_report, walk_stats)

        n = WIDTH * HEIGHT
        ids = jnp.arange(n, dtype=jnp.int32)
        rng = seed_pixels(ids.astype(jnp.uint32), jnp.uint32(0))
        _rng, o, d = generate_rays(camera, WIDTH, HEIGHT, rng,
                                   pixel_ids=ids)
        # sort exactly as the integrator does before the kernel
        from dustraytracer_tpu.render.integrator import ray_sort_key
        key = ray_sort_key(scene.node_min[0], scene.node_max[0], o, d)
        perm = jnp.argsort(key)
        o, d = o[perm], d[perm]

        trav = jax.jit(
            lambda o, d: jnp.sum(traverse_cluster_sweep(
                scene.cluster, o, d)["t"]))
        float(trav(o, d))  # compile + warm (scalar fetch = real fence)
        float(trav(o, d))
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            r = trav(o, d)
        float(r)
        trav_dt = (time.perf_counter() - t0) / reps
        trav_rays_per_s = n / trav_dt

        peaks = measure_peaks()
        rates = measure_sweep_rates(k=scene.cluster.k,
                                    c_pad=scene.cluster.v0.shape[0])
        stats = walk_stats(scene.cluster, np.asarray(o), np.asarray(d))
        sol = sol_report(trav_rays_per_s, stats, peaks,
                         scene.cluster.k, scene.cluster.v0.shape[0],
                         rates=rates)
        result.update({
            "traversal_mrays_per_s": round(trav_rays_per_s / 1e6, 2),
            "sol_pct": round(sol["sol_pct"], 2),
            "kernel_step_ns": sol.get("kernel_step_ns"),
            "kernel_leaf_step_ns": sol.get("kernel_leaf_step_ns"),
            "analytic_sol_pct": round(sol["analytic_sol_pct"], 1),
            "sol_pct_ideal_coherence": round(sol["sol_pct_ideal"], 2),
            "sol_bound": sol["bound"],
            "mean_tile_steps": round(sol["mean_tile_steps"], 1),
            "peaks": {k: round(v, 1) for k, v in peaks.items()
                      if isinstance(v, float)},
        })
    except Exception as e:  # diagnostics must not sink the headline
        result["sol_error"] = f"{type(e).__name__}: {e}"[:200]

    print(json.dumps(result))


if __name__ == "__main__":
    main()
