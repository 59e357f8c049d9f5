"""Benchmark: rays/sec/chip forward+backward on the BVH kernel path.

Prints ONE JSON line:
  {"metric": "rays_per_sec_chip_fwd_bwd", "value": N, "unit": "rays/s",
   "vs_baseline": N, ...extra diagnostics...}

Workload (BASELINE.json config 2): suzanne_plane (970 triangles), 512x512,
4-bounce paths with sun NEE (8 traced rays per pixel sample: 4 path
segments + 4 shadow rays), forward render + backward gradients w.r.t.
material albedo, emissive and light parameters, on the min-sweep Pallas
traversal kernel.

Timing methodology (round 3): DEVICE time per step via delta timing —
wall(2R steps) - wall(R steps) with a host scalar fetch as the fence.
Through the axon tunnel every dispatch chain carries a fixed ~5-25 ms
host<->device latency; round 2 amortized it over 8 reps (still ~20-40%
of the reading), and the isolated traversal "measurement" was 3.6x the
kernel's true device time. Delta timing cancels the fixed term exactly
(utils/roofline.py delta_time_dispatch). The latency-inclusive number is
still reported as ms_per_sample_dispatched for transparency.

The speed-of-light section prices the kernel's OWN executed-work counters
(exec_windows/exec_leafs, ops/traverse_sweep.py) at rates calibrated on
zero-divergence chain scenes — a true upper bound for the kernel as
built; sol_pct ~100 means the kernel runs its executed work at its
calibrated ceiling (BASELINE.json:5 gate).

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
    from dustraytracer_tpu.utils.roofline import delta_time_dispatch

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

    frame_box = [0]

    def dispatch():
        frame_box[0] += 1
        return grad_fn(scene.mat_albedo, scene.mat_emissive, lights,
                       jnp.uint32(frame_box[0]))

    compile_t0 = time.perf_counter()
    # Warm the two Mosaic kernel variants CONCURRENTLY before the big
    # executable lowers. Cold, each sweep-kernel Mosaic compile takes
    # ~90 s through the axon remote-compile tunnel and they serialize
    # inside jaxpr->MLIR lowering (measured 184 s of the r4 cold
    # compile_s, results/bench_r4_try3.log + docs/COMPILE_TIME.md);
    # overlapping them halves that. Runs INSIDE the timed window, so
    # compile_s stays the honest time-to-first-gradient.
    try:
        import concurrent.futures as cf

        from dustraytracer_tpu.ops.traverse_sweep import (
            traverse_cluster_sweep)
        from dustraytracer_tpu.render.integrator import _resolve_fetch

        n_warm = WIDTH * HEIGHT
        ow = jnp.zeros((n_warm, 3), jnp.float32)
        dw = jnp.ones((n_warm, 3), jnp.float32)

        # Since round 5 closest/anyhit share ONE Mosaic module (anyhit
        # is a runtime scalar), so a single warm compile covers both.
        # Configs that resolve to the in-kernel shading fetch compile
        # the emit_attrs module too — warm it concurrently (advisor r4
        # finding #3: it used to compile cold inside the main lowering).
        emits = [False]
        if _resolve_fetch(scene, settings) == "kernel":
            emits.append(True)

        def _warm(emit):
            jax.jit(lambda: traverse_cluster_sweep(
                scene.cluster, ow, dw,
                emit_attrs=emit)).lower().compile()

        with cf.ThreadPoolExecutor(len(emits)) as ex:
            list(ex.map(_warm, emits))
        warm_s = time.perf_counter() - compile_t0
    except Exception:
        warm_s = None
    out = dispatch()
    float(out[0])  # host fetch = the only reliable fence (axon tunnel)
    compile_s = time.perf_counter() - compile_t0

    # device seconds per fwd+bwd sample (delta-timed)
    dt = delta_time_dispatch(dispatch, lambda o: float(o[0]), reps=4)

    # latency-inclusive throughput for transparency (round-2 method)
    t0 = time.perf_counter()
    for _ in range(8):
        out = dispatch()
    float(out[0])
    dt_disp = (time.perf_counter() - t0) / 8

    rays_per_sample = WIDTH * HEIGHT * 2 * BOUNCES  # segments + NEE shadow
    rays_per_sec = rays_per_sample / dt

    result = {
        "metric": "rays_per_sec_chip_fwd_bwd",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
        "workload": f"suzanne_plane {WIDTH}x{HEIGHT} b{BOUNCES} fwd+bwd",
        "ms_per_sample": round(dt * 1e3, 2),
        "ms_per_sample_dispatched": round(dt_disp * 1e3, 2),
        "compile_s": round(compile_s, 1),
    }
    if warm_s is not None:
        # of which: concurrent Mosaic-kernel warm-up (docs/COMPILE_TIME.md)
        result["compile_warm_kernels_s"] = round(warm_s, 1)

    # --- traversal kernel in isolation + speed-of-light (BASELINE.json:5)
    try:
        from dustraytracer_tpu.render.integrator import ray_sort_key
        from dustraytracer_tpu.utils.roofline import (calibrate_sweep_rates,
                                                      sweep_attribution)

        n = WIDTH * HEIGHT
        ids = jnp.arange(n, dtype=jnp.int32)
        rng = seed_pixels(ids.astype(jnp.uint32), jnp.uint32(0))
        _rng, o, d = generate_rays(camera, WIDTH, HEIGHT, rng,
                                   pixel_ids=ids)
        # sort exactly as the integrator does before the kernel
        key = ray_sort_key(scene.node_min[0], scene.node_max[0], o, d)
        perm = jnp.argsort(key)
        o, d = o[perm], d[perm]

        from dustraytracer_tpu.ops.traverse_sweep import auto_tile

        rates = calibrate_sweep_rates(k=scene.cluster.k,
                                      c_pad=scene.cluster.v0.shape[0],
                                      tile=auto_tile(scene.cluster))
        attr = sweep_attribution(scene.cluster, o, d, rates=rates)
        result.update({
            "traversal_mrays_per_s": round(attr["mrays_per_s"], 2),
            "sol_pct": round(attr["sol_pct"], 2),
            # unclipped ratio + useful/executed volume: together these
            # keep the >=80% gate falsifiable (VERDICT r3 weak #3)
            "sol_raw_pct": round(attr["sol_raw_pct"], 2),
            "kernel_window_ns": round(rates["window_ns"], 1),
            "kernel_leaf_ns": round(rates["leaf_ns"], 1),
            "exec_windows_per_tile": round(attr["windows_per_tile"], 2),
            "exec_leafs_per_tile": round(attr["leafs_per_tile"], 2),
            "leaf_share_pct": round(attr["leaf_share_pct"], 1),
        })
        from dustraytracer_tpu.utils.roofline import volume_efficiency
        vol = volume_efficiency(scene.cluster, o, d, rates=rates)
        result.update({
            "vol_eff_pct": round(vol["vol_eff_pct"], 1),
            "vol_eff_window_pct": round(vol["vol_eff_window_pct"], 1),
            "vol_eff_leaf_pct": round(vol["vol_eff_leaf_pct"], 1),
        })
    except Exception as e:  # diagnostics must not sink the headline
        result["sol_error"] = f"{type(e).__name__}: {e}"[:200]

    print(json.dumps(result))


if __name__ == "__main__":
    main()
