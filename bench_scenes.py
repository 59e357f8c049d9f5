"""Extended benchmark harness: every BASELINE.json config on real TPU.

`bench.py` stays the single-number driver metric; this sweeps the
reference's bundled scenes forward-only and fwd+bwd and writes a JSON
report (the reference's in-app Developer Metrics, made reproducible).

Usage: python bench_scenes.py [--out bench_report.json]
"""

from __future__ import annotations

import argparse
import json
import time

CONFIGS = [
    # (name, scene, W, H, bounces, spp_timed)  — BASELINE.json configs 1-3
    ("cornell_256", "cornell_box.glb", 256, 256, 2, 4),
    ("suzanne_512", "suzanne_plane.glb", 512, 512, 4, 2),
    ("dense_monkey_1k", "dense_monkey.glb", 1024, 1024, 2, 1),
]

CAMERAS = {
    "cornell_box.glb": dict(position=(0, 1.25, 1.18), look_at=(0, 1.1, -1.25),
                            vfov_deg=75.0),
    "suzanne_plane.glb": dict(position=(0, 1.5, 5), look_at=(0, 0.5, 0),
                              vfov_deg=45.0),
    "dense_monkey.glb": dict(position=(0, 1.0, 4), look_at=(0, 0.5, 0),
                             vfov_deg=45.0),
}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="bench_report.json")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from dustraytracer_tpu.render.integrator import render_sample
    from dustraytracer_tpu.scene import load_scene, make_camera
    from dustraytracer_tpu.scene.settings import LightParams, RenderSettings

    report = {"backend": jax.default_backend(),
              "device": str(jax.devices()[0]), "configs": []}

    for name, scene_file, w, h, bounces, spp in CONFIGS:
        scene = load_scene(f"/root/reference/models/{scene_file}")
        cam = make_camera(**CAMERAS[scene_file])
        settings = RenderSettings(bounces=bounces, enable_tonemap=False,
                                  enable_gamma=False)
        lights = LightParams.from_settings(settings)

        def fwd(frame):
            return render_sample(scene, cam, lights, frame,
                                 width=w, height=h, settings=settings)

        def loss(albedo, frame):
            img = render_sample(scene.replace(mat_albedo=albedo), cam,
                                lights, frame, width=w, height=h,
                                settings=settings)
            return jnp.mean(img)

        fwd_j = jax.jit(fwd)
        bwd_j = jax.jit(jax.value_and_grad(loss))

        entry = {"config": name, "scene": scene_file, "size": [w, h],
                 "bounces": bounces, "triangles": scene.n_tris}
        try:
            t0 = time.perf_counter()
            jax.block_until_ready(fwd_j(jnp.uint32(0)))
            entry["fwd_compile_s"] = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            outs = [fwd_j(jnp.uint32(1 + i)) for i in range(spp)]
            jax.block_until_ready(outs)
            dt = (time.perf_counter() - t0) / spp
            entry["fwd_ms_per_sample"] = round(dt * 1e3, 2)
            entry["fwd_mrays_per_s"] = round(
                w * h * 2 * bounces / dt / 1e6, 3)

            t0 = time.perf_counter()
            jax.block_until_ready(bwd_j(scene.mat_albedo, jnp.uint32(0)))
            entry["fwdbwd_compile_s"] = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            outs = [bwd_j(scene.mat_albedo, jnp.uint32(1 + i))
                    for i in range(spp)]
            jax.block_until_ready(outs)
            dt = (time.perf_counter() - t0) / spp
            entry["fwdbwd_ms_per_sample"] = round(dt * 1e3, 2)
            entry["fwdbwd_mrays_per_s"] = round(
                w * h * 2 * bounces / dt / 1e6, 3)
        except Exception as e:
            entry["error"] = f"{type(e).__name__}: {e}"[:200]
        report["configs"].append(entry)
        print(json.dumps(entry), flush=True)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
