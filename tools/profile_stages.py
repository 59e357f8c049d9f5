"""Stage-level timing breakdown of a render sample on the real TPU.

All timings use IN-GRAPH repetition (utils/roofline.py
device_seconds_per_call): N invocations inside one dispatch, slope
between two executables — cross-dispatch deltas through the axon tunnel
jitter by +-2 ms, which is larger than several whole stages. Every
stage sums ALL its outputs into the fence scalar so XLA cannot
dead-code-eliminate payload operands (the round-3 rewrite caught the
old script timing a 2-operand rump of the 8-operand payload sort).

Stages:
  - full fwd sample, and the same with sun NEE disabled (their
    difference = the per-frame cost of the shadow-ray waves)
  - raygen (RNG seed + camera rays)
  - payload sort (the 8-operand lax.sort _sorted_tracers issues)
  - traversal kernel on the sorted primary wave
  - shade_hits (one-hot) + material/texture fetch per shade site

Usage: python tools/profile_stages.py [scene.glb] [size] [bounces]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from dustraytracer_tpu.ops.rng import seed_pixels
    from dustraytracer_tpu.render.integrator import (_albedo,
                                                     _fetch_material,
                                                     ray_sort_key,
                                                     render_sample,
                                                     shade_hits)
    from dustraytracer_tpu.ops.traverse_sweep import traverse_cluster_sweep
    from dustraytracer_tpu.scene import load_scene, make_camera
    from dustraytracer_tpu.scene.camera import generate_rays
    from dustraytracer_tpu.scene.settings import LightParams, RenderSettings
    from dustraytracer_tpu.utils.roofline import device_seconds_per_call

    scene_path = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/models/suzanne_plane.glb"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    bounces = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    scene = load_scene(scene_path)
    # reuse the bench camera for this scene when it has one (bench_scenes
    # frames each bundled scene for realistic hit coverage)
    from bench_scenes import CAMERAS
    rel = os.path.relpath(scene_path, "/root/reference/models")
    campos = CAMERAS.get(rel, dict(position=(0, 1.5, 5),
                                   look_at=(0, 0.5, 0), vfov_deg=45.0))
    camera = make_camera(**campos)
    settings = RenderSettings(bounces=bounces, enable_tonemap=False,
                              enable_gamma=False)
    lights = LightParams.from_settings(settings)
    W = H = size
    n = W * H
    print(f"scene={os.path.basename(scene_path)} "
          f"tris={scene.tri_pos.shape[0]} nodes={scene.cluster.n_nodes} "
          f"size={W}x{H} b={bounces}")

    def t_of(call, n_lo=1, n_hi=4):
        return device_seconds_per_call(call, n_lo=n_lo, n_hi=n_hi,
                                       repeats=3)

    def stage(name, call, extra=""):
        t = t_of(call)
        print(f"{name:24s}: {t*1e3:8.2f} ms {extra}", flush=True)
        return t

    rays = n * 2 * bounces
    t_full = stage("full fwd sample", lambda i: jnp.sum(render_sample(
        scene, camera, lights, jnp.uint32(i), width=W, height=H,
        settings=settings)),
        extra=f"({rays/1e6:.2f} Mrays)")

    s_nosun = settings.replace(enable_sunlight=False)
    li_nosun = LightParams.from_settings(s_nosun)
    t_nosun = stage("  w/o sun NEE", lambda i: jnp.sum(render_sample(
        scene, camera, li_nosun, jnp.uint32(i), width=W, height=H,
        settings=s_nosun)))
    print(f"  -> NEE waves cost {max(t_full - t_nosun, 0)*1e3:.2f} ms "
          f"({bounces} anyhit traces + sun shading)")

    ids = jnp.arange(n, dtype=jnp.int32)
    rng = seed_pixels(ids.astype(jnp.uint32), jnp.uint32(0))
    _r, o, d = generate_rays(camera, W, H, rng, pixel_ids=ids)

    stage("raygen", lambda i: jnp.sum(generate_rays(
        camera, W, H, seed_pixels(ids.astype(jnp.uint32), jnp.uint32(i)),
        pixel_ids=ids)[1]))

    key = ray_sort_key(scene.node_min[0], scene.node_max[0], o, d)
    perm = jnp.argsort(key)
    os_, ds_ = o[perm], d[perm]

    def sort_call(i):
        out = jax.lax.sort(
            (key + i, o[:, 0], o[:, 1], o[:, 2],
             d[:, 0], d[:, 1], d[:, 2],
             jnp.arange(n, dtype=jnp.int32)),
            dimension=0, num_keys=1)
        # consume EVERY operand or XLA prunes them from the sort
        return sum(jnp.sum(x.astype(jnp.float32)) for x in out[1:])

    stage("payload sort (x4/bounce)", sort_call)

    stage("traversal (sorted wave)", lambda i: jnp.sum(
        traverse_cluster_sweep(scene.cluster, os_ + jnp.float32(i) * 1e-6,
                               ds_)["t"]))

    res = jax.jit(lambda: traverse_cluster_sweep(scene.cluster, o, d))()
    hit = res["hit_idx"]

    stage("shade_hits onehot", lambda i: sum(
        jnp.sum(v.astype(jnp.float32))
        for v in shade_hits(scene, o + jnp.float32(i) * 1e-6, d,
                            hit, "onehot").values()))

    sh = jax.jit(lambda: shade_hits(scene, o, d, hit, "onehot"))()
    mats, uv = sh["material"], sh["uv"]
    stage("material+texture fetch", lambda i: jnp.sum(_albedo(
        scene, _fetch_material(scene, mats, "onehot"),
        uv + jnp.float32(i) * 1e-7)))


if __name__ == "__main__":
    main()
