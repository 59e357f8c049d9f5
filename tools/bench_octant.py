"""Round-5 octant-ordered sweep kernel: on-chip validation + perf.

1. compile: time closest, then anyhit — with the merged runtime-mode
   kernel the second must be a Mosaic cache hit (seconds, not ~90 s).
2. correctness: sweep hit t vs float64 numpy Möller–Trumbore brute
   force on a random ray subset.
3. perf: sorted primary-wave traversal Mrays/s per scene — compare
   against bench_report.json r4 traversal_mrays_per_s (suzanne 91.2,
   dense_monkey 25.2, cs16 22.4, katana 31.0).

Usage: python tools/bench_octant.py [scene.glb ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_SCENES = [
    "suzanne_plane.glb",
    "dense_monkey.glb",
    "source/cs16_dust.glb",
    "valorant_katana.glb",
]


def main():
    from bench_scenes import CAMERAS
    from dustraytracer_tpu.ops.rng import seed_pixels
    from dustraytracer_tpu.ops.traverse_sweep import traverse_cluster_sweep
    from dustraytracer_tpu.render.integrator import _sorted_tracers
    from dustraytracer_tpu.scene import load_scene, make_camera
    from dustraytracer_tpu.scene.camera import generate_rays
    from dustraytracer_tpu.utils.roofline import device_seconds_per_call

    names = sys.argv[1:] or DEFAULT_SCENES
    size = 512
    report = {}
    for name in names:
        path = f"/root/reference/models/{name}"
        scene = load_scene(path)
        rel = os.path.relpath(path, "/root/reference/models")
        campos = CAMERAS.get(rel, dict(position=(0, 1.5, 5),
                                       look_at=(0, 0.5, 0), vfov_deg=45.0))
        camera = make_camera(**campos)
        n = size * size
        ids = jnp.arange(n, dtype=jnp.int32)
        rng = seed_pixels(ids.astype(jnp.uint32), jnp.uint32(0))
        _, o, d = generate_rays(camera, size, size, rng, pixel_ids=ids)
        o, d = jax.block_until_ready((o, d))
        ent = {"tris": scene.n_tris, "m": scene.cluster.n_nodes}

        t0 = time.perf_counter()
        jax.jit(lambda: traverse_cluster_sweep(
            scene.cluster, o, d)).lower().compile()
        ent["compile_closest_s"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        jax.jit(lambda: traverse_cluster_sweep(
            scene.cluster, o, d, anyhit=True)).lower().compile()
        ent["compile_anyhit_s"] = round(time.perf_counter() - t0, 1)

        # correctness vs float64 brute on a ray subset
        res = jax.jit(lambda: traverse_cluster_sweep(scene.cluster, o, d))()
        sub = np.random.default_rng(0).choice(n, 512, replace=False)
        on = np.asarray(o, np.float64)[sub]
        dn = np.asarray(d, np.float64)[sub]
        tp = np.asarray(scene.tri_pos, np.float64)[:scene.n_tris]
        v0, e1, e2 = tp[:, 0], tp[:, 1] - tp[:, 0], tp[:, 2] - tp[:, 0]
        p = np.cross(dn[:, None], e2[None])
        det = (e1[None] * p).sum(-1)
        par = np.abs(det) < 1e-6
        inv = 1.0 / np.where(par, 1.0, det)
        tv = on[:, None] - v0[None]
        u = inv * (tv * p).sum(-1)
        q = np.cross(tv, e1[None])
        v = inv * (dn[:, None] * q).sum(-1)
        tt = inv * (e2[None] * q).sum(-1)
        ok = (~par) & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) \
            & (tt > 1e-6)
        tt = np.where(ok, tt, 3.4e38)
        best = tt.min(axis=1)
        hit = best < 1e37
        got_t = np.asarray(res["t"])[sub]
        got_hit = np.asarray(res["hit_idx"])[sub] >= 0
        ent["hit_match"] = bool((got_hit == hit).all())
        ent["t_match"] = bool(np.allclose(got_t[hit], best[hit], rtol=2e-4))

        # sorted primary-wave perf (the integrator's composition)
        closest, _ = _sorted_tracers(
            scene, lambda oo, dd: traverse_cluster_sweep(
                scene.cluster, oo, dd),
            lambda oo, dd: traverse_cluster_sweep(
                scene.cluster, oo, dd, anyhit=True)["hit_idx"] >= 0)
        sec = device_seconds_per_call(
            lambda i: jnp.sum(closest(o + jnp.float32(i) * 1e-6, d)["t"]))
        ent["closest_sorted_ms"] = round(sec * 1e3, 2)
        ent["traversal_mrays_per_s"] = round(n / sec / 1e6, 2)
        report[os.path.basename(name)] = ent
        print(os.path.basename(name), json.dumps(ent), flush=True)

    os.makedirs("results", exist_ok=True)
    with open("results/octant_bench.json", "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
