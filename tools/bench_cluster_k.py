"""Sweep cluster size K (and optionally TILE) for the min-sweep kernel.

A leaf substep costs one one-hot matvec (cheap, MXU) plus a (K, TILE)
Möller–Trumbore block on the VPU — the dominant term for dense scenes
(VERDICT r4: cs16 99.3% leaf share). Smaller K trims dead MT lanes per
visit but multiplies visits; this sweep measures the real trade on-chip
with each scene's bench camera and octant-ordered traversal.

Usage: python tools/bench_cluster_k.py [--ks 16,32,64,128]
       [--tiles 2048] [--scenes suzanne,dense_monkey,cs16_dust,katana]
Writes results/cluster_k_sweep.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

SCENES = {
    "suzanne": "suzanne_plane.glb",
    "dense_monkey": "dense_monkey.glb",
    "cs16_dust": "source/cs16_dust.glb",
    "katana": "valorant_katana.glb",
}
SIZE = 512


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", default="16,32,64,128")
    ap.add_argument("--tiles", default="2048")
    ap.add_argument("--scenes", default="dense_monkey,cs16_dust,katana")
    args = ap.parse_args()

    from bench_scenes import CAMERAS
    from dustraytracer_tpu.ops.rng import seed_pixels
    from dustraytracer_tpu.ops.traverse_sweep import traverse_cluster_sweep
    from dustraytracer_tpu.render.integrator import _sorted_tracers
    from dustraytracer_tpu.scene import load_scene, make_camera
    from dustraytracer_tpu.scene.camera import generate_rays
    from dustraytracer_tpu.utils.roofline import device_seconds_per_call

    rows = []
    n = SIZE * SIZE
    ids = jnp.arange(n, dtype=jnp.int32)
    for sname in args.scenes.split(","):
        path = f"/root/reference/models/{SCENES[sname]}"
        rel = os.path.relpath(path, "/root/reference/models")
        campos = CAMERAS.get(rel, dict(position=(0, 1.5, 5),
                                       look_at=(0, 0.5, 0), vfov_deg=45.0))
        camera = make_camera(**campos)
        for k in [int(x) for x in args.ks.split(",")]:
            scene = load_scene(path, cluster_k=k)
            rng = seed_pixels(ids.astype(jnp.uint32), jnp.uint32(0))
            _rng, o, d = generate_rays(camera, SIZE, SIZE, rng,
                                       pixel_ids=ids)
            o, d = jax.block_until_ready((o, d))
            for tile in [int(x) for x in args.tiles.split(",")]:
                closest, _ = _sorted_tracers(
                    scene,
                    lambda oo, dd, cb=scene.cluster, t=tile:
                        traverse_cluster_sweep(cb, oo, dd, tile=t),
                    lambda oo, dd, cb=scene.cluster, t=tile:
                        traverse_cluster_sweep(cb, oo, dd, anyhit=True,
                                               tile=t)["hit_idx"] >= 0)
                t0 = time.perf_counter()
                try:
                    sec = device_seconds_per_call(
                        lambda i: jnp.sum(
                            closest(o + jnp.float32(i) * 1e-6, d)["t"]))
                except Exception as e:
                    print(f"{sname} k={k} tile={tile}: FAILED {e}",
                          flush=True)
                    continue
                row = {
                    "scene": sname, "k": k, "tile": tile,
                    "nodes": scene.cluster.n_nodes,
                    "clusters": scene.cluster.n_clusters,
                    "closest_sorted_ms": round(sec * 1e3, 2),
                    "mrays_per_s": round(n / sec / 1e6, 2),
                    "wall_s": round(time.perf_counter() - t0, 1),
                }
                rows.append(row)
                print(json.dumps(row), flush=True)

    os.makedirs("results", exist_ok=True)
    with open("results/cluster_k_sweep.json", "w") as f:
        json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
