"""Sweep-kernel schedule tuning: TILE x UNROLL x cluster-K scan.

The attribution (tools/attr_sweep.py) showed the kernel runs its executed
work at ~its calibrated rates, with leaf substeps ~80% of device time —
so throughput is now a *scheduling* question: how much leaf work gets
executed per useful hit. That is controlled by
  - tile (lanes per uniform cursor: bigger = more node/leaf sharing but
    every executed leaf pays K x tile MT lanes),
  - unroll (nodes per while-iteration: amortizes scalar bookkeeping
    against overshoot past the lane union),
  - cluster K (triangles per leaf: K x tile MT lanes per leaf execution
    vs more/deeper nodes when K shrinks).

Results are per-ray invariant across all three (pure scheduling), so the
scan just measures device throughput (delta-timed) + executed counters.

Usage: python tools/tune_sweep.py [--scenes a.glb,b.glb] [--primary-only]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SCENES = {
    "suzanne": ("/root/reference/models/suzanne_plane.glb",
                dict(position=(0, 1.5, 5), look_at=(0, 0.5, 0),
                     vfov_deg=45.0)),
    "monkey": ("/root/reference/models/dense_monkey.glb",
               dict(position=(0, 1.0, 4), look_at=(0, 0.5, 0),
                    vfov_deg=45.0)),
    "katana": ("/root/reference/models/valorant_katana.glb",
               dict(position=(0, 2.9, 3.2), look_at=(-0.5, 2.9, 0),
                    vfov_deg=70.0)),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scenes", default="suzanne,monkey,katana")
    p.add_argument("--tiles", default="1024,2048,4096")
    p.add_argument("--unrolls", default="4,8")
    p.add_argument("--ks", default="")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--wave", default="primary",
                   choices=["primary", "bounce"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from dustraytracer_tpu.accel.cluster import build_cluster_bvh
    from dustraytracer_tpu.ops.rng import seed_pixels
    from dustraytracer_tpu.render.integrator import ray_sort_key
    from dustraytracer_tpu.scene import load_scene, make_camera
    from dustraytracer_tpu.scene.camera import generate_rays
    from dustraytracer_tpu.utils.roofline import sweep_attribution

    size = args.size
    n = size * size
    for name in args.scenes.split(","):
        path, campos = SCENES[name]
        scene = load_scene(path)
        cam = make_camera(**campos)
        ids = jnp.arange(n, dtype=jnp.int32)
        rng = seed_pixels(ids.astype(jnp.uint32), jnp.uint32(0))
        _r, o, d = generate_rays(cam, size, size, rng, pixel_ids=ids)
        if args.wave == "bounce":
            # bounce-1-like wave: origins at primary hit points, random
            # unit directions — the expensive incoherent case real
            # frames pay for segments 2..B (parked lanes for misses,
            # like the integrator's dead-lane parking)
            from dustraytracer_tpu.ops.traverse_sweep import (
                traverse_cluster_sweep)
            r0 = jax.jit(lambda: traverse_cluster_sweep(
                scene.cluster, o, d))()
            hit_ok = r0["hit_idx"] >= 0
            o = jnp.where(hit_ok[:, None],
                          o + d * (r0["t"] * 0.999)[:, None], 3.0e37)
            dn = np.random.default_rng(5).normal(
                size=(n, 3)).astype(np.float32)
            d = jnp.asarray(dn / np.linalg.norm(dn, axis=-1,
                                                keepdims=True))
        key = ray_sort_key(scene.node_min[0], scene.node_max[0], o, d)
        perm = jnp.argsort(key)
        o, d = o[perm], d[perm]

        clusters = {None: scene.cluster}
        for kk in [int(x) for x in args.ks.split(",") if x]:
            clusters[kk] = build_cluster_bvh(np.asarray(scene.tri_pos),
                                             k=kk)

        for kk, cb in clusters.items():
            for tile in [int(x) for x in args.tiles.split(",")]:
                for unroll in [int(x) for x in args.unrolls.split(",")]:
                    try:
                        a = sweep_attribution(cb, o, d, tile=tile,
                                              unroll=unroll, reps=6)
                        print(f"{name:8s} k={kk or cb.k:3d} "
                              f"nodes={cb.n_nodes:5d} tile={tile:5d} "
                              f"unroll={unroll}: "
                              f"{a['mrays_per_s']:7.1f} Mrays/s  "
                              f"win/t={a['windows_per_tile']:6.1f} "
                              f"leaf/t={a['leafs_per_tile']:6.1f}",
                              flush=True)
                    except Exception as e:
                        print(f"{name} k={kk} tile={tile} u={unroll}: "
                              f"FAIL {type(e).__name__}: {e}"[:160],
                              flush=True)


if __name__ == "__main__":
    main()
