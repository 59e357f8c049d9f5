"""Sweep cluster size K for the min-sweep traversal kernel.

Leaf visits cost one one-hot matvec each (latency-bound); bigger K
halves the visit count at constant total table size. Measures sorted
primary-wave traversal throughput per scene per K.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

SCENES = {
    "suzanne": ("/root/reference/models/suzanne_plane.glb", 512),
    "dense_monkey": ("/root/reference/models/dense_monkey.glb", 1024),
    "cs16_dust": ("/root/reference/models/source/cs16_dust.glb", 512),
}


def main():
    from dustraytracer_tpu.ops.rng import seed_pixels
    from dustraytracer_tpu.ops.traverse_sweep import traverse_cluster_sweep
    from dustraytracer_tpu.render.integrator import ray_sort_key
    from dustraytracer_tpu.scene import load_scene, make_camera
    from dustraytracer_tpu.scene.camera import generate_rays

    camera = make_camera(position=(0, 1.5, 5), look_at=(0, 0.5, 0),
                         vfov_deg=45.0)
    for name, (path, size) in SCENES.items():
        n = size * size
        ids = jnp.arange(n, dtype=jnp.int32)
        for k in (32, 64, 128):
            scene = load_scene(path, cluster_k=k)
            rng = seed_pixels(ids.astype(jnp.uint32), jnp.uint32(0))
            _rng, o, d = generate_rays(camera, size, size, rng,
                                       pixel_ids=ids)
            key = ray_sort_key(scene.node_min[0], scene.node_max[0], o, d)
            r = jax.lax.sort((key, o[:, 0], o[:, 1], o[:, 2],
                              d[:, 0], d[:, 1], d[:, 2]),
                             dimension=0, num_keys=1)
            o = jnp.stack(r[1:4], axis=-1)
            d = jnp.stack(r[4:7], axis=-1)
            trav = jax.jit(lambda o, d, cb=scene.cluster: jnp.sum(
                traverse_cluster_sweep(cb, o, d)["t"]))
            t0 = time.perf_counter()
            float(trav(o, d))
            comp = time.perf_counter() - t0
            float(trav(o, d))
            t0 = time.perf_counter()
            reps = 5
            for _ in range(reps):
                out = trav(o, d)
            float(out)
            dt = (time.perf_counter() - t0) / reps
            print(f"{name:14s} k={k:4d} nodes={scene.cluster.n_nodes:5d} "
                  f"clusters={scene.cluster.v0.shape[0]:5d} "
                  f"{n/dt/1e6:7.2f} Mrays/s  (compile {comp:.0f}s)",
                  flush=True)


if __name__ == "__main__":
    main()
