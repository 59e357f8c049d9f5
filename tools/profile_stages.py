"""Stage-level timing breakdown of a render sample on the real TPU.

Times, with host-fetch fences (see utils/roofline.py on why
block_until_ready is not a fence through the axon tunnel):
  - full render_sample (fwd)
  - traversal kernel alone on the primary wave (sorted)
  - the ray sort machinery alone (key + argsort + permute + inverse)
  - shade_hits + material fetch + albedo alone (one-hot or gather)

Usage: python tools/profile_stages.py [scene.glb] [size] [bounces]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def bench(fn, *args, reps=6):
    """Device seconds per call, delta-timed (see utils/roofline.py:
    delta_time_dispatch — single fenced dispatches measure the axon
    tunnel's fixed latency, not the kernel)."""
    from dustraytracer_tpu.utils.roofline import delta_time_dispatch

    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))  # compile; fetch = fence
    return delta_time_dispatch(
        lambda: fn(*args),
        lambda o: float(jnp.sum(jax.tree.leaves(o)[0])), reps=reps)


def main():
    from dustraytracer_tpu.ops.rng import seed_pixels
    from dustraytracer_tpu.render.integrator import (ray_sort_key,
                                                     render_sample,
                                                     shade_hits)
    from dustraytracer_tpu.ops.traverse_sweep import traverse_cluster_sweep
    from dustraytracer_tpu.scene import load_scene, make_camera
    from dustraytracer_tpu.scene.camera import generate_rays
    from dustraytracer_tpu.scene.settings import LightParams, RenderSettings

    scene_path = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/models/dense_monkey.glb"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    bounces = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    scene = load_scene(scene_path)
    camera = make_camera(position=(0, 1.5, 5), look_at=(0, 0.5, 0),
                         vfov_deg=45.0)
    settings = RenderSettings(bounces=bounces, enable_tonemap=False,
                              enable_gamma=False)
    lights = LightParams.from_settings(settings)
    W = H = size
    n = W * H
    print(f"scene={scene_path} tris={scene.tri_pos.shape[0]} "
          f"nodes={scene.cluster.n_nodes} size={W}x{H} b={bounces}")

    full = jax.jit(lambda f: render_sample(
        scene, camera, lights, f, width=W, height=H, settings=settings))
    dt = bench(full, jnp.uint32(3))
    rays = n * 2 * bounces
    print(f"full fwd sample:     {dt*1e3:8.2f} ms   "
          f"({rays/dt/1e6:6.2f} Mrays/s)")

    ids = jnp.arange(n, dtype=jnp.int32)
    rng = seed_pixels(ids.astype(jnp.uint32), jnp.uint32(0))
    _rng, o, d = generate_rays(camera, W, H, rng, pixel_ids=ids)

    # the payload-sort path _sorted_tracers actually uses: multi-operand
    # lax.sort moves the ray components with the key (no argsort+gather)
    @jax.jit
    def sortperm(o, d):
        key = ray_sort_key(scene.node_min[0], scene.node_max[0], o, d)
        r = jax.lax.sort(
            (key, o[:, 0], o[:, 1], o[:, 2],
             d[:, 0], d[:, 1], d[:, 2],
             jnp.arange(o.shape[0], dtype=jnp.int32)),
            dimension=0, num_keys=1)
        return (jnp.stack(r[1:4], axis=-1), jnp.stack(r[4:7], axis=-1),
                r[7])

    dt = bench(sortperm, o, d)
    print(f"ray payload-sort:    {dt*1e3:8.2f} ms   (per trace call)")

    os_, ds_, lane = sortperm(o, d)

    trav = jax.jit(lambda o, d: traverse_cluster_sweep(scene.cluster, o, d))
    dt = bench(trav, os_, ds_)
    print(f"traversal (sorted):  {dt*1e3:8.2f} ms   "
          f"({n/dt/1e6:6.2f} Mrays/s)")

    res = trav(os_, ds_)
    hit = res["hit_idx"]

    @jax.jit
    def unsort(res):
        out = jax.lax.sort(
            (lane, res["t"], res["hit_idx"], res["visits"]),
            dimension=0, num_keys=1)
        return {"t": out[1], "hit_idx": out[2], "visits": out[3]}

    dt = bench(unsort, res)
    print(f"inverse payload-sort:{dt*1e3:8.2f} ms   (per trace call)")

    for fetch in ("onehot", "gather"):
        sh = jax.jit(lambda o, d, h: shade_hits(scene, o, d, h, fetch))
        dt = bench(sh, o, d, hit)
        print(f"shade_hits {fetch:7s}: {dt*1e3:8.2f} ms   (per shade site)")


if __name__ == "__main__":
    main()
