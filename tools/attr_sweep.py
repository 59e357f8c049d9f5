"""Attribute the sweep kernel's wall time, term by term (VERDICT r2 #1).

The round-2 speed-of-light model priced the *union* of nodes the numpy
replay said a tile's rays visit. The kernel executes something different:
UNROLL-node windows starting at successive lane-minima (covering nodes no
lane is parked on), and the leaf matvec+Möller-Trumbore for every
window-covered leaf ANY lane enters. The kernel now counts its own
executed work exactly (out rows 3/4, ops/traverse_sweep.py), so the model
can price reality instead of an optimistic proxy.

This script itemizes, for a real workload:

    measured  ≈  n_tiles * FIXED  +  W * window_ns  +  L * leaf_ns

with FIXED / window_ns / leaf_ns calibrated from synthetic chain scenes
(always-enter internal chain -> window rate; always-enter leaf chain ->
leaf rate; tiny-m runs -> per-tile fixed intercept), and W / L read from
the kernel's own counters on the workload.

Usage: python tools/attr_sweep.py [scene.glb] [size] [--rays N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from dustraytracer_tpu.accel.cluster import ClusterBvh
    from dustraytracer_tpu.ops.rng import seed_pixels
    from dustraytracer_tpu.ops.traverse_sweep import (TILE, UNROLL,
                                                      traverse_cluster_sweep)
    from dustraytracer_tpu.render.integrator import ray_sort_key
    from dustraytracer_tpu.scene import load_scene, make_camera
    from dustraytracer_tpu.scene.camera import generate_rays

    scene_path = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/models/suzanne_plane.glb"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    scene = load_scene(scene_path)
    cb = scene.cluster
    k, c_pad = cb.k, cb.v0.shape[0]
    camera = make_camera(position=(0, 1.5, 5), look_at=(0, 0.5, 0),
                         vfov_deg=45.0)
    n = size * size
    ids = jnp.arange(n, dtype=jnp.int32)
    rng = seed_pixels(ids.astype(jnp.uint32), jnp.uint32(0))
    _rng, o, d = generate_rays(camera, size, size, rng, pixel_ids=ids)
    key = ray_sort_key(scene.node_min[0], scene.node_max[0], o, d)
    perm = jnp.argsort(key)
    o, d = o[perm], d[perm]
    n_tiles = -(-n // TILE)

    def timed(cb_, o_, d_, reps=8):
        """DEVICE time per dispatch via delta timing: wall(2R reps) -
        wall(R reps) cancels the ~15-25 ms fixed axon-tunnel latency a
        single host fetch pays (utils/roofline.py measure_peaks)."""
        f = jax.jit(lambda o, d: traverse_cluster_sweep(cb_, o, d))
        r = f(o_, d_)
        float(jnp.sum(r["t"]))  # compile+warm; host fetch = real fence

        def run(nrep):
            t0 = time.perf_counter()
            out = None
            for _ in range(nrep):
                out = f(o_, d_)
            float(jnp.sum(out["t"]))
            return time.perf_counter() - t0

        run(2)  # warm the dispatch pipeline
        best = float("inf")
        for _ in range(3):
            t1 = run(reps)
            t2 = run(2 * reps)
            best = min(best, (t2 - t1) / reps)
        return best, r

    # ---- measure the real workload + its executed counters ----
    t_meas, res = timed(cb, o, d)
    W = int(np.sum(np.asarray(res["exec_windows"])))
    L = int(np.sum(np.asarray(res["exec_leafs"])))
    print(f"scene={os.path.basename(scene_path)} tris={scene.tri_pos.shape[0]} "
          f"nodes={cb.n_nodes} k={k} c_pad={c_pad} rays={n} tiles={n_tiles}")
    print(f"measured: {t_meas*1e3:.3f} ms  ({n/t_meas/1e6:.1f} Mrays/s)")
    print(f"executed: windows={W} ({W/n_tiles:.1f}/tile) "
          f"leaf-substeps={L} ({L/n_tiles:.1f}/tile) "
          f"[UNROLL={UNROLL} -> {W*UNROLL/n_tiles:.1f} node-substeps/tile]")

    # ---- calibrate on synthetic chains (same k/c_pad) ----
    big = 1e30
    n_cal = 32 * TILE
    rngr = np.random.default_rng(0)
    oc = jnp.asarray(rngr.uniform(-1, 1, (n_cal, 3)).astype(np.float32))
    dc = jnp.asarray(rngr.normal(size=(n_cal, 3)).astype(np.float32))
    cal_tiles = n_cal // TILE

    def chain(m, leaf):
        node_min = np.full((m, 3), -big, np.float32)
        node_max = np.full((m, 3), big, np.float32)
        skip = np.arange(1, m + 1, dtype=np.int32)
        cluster = (np.zeros if leaf else
                   lambda s, t: np.full(s, -1, t))(m, np.int32)
        z3 = np.zeros((c_pad, k, 3), np.float32)
        return ClusterBvh(
            node_min=jnp.asarray(node_min), node_max=jnp.asarray(node_max),
            node_skip=jnp.asarray(skip), node_cluster=jnp.asarray(cluster),
            v0=jnp.asarray(z3), e1=jnp.asarray(z3), e2=jnp.asarray(z3),
            tri_idx=jnp.asarray(np.full((c_pad, k), -1, np.int32)),
            n_nodes=m, n_clusters=1, k=k)

    pts = {}
    for leaf in (False, True):
        for m in (8, 256, 512):
            t, r = timed(chain(m, leaf), oc, dc)
            w_ = int(np.sum(np.asarray(r["exec_windows"]))) / cal_tiles
            l_ = int(np.sum(np.asarray(r["exec_leafs"]))) / cal_tiles
            pts[(leaf, m)] = (t / cal_tiles, w_, l_)
            print(f"  chain leaf={int(leaf)} m={m:4d}: "
                  f"{t/cal_tiles*1e6:8.2f} us/tile  "
                  f"windows/tile={w_:.1f} leafs/tile={l_:.1f}")

    # window rate from the internal chain delta; leaf rate from the leaf
    # chain delta net of its window cost; fixed = intercept at m=8
    (t1, w1, _), (t2, w2, _) = pts[(False, 256)], pts[(False, 512)]
    window_ns = (t2 - t1) / max(w2 - w1, 1e-9) * 1e9
    (s1, lw1, l1), (s2, lw2, l2) = pts[(True, 256)], pts[(True, 512)]
    leaf_ns = ((s2 - s1) - (lw2 - lw1) * window_ns * 1e-9) \
        / max(l2 - l1, 1e-9) * 1e9
    t8, w8, l8 = pts[(False, 8)]
    fixed_us = (t8 - w8 * window_ns * 1e-9) * 1e6
    print(f"calibration: window_ns={window_ns:.0f} leaf_ns={leaf_ns:.0f} "
          f"fixed_us/tile={fixed_us:.2f}")

    # ---- itemize ----
    t_fixed = n_tiles * fixed_us * 1e-6
    t_win = W * window_ns * 1e-9
    t_leaf = L * leaf_ns * 1e-9
    model = t_fixed + t_win + t_leaf
    print("breakdown (model of measured):")
    for name, v in (("fixed/tile", t_fixed), ("windows", t_win),
                    ("leaf substeps", t_leaf)):
        print(f"  {name:14s} {v*1e3:8.3f} ms  ({100*v/t_meas:5.1f}% of "
              f"measured)")
    print(f"  model total    {model*1e3:8.3f} ms  ({100*model/t_meas:5.1f}% "
          f"of measured; residual = dispatch jitter + un-modeled terms)")


if __name__ == "__main__":
    main()
