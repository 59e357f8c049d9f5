"""Attribute the sweep kernel's wall time, term by term (VERDICT r2 #1).

Thin CLI over the one true model in utils/roofline.py:
`calibrate_sweep_rates` (in-graph-repetition timing of synthetic chain
scenes -> window / mixed-leaf / serial-leaf rates) and
`sweep_attribution` (measure a real sorted wave, price its executed
counters). Round 3 found cross-dispatch delta timing unusable for chain
calibration through the axon tunnel (negative deltas); the in-graph
method replaced it and this script was folded onto it.

Usage: python tools/attr_sweep.py [scene.glb] [size]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp

    from dustraytracer_tpu.ops.rng import seed_pixels
    from dustraytracer_tpu.ops.traverse_sweep import TILE, UNROLL
    from dustraytracer_tpu.render.integrator import ray_sort_key
    from dustraytracer_tpu.scene import load_scene, make_camera
    from dustraytracer_tpu.scene.camera import generate_rays
    from dustraytracer_tpu.utils.roofline import (calibrate_sweep_rates,
                                                  sweep_attribution)

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

    print(f"scene={os.path.basename(scene_path)} "
          f"tris={scene.tri_pos.shape[0]} nodes={cb.n_nodes} k={k} "
          f"c_pad={c_pad} rays={n} tiles={-(-n // TILE)} UNROLL={UNROLL}")

    rates = calibrate_sweep_rates(k=k, c_pad=c_pad)
    print(f"calibration: window_ns={rates['window_ns']:.0f} "
          f"leaf_ns={rates['leaf_ns']:.0f} "
          f"leaf_serial_ns={rates['leaf_serial_ns']:.0f}")

    attr = sweep_attribution(cb, o, d, rates=rates)
    t = attr["measured_s"]
    print(f"measured: {t*1e3:.3f} ms  ({attr['mrays_per_s']:.1f} Mrays/s)")
    print(f"executed: windows={attr['exec_windows']} "
          f"({attr['windows_per_tile']:.1f}/tile) "
          f"leaf-substeps={attr['exec_leafs']} "
          f"({attr['leafs_per_tile']:.1f}/tile)")
    print(f"model: {attr['model_s']*1e3:.3f} ms  "
          f"windows {attr['window_share_pct']:.1f}% / "
          f"leafs {attr['leaf_share_pct']:.1f}% of measured")
    print(f"sol_pct={attr['sol_pct']:.1f} (raw {attr['sol_raw_pct']:.1f}) "
          f"sol_mrays_per_s={attr['sol_mrays_per_s']:.1f}")


if __name__ == "__main__":
    main()
