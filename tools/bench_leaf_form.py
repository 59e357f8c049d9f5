"""A/B the leaf intersection forms on-chip: Möller–Trumbore (VPU) vs
dual-basis plane rows (MXU dots + ~15-op VPU tail). Round-5 experiment
behind ops/traverse_sweep.LEAF_FORM.

Usage: python tools/bench_leaf_form.py [scene ...]
Writes results/leaf_form_bench.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT = ["suzanne_plane.glb", "dense_monkey.glb",
           "source/cs16_dust.glb", "valorant_katana.glb"]
SIZE = 512


def main():
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
    for name in (sys.argv[1:] or DEFAULT):
        path = f"/root/reference/models/{name}"
        scene = load_scene(path)
        rel = os.path.relpath(path, "/root/reference/models")
        campos = CAMERAS.get(rel, dict(position=(0, 1.5, 5),
                                       look_at=(0, 0.5, 0), vfov_deg=45.0))
        camera = make_camera(**campos)
        rng = seed_pixels(ids.astype(jnp.uint32), jnp.uint32(0))
        _r, o, d = generate_rays(camera, SIZE, SIZE, rng, pixel_ids=ids)
        o, d = jax.block_until_ready((o, d))
        got = {}
        for form in ("mt", "dual"):
            closest, _ = _sorted_tracers(
                scene,
                lambda oo, dd, cb=scene.cluster, f=form:
                    traverse_cluster_sweep(cb, oo, dd, leaf_form=f),
                lambda oo, dd, cb=scene.cluster, f=form:
                    traverse_cluster_sweep(cb, oo, dd, anyhit=True,
                                           leaf_form=f)["hit_idx"] >= 0)
            sec = device_seconds_per_call(
                lambda i: jnp.sum(closest(o + jnp.float32(i) * 1e-6,
                                          d)["t"]))
            res = jax.jit(lambda f=form: traverse_cluster_sweep(
                scene.cluster, o, d, leaf_form=f))()
            got[form] = (sec, np.asarray(res["hit_idx"]),
                         np.asarray(res["t"]))
            rows.append({"scene": os.path.basename(name), "form": form,
                         "closest_sorted_ms": round(sec * 1e3, 2),
                         "mrays_per_s": round(n / sec / 1e6, 2)})
            print(json.dumps(rows[-1]), flush=True)
        hm, hd = got["mt"][1], got["dual"][1]
        mask = hm >= 0
        agree = float((hm[mask] == hd[mask]).mean()) if mask.any() else 1.0
        tm, td = got["mt"][2][mask], got["dual"][2][mask]
        trel = float(np.abs(tm - td).max() / max(tm.max(), 1e-6))
        rows.append({"scene": os.path.basename(name), "form": "agree",
                     "hit_id_agree": round(agree, 5),
                     "max_t_rel": trel})
        print(json.dumps(rows[-1]), flush=True)

    with open("results/leaf_form_bench.json", "w") as f:
        json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
