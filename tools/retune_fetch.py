"""Re-measure the shade_fetch auto crossover after the round-5 traversal
speedups (K=32 + TILE=4096 + octant ordering).

The round-4 crossover rule (onehot <= 16384 tris, kernel for dense
12288-16384) was tuned when traversal dominated the frame. The round-5
closing profile (results/profile_cs16_dust_512_b2.json) showed the rule
inverted on cs16: at b=1 gather 22.0 ms vs onehot 25.9 — the O(rays x n)
one-hot fetch is now a larger share of a faster frame. This script
times the FULL forward sample (cross-dispatch delta, reps=4) for every
applicable fetch mode on the scenes near the old crossovers, at their
bench_scenes cameras/settings, and writes results/retune_fetch.json.

Usage: python tools/retune_fetch.py [scene.glb size bounces]...
Defaults to cs16_dust 512 b2 and dense_monkey 1024 b2 (the bench
configs whose auto pick is in question).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


DEFAULTS = [
    ("/root/reference/models/source/cs16_dust.glb", 512, 2),
    ("/root/reference/models/dense_monkey.glb", 1024, 2),
]


def main():
    from bench_scenes import CAMERAS
    from dustraytracer_tpu.render.integrator import (_resolve_fetch,
                                                     render_sample)
    from dustraytracer_tpu.scene import load_scene, make_camera
    from dustraytracer_tpu.scene.settings import LightParams, RenderSettings
    from dustraytracer_tpu.utils.roofline import delta_time_dispatch

    args = sys.argv[1:]
    jobs = ([(args[i], int(args[i + 1]), int(args[i + 2]))
             for i in range(0, len(args), 3)] if args else DEFAULTS)

    out = {"device": str(jax.devices()[0]), "scenes": []}
    for path, size, bounces in jobs:
        scene = load_scene(path)
        rel = os.path.relpath(path, "/root/reference/models")
        camera = make_camera(**CAMERAS[rel])
        n = int(scene.tri_pos.shape[0])
        rec = {"scene": rel, "tris": n, "size": size, "bounces": bounces,
               "modes_ms": {}}
        base = RenderSettings(bounces=bounces, enable_tonemap=False,
                              enable_gamma=False)
        rec["auto_resolves_to"] = _resolve_fetch(scene, base)
        print(f"== {rel} ({n} tris, {size}^2, b={bounces}) "
              f"auto->{rec['auto_resolves_to']!r}", flush=True)
        for mode in ("onehot", "gather", "kernel"):
            s = base.replace(shade_fetch=mode)
            try:
                _resolve_fetch(scene, s)  # raises if mode inapplicable
            except ValueError as e:
                print(f"  {mode}: inapplicable ({e})", flush=True)
                continue
            lights = LightParams.from_settings(s)
            f = jax.jit(lambda frame, s=s, lights=lights: jnp.sum(
                render_sample(scene, camera, lights, frame,
                              width=size, height=size, settings=s)))
            box = [0]

            def disp(f=f, box=box):
                box[0] += 1
                return f(jnp.uint32(box[0]))

            t = delta_time_dispatch(disp, float, reps=4)
            rec["modes_ms"][mode] = round(t * 1e3, 3)
            print(f"  {mode}: {t*1e3:8.2f} ms/sample", flush=True)
        out["scenes"].append(rec)

    dst = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "retune_fetch.json")
    with open(dst, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {dst}", flush=True)


if __name__ == "__main__":
    main()
