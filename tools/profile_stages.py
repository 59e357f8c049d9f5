"""Stage-level timing breakdown of a render sample on the real TPU.

Covers BOTH passes (VERDICT r3 item 1: the fwd+bwd budget was never
committed): forward stages and the backward costs of each differentiable
fetch, plus the full fwd+bwd step for the two gradient workloads that
matter (materials/lights — the bench metric — and vertex positions).

All micro-stage timings use IN-GRAPH repetition (utils/roofline.py
device_seconds_per_call): N invocations inside one dispatch, slope
between two executables — cross-dispatch deltas through the axon tunnel
jitter by +-2 ms, which is larger than several whole stages. Every
stage sums ALL its outputs into the fence scalar so XLA cannot
dead-code-eliminate payload operands (the round-3 rewrite caught the
old script timing a 2-operand rump of the 8-operand payload sort).
The full-sample stages use cross-dispatch delta timing instead
(delta_time_dispatch) — in-graph x4 repetition of the fwd+bwd graph
multiplies its already-long XLA compile.

Stages:
  - full fwd sample; the same w/o sun NEE (difference = shadow-ray waves)
  - full fwd+bwd, grads w.r.t. (mat_albedo, mat_emissive, lights) — the
    bench.py workload
  - full fwd+bwd, grads w.r.t. tri_pos (vertex optimization: includes
    the in-graph cluster refit + the shade-phase scatter transpose)
  - raygen (RNG seed + camera rays)
  - payload sort (8-operand) and unsort (4-operand) lax.sort legs
  - traversal kernel (closest + anyhit) on the sorted primary wave
  - shade_hits fwd and its bwd w.r.t. tri_pos (the one-hot transpose =
    scatter-add matmul the r3 verdict suspected)
  - material+texture fetch fwd and its bwd w.r.t. (mat_albedo,
    float tex_stack) — the texture-gather VJP

Usage: python tools/profile_stages.py [scene.glb] [size] [bounces]
Writes results/profile_<scene>_<size>_b<bounces>.json and prints one
line per stage.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from dustraytracer_tpu.ops.rng import seed_pixels
    from dustraytracer_tpu.render.integrator import (_albedo,
                                                     _fetch_material,
                                                     ray_sort_key,
                                                     render_sample,
                                                     shade_hits)
    from dustraytracer_tpu.ops.traverse_sweep import traverse_cluster_sweep
    from dustraytracer_tpu.render.texture import decode_textures
    from dustraytracer_tpu.scene import load_scene, make_camera
    from dustraytracer_tpu.scene.camera import generate_rays
    from dustraytracer_tpu.scene.settings import LightParams, RenderSettings
    from dustraytracer_tpu.utils.roofline import (delta_time_dispatch,
                                                  device_seconds_per_call)

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
    name = os.path.basename(scene_path)
    print(f"scene={name} tris={scene.tri_pos.shape[0]} "
          f"nodes={scene.cluster.n_nodes} size={W}x{H} b={bounces}",
          flush=True)
    report = {"scene": name, "tris": int(scene.tri_pos.shape[0]),
              "size": [W, H], "bounces": bounces,
              "device": str(jax.devices()[0]), "stages_ms": {}}

    def t_of(call, n_lo=1, n_hi=4):
        return device_seconds_per_call(call, n_lo=n_lo, n_hi=n_hi,
                                       repeats=3)

    def stage(name, call, extra="", n_hi=4):
        # higher in-graph repetition for cheap stages: the wall-clock
        # noise of one dispatch (+-1-2 ms) divided by (n_hi - n_lo)
        # must sit well under the stage itself (r4: sorts measured
        # NEGATIVE at n_hi=4)
        t = t_of(call, n_hi=n_hi)
        report["stages_ms"][name] = round(t * 1e3, 3)
        print(f"{name:28s}: {t*1e3:8.2f} ms {extra}", flush=True)
        return t

    def stage_delta(name, dispatch, fence, extra=""):
        t = delta_time_dispatch(dispatch, fence, reps=4)
        report["stages_ms"][name] = round(t * 1e3, 3)
        print(f"{name:28s}: {t*1e3:8.2f} ms {extra}", flush=True)
        return t

    rays = n * 2 * bounces

    # --- full forward sample (cross-dispatch delta: in-graph repetition
    # would multiply the long fwd compile) ---
    fwd_j = jax.jit(lambda frame: jnp.sum(render_sample(
        scene, camera, lights, frame, width=W, height=H,
        settings=settings)))
    box = [0]

    def fdisp():
        box[0] += 1
        return fwd_j(jnp.uint32(box[0]))

    t_full = stage_delta("full fwd sample", fdisp, float,
                         extra=f"({rays/1e6:.2f} Mrays)")

    s_nosun = settings.replace(enable_sunlight=False)
    li_nosun = LightParams.from_settings(s_nosun)
    ns_j = jax.jit(lambda frame: jnp.sum(render_sample(
        scene, camera, li_nosun, frame, width=W, height=H,
        settings=s_nosun)))

    def nsdisp():
        box[0] += 1
        return ns_j(jnp.uint32(box[0]))

    t_nosun = stage_delta("  w/o sun NEE", nsdisp, float)
    print(f"  -> NEE waves cost {max(t_full - t_nosun, 0)*1e3:.2f} ms "
          f"({bounces} anyhit traces + sun shading)", flush=True)

    # fetch-mode comparison: what would the OTHER shading fetch cost?
    from dustraytracer_tpu.render.integrator import _resolve_fetch
    resolved = _resolve_fetch(scene, settings)
    report["resolved_fetch"] = resolved
    print(f"  (auto shade_fetch resolves to {resolved!r})", flush=True)
    for m in ("onehot", "kernel"):
        if m == resolved:
            continue
        if m == "kernel" and (scene.cluster is None
                              or scene.cluster.uv is None):
            continue
        if m == "onehot" and scene.tri_pos.shape[0] > 32768:
            continue  # O(rays x 90k) matmuls: pointless to measure
        try:
            s_alt = settings.replace(shade_fetch=m)
            alt_j = jax.jit(lambda frame, s_alt=s_alt: jnp.sum(
                render_sample(scene, camera, lights, frame,
                              width=W, height=H, settings=s_alt)))

            def adisp(alt_j=alt_j):
                box[0] += 1
                return alt_j(jnp.uint32(box[0]))

            stage_delta(f"full fwd (fetch={m})", adisp, float)
        except Exception as e:
            print(f"full fwd (fetch={m}) skipped: {e}", flush=True)

    # --- bounce scaling: marginal cost of one more path segment (the
    # incoherent bounce waves the isolated primary-wave stages miss) ---
    for b in sorted({1, max(1, bounces // 2)}):
        s_b = settings.replace(bounces=b)
        b_j = jax.jit(lambda frame, s_b=s_b: jnp.sum(render_sample(
            scene, camera, lights, frame, width=W, height=H,
            settings=s_b)))

        def bdisp(b_j=b_j):
            box[0] += 1
            return b_j(jnp.uint32(box[0]))

        stage_delta(f"full fwd b={b}", bdisp, float)

    # per-fetch-mode single-segment frames: the in-situ cost of the
    # shading fetch (isolated micro-stages showed ~0 for the one-hot
    # fetch, but in-graph fusion may differ inside the scan)
    for fm in ("onehot", "gather", "kernel"):
        try:
            s_f = settings.replace(bounces=1, shade_fetch=fm)
            f_j = jax.jit(lambda frame, s_f=s_f: jnp.sum(render_sample(
                scene, camera, lights, frame, width=W, height=H,
                settings=s_f)))

            def fdisp2(f_j=f_j):
                box[0] += 1
                return f_j(jnp.uint32(box[0]))

            stage_delta(f"full fwd b=1 fetch={fm}", fdisp2, float)
        except Exception as e:
            print(f"full fwd b=1 fetch={fm} skipped: {e}", flush=True)

    s_ns = settings.replace(ray_sort="off")
    ns2_j = jax.jit(lambda frame: jnp.sum(render_sample(
        scene, camera, lights, frame, width=W, height=H, settings=s_ns)))

    def ns2disp():
        box[0] += 1
        return ns2_j(jnp.uint32(box[0]))

    stage_delta("full fwd sort=off", ns2disp, float)

    # --- full fwd+bwd: the bench.py gradient workload ---
    def mat_loss(albedo, emissive, li, frame):
        sc = scene.replace(mat_albedo=albedo, mat_emissive=emissive)
        return jnp.mean(render_sample(sc, camera, li, frame,
                                      width=W, height=H, settings=settings))

    mat_grad = jax.jit(jax.value_and_grad(mat_loss, argnums=(0, 1, 2)))

    def mdisp():
        box[0] += 1
        return mat_grad(scene.mat_albedo, scene.mat_emissive, lights,
                        jnp.uint32(box[0]))

    t_mb = stage_delta("full fwd+bwd (mat+lights)", mdisp,
                       lambda o: float(o[0]))
    print(f"  -> bwd adds {max(t_mb - t_full, 0)*1e3:.2f} ms over fwd",
          flush=True)

    # --- full fwd+bwd w.r.t. vertex positions (includes cluster refit) ---
    from dustraytracer_tpu.accel.cluster import refit_cluster_bvh

    def vtx_loss(tri_pos, frame):
        sc = scene.replace(
            tri_pos=tri_pos,
            cluster=refit_cluster_bvh(scene.cluster, tri_pos))
        return jnp.mean(render_sample(sc, camera, lights, frame,
                                      width=W, height=H, settings=settings))

    vtx_grad = jax.jit(jax.value_and_grad(vtx_loss))

    def vdisp():
        box[0] += 1
        return vtx_grad(scene.tri_pos, jnp.uint32(box[0]))

    try:
        t_vb = stage_delta("full fwd+bwd (tri_pos)", vdisp,
                           lambda o: float(o[0]))
        print(f"  -> vertex bwd adds {max(t_vb - t_full, 0)*1e3:.2f} ms "
              "over fwd", flush=True)
    except Exception as e:
        print(f"full fwd+bwd (tri_pos) failed: {e}", flush=True)

    # --- micro-stages (in-graph repetition) ---
    ids = jnp.arange(n, dtype=jnp.int32)
    rng = seed_pixels(ids.astype(jnp.uint32), jnp.uint32(0))
    _r, o, d = generate_rays(camera, W, H, rng, pixel_ids=ids)

    stage("raygen", lambda i: jnp.sum(generate_rays(
        camera, W, H, seed_pixels(ids.astype(jnp.uint32), jnp.uint32(i)),
        pixel_ids=ids)[1]))

    key = ray_sort_key(scene.node_min[0], scene.node_max[0], o, d)
    perm = jnp.argsort(key)
    os_, ds_ = o[perm], d[perm]
    lane = jnp.arange(n, dtype=jnp.int32)

    def sort_call(i):
        out = jax.lax.sort(
            (key + i, o[:, 0], o[:, 1], o[:, 2],
             d[:, 0], d[:, 1], d[:, 2], lane),
            dimension=0, num_keys=1)
        # consume EVERY operand or XLA prunes them from the sort
        return sum(jnp.sum(x.astype(jnp.float32)) for x in out[1:])

    stage("payload sort 8op (/closest)", sort_call, n_hi=16)

    def unsort_call(i):
        out = jax.lax.sort(
            (lane + i, os_[:, 0] + jnp.float32(i), key.astype(jnp.float32),
             ds_[:, 0]),
            dimension=0, num_keys=1)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in out[1:])

    stage("payload unsort 4op", unsort_call, n_hi=16)

    stage("traversal closest (sorted)", lambda i: jnp.sum(
        traverse_cluster_sweep(scene.cluster, os_ + jnp.float32(i) * 1e-6,
                               ds_)["t"]), n_hi=8)
    stage("traversal anyhit (sorted)", lambda i: jnp.sum(
        traverse_cluster_sweep(scene.cluster, os_ + jnp.float32(i) * 1e-6,
                               ds_, anyhit=True)["t"]), n_hi=8)

    # composite: the REAL per-trace cost the integrator pays (sort +
    # kernel + unsort through _sorted_tracers)
    from dustraytracer_tpu.render.integrator import _sorted_tracers

    def mk_closest(oo, dd):
        return traverse_cluster_sweep(scene.cluster, oo, dd)

    def mk_anyhit(oo, dd):
        return traverse_cluster_sweep(scene.cluster, oo, dd,
                                      anyhit=True)["hit_idx"] >= 0

    sc_closest, sc_anyhit = _sorted_tracers(scene, mk_closest, mk_anyhit)
    stage("closest_sorted composite", lambda i: jnp.sum(
        sc_closest(o + jnp.float32(i) * 1e-6, d)["t"]), n_hi=8)
    stage("anyhit_sorted composite", lambda i: jnp.sum(
        sc_anyhit(o + jnp.float32(i) * 1e-6, d).astype(jnp.float32)),
        n_hi=8)

    res = jax.jit(lambda: traverse_cluster_sweep(scene.cluster, o, d))()
    hit = res["hit_idx"]

    # --- incoherent (bounce-1-like) wave: origins at the primary hit
    # points, directions uniform random — what segments 2..B actually
    # pay per trace ---
    hit_ok = hit >= 0
    o_b = jnp.where(hit_ok[:, None],
                    o + d * (res["t"] * 0.999)[:, None], 3.0e37)
    dn = np.random.default_rng(5).normal(size=(n, 3)).astype(np.float32)
    d_b = jnp.asarray(dn / np.linalg.norm(dn, axis=-1, keepdims=True))
    key_b = ray_sort_key(scene.node_min[0], scene.node_max[0], o_b, d_b)
    pb = jnp.argsort(key_b)
    ob_s, db_s = o_b[pb], d_b[pb]
    stage("traversal closest (bounce)", lambda i: jnp.sum(
        traverse_cluster_sweep(scene.cluster,
                               ob_s + jnp.float32(i) * 1e-6,
                               db_s)["t"]), n_hi=8)

    def sh_sum(sc, oo):
        return sum(jnp.sum(v.astype(jnp.float32))
                   for v in shade_hits(sc, oo, d, hit, "onehot").values())

    stage("shade_hits onehot fwd", lambda i: sh_sum(
        scene, o + jnp.float32(i) * 1e-6))

    # the one-hot transpose: scatter-add matmul over the triangle table
    sh_bwd = jax.grad(lambda tp, oo: sh_sum(scene.replace(tri_pos=tp), oo))
    stage("shade_hits bwd (tri_pos)", lambda i: jnp.sum(
        sh_bwd(scene.tri_pos, o + jnp.float32(i) * 1e-6)))

    sh = jax.jit(lambda: shade_hits(scene, o, d, hit, "onehot"))()
    mats, uv = sh["material"], sh["uv"]

    def fetch_sum(albedo, uvq):
        # albedo perturbation makes the one-hot table i-dependent so XLA
        # CSE cannot share the fetch across in-graph repeats (r3 advisor)
        sc = scene.replace(mat_albedo=albedo)
        return jnp.sum(_albedo(sc, _fetch_material(sc, mats, "onehot"), uvq))

    stage("material+texture fetch", lambda i: fetch_sum(
        scene.mat_albedo * (1.0 + jnp.float32(i) * 1e-9),
        uv + jnp.float32(i) * 1e-7))

    if scene.tex_stack.shape[0] > 0:
        fscene = decode_textures(scene)

        def tex_sum(stack, uvq):
            sc = fscene.replace(tex_stack=stack)
            return jnp.sum(_albedo(sc, _fetch_material(sc, mats, "onehot"),
                                   uvq))

        tex_bwd = jax.grad(tex_sum)
        stage("texture fetch bwd (stack)", lambda i: jnp.sum(
            tex_bwd(fscene.tex_stack * (1.0 + jnp.float32(i) * 1e-9),
                    uv + jnp.float32(i) * 1e-7)))

    os.makedirs("results", exist_ok=True)
    out = (f"results/profile_{os.path.splitext(name)[0]}"
           f"_{size}_b{bounces}.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
