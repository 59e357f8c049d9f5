"""The path integrator: a pure function over ray batches.

TPU-native re-design of the reference's per-thread megakernel `RayGen`
(`/root/reference/DustRayTracer/src/Core/Kernel/Shaders/RayGen.cuh:63-172`).
Instead of one divergent loop per pixel, the whole frame is a wavefront:
(N = H*W) rays advance together through a statically-unrolled bounce loop
with a live mask; every stage is a fused batch of VPU ops.

Semantics preserved from the reference (defaults) — each is a flag when
we deviate:
- gradient sky squared, scaled by sky_intensity (`RayGen.cuh:54-61`),
- throughput *= albedo / texture sample per bounce (`:110-118`),
- sun NEE: jittered un-normalized shadow direction toward a 2-angle sun
  position, *no* cosine term, contribution suncol * throughput (`:120-128`),
- diffuse bounce dir = surface normal + uniform-in-ball sample (`:133-134`),
- geometric (face) normals flipped toward the viewer (`ClosestHit.cuh:17-25`),
- debug view heads (`:136-161`),
- Uncharted2 + gamma applied per sample *before* accumulation
  (`RenderKernel.cu:29-31` averages post-processed colors; quirk kept for
  parity — the progressive average matches the reference's).

Differentiability: traversal returns discrete hit ids (stop-gradient);
every continuous quantity (hit point, barycentrics, normals, radiance) is
recomputed from those ids with differentiable math, so `jax.grad` flows
to materials, lights, camera, and vertex positions. The traversal
kernels run INLINE in the bounce scan as opaque custom_vjp selectors on
stop-gradient inputs — reverse-mode AD saves their outputs as residuals
and transposes only the shading math (one traversal + one shading pass
per sample, fwd or fwd+bwd).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from dustraytracer_tpu.ops.intersect import moller_trumbore, varying_zero
from dustraytracer_tpu.ops.rng import (random_float, random_in_ball,
                                       random_unit_vec3, seed_pixels)
from dustraytracer_tpu.ops.tonemap import gamma_correct, uncharted2_filmic
from dustraytracer_tpu.ops.traverse import traverse_anyhit, traverse_closest
from dustraytracer_tpu.render.texture import sample_texture
from dustraytracer_tpu.scene.camera import Camera, generate_rays
from dustraytracer_tpu.scene.settings import (DebugMode, LightParams,
                                              RenderMode, RenderSettings)


def _onehot_rows(idx, table):
    """Gather-free row fetch: onehot(idx) @ table on the MXU.

    TPU has no hardware gather — XLA serializes `table[idx]` into HBM
    loads (~5.5 ms for 262k rows on v5e), while the equivalent one-hot
    contraction runs in <1 ms. Precision HIGHEST so selecting f32 values
    by a 0/1 matrix is exact (default bf16 truncation would corrupt
    vertex positions). Differentiable in `table` (the transpose is a
    scatter-add matmul — this is how vertex gradients accumulate).
    """
    ids = jax.lax.broadcasted_iota(jnp.int32,
                                   (idx.shape[0], table.shape[0]), 1)
    oh = (ids == idx[:, None]).astype(jnp.float32)
    return jnp.dot(oh, table, precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)


def _resolve_fetch(scene, settings) -> str:
    """Static choice of shading attribute fetch: one-hot matmul vs gather
    vs in-kernel emission.

    One-hot work grows linearly in triangle count; per-lane gathers are
    ~flat. On v5e the crossover sits in the tens of thousands of rows, so
    one-hot wins for every bundled scene — the cap is a safety valve for
    huge soups. CPU (tests, sharding sim) keeps native gathers.
    "kernel" (explicit opt-in, see scene/settings.py) moves the whole
    triangle-attribute fetch into the sweep traversal kernel.
    """
    if settings.shade_fetch == "kernel":
        if settings.smooth_shading or settings.soft_edges > 0.0 \
                or settings.alpha_test:
            raise ValueError(
                "shade_fetch='kernel' is incompatible with "
                "smooth_shading/soft_edges/alpha_test (they need "
                "per-hit wavefront recomputation)")
        if scene.cluster is None or scene.cluster.uv is None:
            raise ValueError("shade_fetch='kernel' needs cluster "
                             "attribute tables (build_cluster_bvh uv/"
                             "face_nrm/mat)")
        return "kernel"
    if settings.shade_fetch != "auto":
        return settings.shade_fetch
    if jax.default_backend() == "cpu":
        return "gather"
    n = scene.tri_pos.shape[0]
    # Auto crossovers, re-measured round 4 under trustworthy timing
    # (the r3 numbers carried a phantom 2.5x delta corruption):
    #   - onehot wins up to ~12k tris (cs16 11.2k: fwd 16.2 vs 14.7
    #     Mrays/s kernel-fetch),
    #   - the in-kernel fetch wins for DENSE upper-mid scenes where the
    #     O(rays x n) one-hot starts to bite but the doubled leaf
    #     matvec doesn't (dense_monkey 15.7k: 26.8 vs 23.1),
    #   - gathers (packed single-row) win beyond the one-hot range
    #     (katana 90.7k: kernel-fetch loses 2x on paged leaves).
    # The kernel pick is gradient-safe since round 4 (_kernel_shade
    # custom VJP), so auto may take it for differentiated renders too.
    # Re-verified round 5 after the K=32/TILE=4096/octant traversal
    # speedups (tools/retune_fetch.py, results/retune_fetch.json): at
    # the BENCH settings (b=2) the picks still hold — cs16 onehot 65.5
    # vs gather 69.5 vs kernel 72.9 ms/sample, dense_monkey kernel
    # 152.9 vs onehot 176.7 vs gather 197.0. The b=1 profile reading
    # where gather beat onehot on cs16 (21.97 vs 25.86 ms,
    # profile_cs16_dust_512_b2.json) does NOT generalize: bounce waves
    # re-use the one-hot row products while per-lane gathers pay full
    # price per wave.
    if (12288 <= n <= 16384
            and scene.cluster is not None and scene.cluster.uv is not None
            and not (settings.smooth_shading or settings.soft_edges > 0.0
                     or settings.alpha_test)
            and settings.traversal in ("auto", "sweep")
            and scene.cluster.n_clusters * scene.cluster.k
            > settings.brute_max_tris):
        return "kernel"
    return "onehot" if n <= 16384 else "gather"


def _mat_fetch(fetch: str) -> str:
    """Material-table fetch mode: ALWAYS one-hot on TPU, whatever the
    triangle fetch uses. Material tables are tiny (tens of rows), so
    the one-hot matmul is cheap forward — and its TRANSPOSE is a small
    matmul, where the gather VJP is a rays-count serialized scatter:
    katana's albedo gradients paid +12.7 ms/sample for exactly that
    (results/katana_bwd_probe.log: fwd 42.2, bwd+scalar 42.7,
    bwd+albedo 54.9 before this change). CPU keeps native gathers."""
    del fetch
    return "gather" if jax.default_backend() == "cpu" else "onehot"


def _closed_hit_attrs(tri_pos, tri_uv, tri_face_nrm, origin, direction,
                      hit_idx):
    """Closed-form (t, u, v, normal, uv) for the SELECTED triangles via
    per-lane gathers — the differentiable recompute behind the kernel
    fetch's custom VJP (_kernel_shade). Matches the gather branch of
    shade_hits exactly (same sanitization, same orientation rule)."""
    ok = hit_idx >= 0
    safe = jnp.maximum(hit_idx, 0)
    v0 = tri_pos[safe, 0]
    v1 = tri_pos[safe, 1]
    v2 = tri_pos[safe, 2]
    _valid, t, u, v = moller_trumbore(origin, direction, v0, v1, v2)
    t = jnp.where(ok, t, 1.0)
    u = jnp.where(ok, u, 0.3)
    v = jnp.where(ok, v, 0.3)
    w = 1.0 - u - v
    raw_n = jnp.cross(v1 - v0, v2 - v0)
    raw_n = raw_n / jnp.maximum(
        jnp.linalg.norm(raw_n, axis=-1, keepdims=True), 1e-20)
    face_ref = tri_face_nrm[safe]
    orient = jnp.sum(jax.lax.stop_gradient(raw_n) * face_ref, axis=-1)
    face_n = raw_n * jax.lax.stop_gradient(jnp.sign(orient))[:, None]
    d_norm = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
    front = jnp.sum(face_n * d_norm, axis=-1) <= 0.0
    normal = jnp.where(front[:, None], face_n, -face_n)
    uv0 = tri_uv[safe, 0]
    uv1 = tri_uv[safe, 1]
    uv2 = tri_uv[safe, 2]
    uv = w[:, None] * uv0 + u[:, None] * uv1 + v[:, None] * uv2
    return t, u, v, normal, uv


@jax.custom_vjp
def _kernel_shade(tri_pos, tri_uv, tri_face_nrm, origin, direction,
                  hit_idx, kt, ku, kv, kuv, kfn):
    """Differentiable hit attributes whose PRIMAL comes straight from
    the sweep kernel's in-kernel emission (kt/ku/kv/kuv/kfn — zero
    wavefront triangle fetch), and whose VJP recomputes the closed-form
    Möller–Trumbore solution for the selected triangles by per-lane
    gather (_closed_hit_attrs) and pulls cotangents through it.

    This is what makes shade_fetch='kernel' gradient-complete (VERDICT
    r3 item 1/4: the r3 version stop-gradiented hit geometry, silently
    zeroing vertex gradients). The gathers live ONLY in the backward
    graph, so callers that differentiate just materials/lights/textures
    never pay them (XLA DCE removes cotangent chains that reach no
    differentiated input); vertex/camera differentiation pays one gather
    set per shade site — in bwd only, where the wavefront one-hot fetch
    would cost O(rays x tris) in BOTH passes.
    """
    ok = hit_idx >= 0
    t = jnp.where(ok, kt, 1.0)
    u = jnp.where(ok, ku, 0.3)
    v = jnp.where(ok, kv, 0.3)
    d_norm = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
    front = jnp.sum(kfn * d_norm, axis=-1) <= 0.0
    normal = jnp.where(front[:, None], kfn, -kfn)
    return t, u, v, normal, kuv


def _kernel_shade_fwd(tri_pos, tri_uv, tri_face_nrm, origin, direction,
                      hit_idx, kt, ku, kv, kuv, kfn):
    out = _kernel_shade(tri_pos, tri_uv, tri_face_nrm, origin, direction,
                        hit_idx, kt, ku, kv, kuv, kfn)
    return out, (tri_pos, tri_uv, tri_face_nrm, origin, direction,
                 hit_idx, kt, ku, kv, kuv, kfn)


def _kernel_shade_bwd(res, g):
    import numpy as np

    (tri_pos, tri_uv, tri_face_nrm, origin, direction, hit_idx,
     kt, ku, kv, kuv, kfn) = res
    _, pull = jax.vjp(
        lambda tp, tu, o, d: _closed_hit_attrs(tp, tu, tri_face_nrm,
                                               o, d, hit_idx),
        tri_pos, tri_uv, origin, direction)
    g_tp, g_tu, g_o, g_d = pull(g)
    f0 = np.zeros(hit_idx.shape, jax.dtypes.float0)
    zl = jnp.zeros_like
    return (g_tp, g_tu, zl(tri_face_nrm), g_o, g_d, f0,
            zl(kt), zl(ku), zl(kv), zl(kuv), zl(kfn))


_kernel_shade.defvjp(_kernel_shade_fwd, _kernel_shade_bwd)


def _shade_from_kernel(scene, origin, direction, hit_idx, rec):
    """shade_hits equivalent assembled from the sweep kernel's emitted
    attributes (rec: t/u/v/uv/face_nrm/mat arrays), gradient-complete
    via _kernel_shade's closed-form backward recompute. front_face stays
    a discrete decision read off the kernel's oriented normal."""
    t, u, v, normal, uv = _kernel_shade(
        scene.tri_pos, scene.tri_uv, scene.tri_face_nrm, origin,
        direction, hit_idx, rec["t"], rec["u"], rec["v"], rec["uv"],
        rec["face_nrm"])
    w = 1.0 - u - v
    d_norm = jax.lax.stop_gradient(
        direction / jnp.linalg.norm(direction, axis=-1, keepdims=True))
    front = jnp.sum(rec["face_nrm"] * d_norm, axis=-1) <= 0.0
    return {
        "t": t, "bary": jnp.stack([w, u, v], axis=-1),
        "world_position": origin + direction * t[:, None],
        "normal": normal, "uv": uv,
        "material": rec["mat"], "front_face": front,
    }


def _fetch_material(scene, mats, fetch: str):
    """Per-ray material attributes (albedo, tex id, emissive, metallic,
    roughness, transmission, ior) in one fused fetch (one one-hot matmul
    or 7 gathers)."""
    if fetch == "onehot":
        tab = jnp.concatenate(
            [scene.mat_albedo, scene.mat_emissive,
             scene.mat_metallic[:, None], scene.mat_roughness[:, None],
             scene.mat_albedo_tex.astype(jnp.float32)[:, None],
             scene.mat_transmission[:, None], scene.mat_ior[:, None]],
            axis=1)
        rows = _onehot_rows(mats, tab)
        return {"albedo": rows[:, 0:3], "emissive": rows[:, 3:6],
                "metallic": rows[:, 6], "roughness": rows[:, 7],
                "tex": rows[:, 8].astype(jnp.int32),
                "transmission": rows[:, 9], "ior": rows[:, 10]}
    # ONE packed row gather instead of 7 channel gathers: per-lane
    # gathers price per GATHER OP, not per byte (same lesson as the
    # packed-texel fetch, tools/bench_texture_fetch.py)
    tab = jnp.concatenate(
        [scene.mat_albedo, scene.mat_emissive,
         scene.mat_metallic[:, None], scene.mat_roughness[:, None],
         scene.mat_albedo_tex.astype(jnp.float32)[:, None],
         scene.mat_transmission[:, None], scene.mat_ior[:, None]],
        axis=1)
    rows = tab[mats]
    return {"albedo": rows[:, 0:3], "emissive": rows[:, 3:6],
            "metallic": rows[:, 6], "roughness": rows[:, 7],
            "tex": rows[:, 8].astype(jnp.int32),
            "transmission": rows[:, 9], "ior": rows[:, 10]}


def shade_hits(scene, origin, direction, hit_idx, fetch: str = "gather",
               smooth: bool = False):
    """Differentiable hit attributes from discrete hit ids.

    Recomputes the Möller–Trumbore solution for the *selected* triangle so
    t/u/v (and everything downstream) differentiate w.r.t. vertices and
    rays, while the selection itself stays discrete. Returns a dict with
    world_position, normal (geometric viewer-facing per `ClosestHit.cuh:
    17-25`, or barycentric-interpolated vertex normals with smooth=True),
    shading uv, barycentrics, material id, front_face.

    fetch="onehot" replaces the per-lane gathers with ONE one-hot
    matmul over a fused attribute table (see _onehot_rows).
    """
    safe = jnp.maximum(hit_idx, 0)
    corner_nrm = None
    if fetch == "onehot":
        t_n = scene.tri_pos.shape[0]
        cols = [scene.tri_pos.reshape(t_n, 9),
                scene.tri_face_nrm,
                scene.tri_uv.reshape(t_n, 6),
                scene.tri_mat.astype(jnp.float32)[:, None]]
        if smooth:
            cols.append(scene.tri_nrm.reshape(t_n, 9))
        rows = _onehot_rows(safe, jnp.concatenate(cols, axis=1))
        v0, v1, v2 = rows[:, 0:3], rows[:, 3:6], rows[:, 6:9]
        face_nrm = rows[:, 9:12]
        uv0, uv1, uv2 = rows[:, 12:14], rows[:, 14:16], rows[:, 16:18]
        mat = rows[:, 18].astype(jnp.int32)
        if smooth:
            corner_nrm = rows[:, 19:28].reshape(-1, 3, 3)
    else:
        # ONE packed row gather (19 or 28 f32) instead of ~9 separate
        # slice gathers — per-lane gathers on TPU cost per gather OP,
        # so fusing the whole per-triangle record into one row halves
        # big-scene (gather-fetch) frames; gradients flow back through
        # the concat's split (scatter into each source table).
        t_n = scene.tri_pos.shape[0]
        cols = [scene.tri_pos.reshape(t_n, 9), scene.tri_face_nrm,
                scene.tri_uv.reshape(t_n, 6),
                scene.tri_mat.astype(jnp.float32)[:, None]]
        if smooth:
            cols.append(scene.tri_nrm.reshape(t_n, 9))
        rows = jnp.concatenate(cols, axis=1)[safe]
        v0, v1, v2 = rows[:, 0:3], rows[:, 3:6], rows[:, 6:9]
        face_nrm = rows[:, 9:12]
        uv0, uv1, uv2 = rows[:, 12:14], rows[:, 14:16], rows[:, 16:18]
        mat = rows[:, 18].astype(jnp.int32)
        if smooth:
            corner_nrm = rows[:, 19:28].reshape(-1, 3, 3)
    _valid, t, u, v = moller_trumbore(origin, direction, v0, v1, v2)
    # Sanitize miss lanes: their MT solution is garbage (possibly ±inf),
    # and infinities poison gradients even through masked-out branches
    # (transpose rule: 0 cotangent * inf = NaN). Callers still mask by
    # hit_idx >= 0 for correctness; this only makes the dead lanes finite.
    ok = hit_idx >= 0
    t = jnp.where(ok, t, 1.0)
    u = jnp.where(ok, u, 0.3)
    v = jnp.where(ok, v, 0.3)
    w = 1.0 - u - v

    world_pos = origin + direction * t[:, None]
    # Geometric normal recomputed from the (differentiable) vertex
    # positions so vertex gradients flow through shading; the ingest-time
    # orientation rule (Scene.cu:270-302) is applied as a stop-gradiented
    # sign against the precomputed face normal.
    raw_n = jnp.cross(v1 - v0, v2 - v0)
    raw_n = raw_n / jnp.maximum(
        jnp.linalg.norm(raw_n, axis=-1, keepdims=True), 1e-20)
    orient = jnp.sum(jax.lax.stop_gradient(raw_n) * face_nrm, axis=-1)
    face_n = raw_n * jax.lax.stop_gradient(jnp.sign(orient))[:, None]
    d_norm = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
    front = jnp.sum(face_n * d_norm, axis=-1) <= 0.0
    normal = jnp.where(front[:, None], face_n, -face_n)
    if smooth:
        # barycentric-interpolated vertex normals (smooth shading), still
        # flipped toward the viewer; falls back to the geometric normal
        # where the interpolated one degenerates
        sm = (w[:, None] * corner_nrm[:, 0] + u[:, None] * corner_nrm[:, 1]
              + v[:, None] * corner_nrm[:, 2])
        ln = jnp.linalg.norm(sm, axis=-1, keepdims=True)
        sm = jnp.where(ln > 1e-8, sm / jnp.maximum(ln, 1e-20), normal)
        flip = jnp.sum(sm * d_norm, axis=-1) > 0.0
        normal = jnp.where(flip[:, None], -sm, sm)

    uv = w[:, None] * uv0 + u[:, None] * uv1 + v[:, None] * uv2
    return {
        "t": t, "bary": jnp.stack([w, u, v], axis=-1),
        "world_position": world_pos, "normal": normal, "uv": uv,
        "material": mat, "front_face": front,
    }


def _bary_min(bary):
    """min over the last axis as a pairwise `minimum` chain.

    NOT jnp.min: the reduce-min JVP divides by the count of elements
    equal to the reduced answer, and inside lax.scan XLA's fusion can
    rematerialize w = 1-u-v with different rounding between the reduce
    and the equality match — zero matches -> 0/0 -> NaN tangents
    (observed on CPU XLA, jax 0.9). Pairwise minimum JVP selects per
    pair and has no count division.
    """
    return jnp.minimum(jnp.minimum(bary[..., 0], bary[..., 1]),
                       bary[..., 2])


def _sky(direction, lights: LightParams):
    """Gradient sky (`RayGen.cuh:54-61`): lerp(white, sky_color) by
    0.5*(1+dir.y), squared."""
    d = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
    g = 0.5 * (1.0 + d[:, 1])
    col = (1.0 - g)[:, None] * jnp.ones(3) + g[:, None] * lights.sky_color
    return col * col


def _albedo(scene, mat_attrs, uv, bilinear=False):
    tex = mat_attrs["tex"]
    flat = mat_attrs["albedo"]
    sampled = sample_texture(scene, tex, uv, bilinear=bilinear)
    return jnp.where((tex >= 0)[:, None], sampled, flat)


def _alpha_retrace_tracers(scene, fast_closest, rounds: int):
    """Alpha-cutout AnyHit (`AnyHit.cuh:8-28`) on the cluster fast path.

    The Pallas/cluster kernels are alpha-blind (their tables carry only
    geometry), so cutout is lifted to the wavefront level: trace, sample
    the albedo-texture alpha at each hit, and RE-TRACE rays whose hit was
    transparent from just past it. A `while_loop` exits as soon as every
    ray has an opaque hit or a miss — typical alpha scenes settle in 1-2
    rounds, so the fast kernel still wins over the gather walk by a wide
    margin. Rays still unresolved after `rounds` re-traces count as
    misses (bounded worst case; the reference's stack walk has no such
    bound but also no guarantee against adversarial stacks of cutouts).
    """
    from dustraytracer_tpu.ops.traverse import _sample_alpha

    def _alpha_at(o, d, hit_idx):
        safe = jnp.maximum(hit_idx, 0)
        v0 = scene.tri_pos[safe, 0]
        v1 = scene.tri_pos[safe, 1]
        v2 = scene.tri_pos[safe, 2]
        _ok, _t, u, v = moller_trumbore(o, d, v0, v1, v2)
        w = 1.0 - u - v
        uv = (w[:, None] * scene.tri_uv[safe, 0]
              + u[:, None] * scene.tri_uv[safe, 1]
              + v[:, None] * scene.tri_uv[safe, 2])
        tex = scene.mat_albedo_tex[scene.tri_mat[safe]]
        return _sample_alpha(scene, tex, uv)

    big = 3.4e38

    def _loop(o, d):
        def cond(carry):
            rnd, _o, _off, _idx, _t, _vis, done = carry
            return jnp.logical_and(rnd < rounds, ~jnp.all(done))

        def body(carry):
            rnd, cur_o, off, idx, tt, vis, done = carry
            r = fast_closest(cur_o, d)
            hit = r["hit_idx"] >= 0
            alpha = _alpha_at(cur_o, d, r["hit_idx"])
            accept = hit & (alpha >= 1.0)
            live = ~done
            take = live & accept
            idx = jnp.where(take, r["hit_idx"], idx)
            tt = jnp.where(take, off + r["t"], tt)
            vis = vis + jnp.where(live, r["visits"], 0)
            # restart transparent rays just past the rejected hit. The
            # epsilon trades off two failure modes: too small re-hits
            # the same triangle (harmless — the re-hit resolves to t≈0
            # < MT's 1e-6 cutoff and is skipped next round), too large
            # skips opaque geometry nearly coincident with the cutout
            # (wrong hit). Keep it tight; exact coincidences remain
            # traversal-order-defined, as in the reference.
            adv = r["t"] * (1.0 + 1e-5) + 1e-5
            transparent = live & hit & ~accept
            cur_o = jnp.where(transparent[:, None],
                              cur_o + d * adv[:, None], cur_o)
            off = off + jnp.where(transparent, adv, 0.0)
            done = done | (live & (accept | ~hit))
            return rnd + 1, cur_o, off, idx, tt, vis, done

        vz = varying_zero(o)  # vma-consistent carry init under shard_map
        vzi = vz.astype(jnp.int32)
        init = (jnp.int32(0), o, vz,
                vzi - 1, big + vz,
                vzi, vz != 0.0)
        _, _, _, idx, tt, vis, _ = jax.lax.while_loop(cond, body, init)
        stop = jax.lax.stop_gradient
        return {"hit_idx": stop(idx), "t": stop(tt), "visits": stop(vis)}

    def closest(o, d):
        return _loop(o, d)

    def anyhit(o, d):
        return _loop(o, d)["hit_idx"] >= 0

    return closest, anyhit


def ray_sort_key(lo, hi, o, d):
    """(octant, origin-Morton) traversal-coherence key; see
    _sorted_tracers. Module-level so the roofline model
    (utils/roofline.py) reproduces the exact tile composition."""
    inv_ext = 1.0 / jnp.maximum(hi - lo, 1e-12)

    def _spread3(x):  # low 10 bits -> every 3rd bit (Morton interleave)
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    octant = ((d[:, 0] < 0).astype(jnp.int32) * 4
              + (d[:, 1] < 0).astype(jnp.int32) * 2
              + (d[:, 2] < 0).astype(jnp.int32))
    q = jnp.clip((o - lo) * inv_ext, 0.0, 1.0)
    q = (q * 31.0).astype(jnp.int32)  # 5 bits per axis
    morton = (_spread3(q[:, 0]) * 4 + _spread3(q[:, 1]) * 2
              + _spread3(q[:, 2]))
    return octant * (1 << 15) + morton


def _sorted_tracers(scene, closest, anyhit):
    """Ray sorting: traverse in (direction-octant, origin-Morton) order.

    The sweep kernel's per-tile cost is the union of BVH nodes its
    lanes touch, so incoherent bounce rays are its worst case. Sorting
    rays before traversal packs similar rays into the same tile (the
    wavefront analog of the GPU's warp-coherence from spatial locality);
    results are restored to ray order, so this wrapper is invisible to
    callers. Key = 3-bit octant + 15-bit Morton code of the origin in
    scene-bbox coordinates.

    Both permutations ride multi-operand `lax.sort`: the sort network
    moves the ray components along with the key, and the inverse is a
    second sort keyed by the original lane index. TPU has no hardware
    gather, so the obvious argsort + `rows[perm]` / `rows[inv]`
    formulation serializes into per-row HBM loads — measured 25.6 ms +
    48.9 ms per million rays on v5e vs 8.7 ms + 7.6 ms for the payload
    sorts (tools/bench_permute.py), a 4.6x round-trip win that removed
    ~35% of dense-scene frame time.

    Traversal results are stop-gradiented discrete decisions and the
    tracer inputs are stop-gradient at the _make_tracers boundary, so
    no sort needs a gradient path.
    """
    lo = scene.node_min[0]
    hi = scene.node_max[0]

    def _sort_rays(o, d):
        n = o.shape[0]
        key = jax.lax.stop_gradient(ray_sort_key(lo, hi, o, d))
        o = jax.lax.stop_gradient(o)
        d = jax.lax.stop_gradient(d)
        r = jax.lax.sort(
            (key, o[:, 0], o[:, 1], o[:, 2],
             d[:, 0], d[:, 1], d[:, 2],
             jnp.arange(n, dtype=jnp.int32)),
            dimension=0, num_keys=1)
        return (jnp.stack(r[1:4], axis=-1), jnp.stack(r[4:7], axis=-1),
                r[7])

    def closest_sorted(o, d):
        os_, ds_, lane = _sort_rays(o, d)
        r = closest(os_, ds_)
        keys = ["t", "hit_idx", "visits"]
        if "u" in r:  # kernel-emitted shading attributes ride along
            keys += ["u", "v", "mat"]
            ops = [r[k] for k in keys] + [
                r["uv"][:, 0], r["uv"][:, 1],
                r["face_nrm"][:, 0], r["face_nrm"][:, 1],
                r["face_nrm"][:, 2]]
            out = jax.lax.sort((lane, *ops), dimension=0, num_keys=1)
            res = dict(zip(keys, out[1:1 + len(keys)]))
            res["uv"] = jnp.stack(out[1 + len(keys):3 + len(keys)],
                                  axis=-1)
            res["face_nrm"] = jnp.stack(out[3 + len(keys):6 + len(keys)],
                                        axis=-1)
            return res
        out = jax.lax.sort(
            (lane, r["t"], r["hit_idx"], r["visits"]),
            dimension=0, num_keys=1)
        return {"t": out[1], "hit_idx": out[2], "visits": out[3]}

    def anyhit_sorted(o, d):
        os_, ds_, lane = _sort_rays(o, d)
        occ = anyhit(os_, ds_)
        out = jax.lax.sort((lane, occ.astype(jnp.int32)),
                           dimension=0, num_keys=1)
        return out[1] != 0

    return closest_sorted, anyhit_sorted


def _make_tracers(scene, settings: RenderSettings):
    """Pick the traversal backend (static decision, traced once).

    cluster (gather-free one-hot MXU walk) when the scene carries cluster
    tables and the mode allows; threaded gather walk otherwise
    (alpha-test needs per-hit texture fetches the cluster tables don't
    carry — lifted onto the fast path via re-trace below). Vertex
    optimization stays on the fast path too: apply_params re-bakes the
    cluster tables from live tri_pos (accel/cluster.py
    refit_cluster_bvh).
    """
    from dustraytracer_tpu.ops.traverse_brute import traverse_brute
    from dustraytracer_tpu.ops.traverse_cluster import traverse_cluster
    from dustraytracer_tpu.ops.traverse_sweep import traverse_cluster_sweep

    use_cluster = (scene.cluster is not None
                   and settings.traversal != "gather")
    if settings.traversal in ("cluster", "brute", "sweep") \
            and scene.cluster is None:
        raise ValueError(f"settings.traversal={settings.traversal!r} but the "
                         "scene was built without cluster tables "
                         "(cluster_k=None)")
    # Tiny scenes: skip the BVH entirely — all-pairs brute force is one
    # fused XLA loop with none of the walk kernels' per-tile dispatch
    # overhead (ops/traverse_brute.py). n_clusters*k upper-bounds the
    # real triangle count and is static.
    use_brute = use_cluster and (
        settings.traversal == "brute"
        or (settings.traversal == "auto"
            and scene.cluster.n_clusters * scene.cluster.k
            <= settings.brute_max_tris))
    # The fused min-sweep Pallas kernel is the fast path on real TPUs
    # (work ∝ nodes the tile's rays touch; node tables page through SMEM
    # past MAX_SMEM_NODES, so there is no scene-size ceiling). The XLA
    # cluster walk serves CPU (tests/sharding sim); ops/traverse_pallas'
    # one-hot kernel remains available as an explicit alternate backend.
    on_cpu = jax.default_backend() == "cpu"
    use_sweep = (use_cluster and not use_brute
                 and (not on_cpu or settings.traversal == "sweep"))
    emit = settings.shade_fetch == "kernel"
    if emit and not use_sweep:
        raise ValueError("shade_fetch='kernel' requires the sweep "
                         "traversal backend (settings.traversal='sweep' "
                         "to force it on CPU, interpret mode)")
    if use_brute:
        def closest(o, d):
            return traverse_brute(scene.cluster, o, d)

        def anyhit(o, d):
            return traverse_brute(scene.cluster, o, d,
                                  anyhit=True)["hit_idx"] >= 0
    elif use_sweep:
        def closest(o, d):
            return traverse_cluster_sweep(scene.cluster, o, d,
                                          interpret=on_cpu,
                                          emit_attrs=emit)

        def anyhit(o, d):
            r = traverse_cluster_sweep(scene.cluster, o, d, anyhit=True,
                                       interpret=on_cpu)
            return r["hit_idx"] >= 0
    elif use_cluster:
        def closest(o, d):
            return traverse_cluster(scene.cluster, o, d)

        def anyhit(o, d):
            r = traverse_cluster(scene.cluster, o, d, anyhit=True)
            return r["hit_idx"] >= 0
    else:
        def closest(o, d):
            return traverse_closest(scene, o, d,
                                    alpha_test=settings.alpha_test)

        def anyhit(o, d):
            return traverse_anyhit(scene, o, d,
                                   alpha_test=settings.alpha_test)

    # sort whenever the sweep kernel runs: even a 31-node scene
    # (suzanne) measures 21% faster frames sorted — the dead-lane
    # parking only packs terminated rays into instantly-finishing tiles
    # when the sort clusters them (round-3 ablation: b4 frame 64.9 ->
    # 51.4 ms with sort forced on vs the old >=128-node auto rule)
    sort = settings.ray_sort == "on" or (
        settings.ray_sort == "auto" and use_sweep)
    if sort:
        closest, anyhit = _sorted_tracers(scene, closest, anyhit)
    if use_cluster and settings.alpha_test:
        # cutout via re-trace keeps alpha scenes on the fast kernels
        # (each re-trace round re-sorts, which only helps)
        closest, anyhit = _alpha_retrace_tracers(
            scene, closest, rounds=settings.alpha_rounds)

    # Tracers run INSIDE the differentiable bounce scan (round 4: the
    # separate trace/shade phases are gone — see render_pixels), so cut
    # input tangents at this boundary: every backend is a stop-gradient
    # discrete selector, but the gather/brute walks and the alpha
    # re-trace use lax.while_loop, which has no JVP — a live tangent on
    # origin would make linearization throw (and the sweep kernel's inf
    # sentinels would 0*inf-poison tangents that did flow).
    def _sg_in(f):
        def g(o, d):
            return f(jax.lax.stop_gradient(o), jax.lax.stop_gradient(d))
        return g

    return _sg_in(closest), _sg_in(anyhit)


def _segment(scene, lights, settings: RenderSettings, tracers, carry,
             bounce_idx):
    """One path segment for all rays (the bounce-scan body).

    Single-phase (round 4): the traversal kernels run inline. They are
    opaque custom_vjp discrete selectors fed stop-gradient inputs
    (_make_tracers), so under reverse-mode AD their outputs become scan
    residuals — the transpose covers only the differentiable shading
    math around them, and traversal+shading each run exactly once per
    sample (the old trace-then-replay split computed the full shading
    chain twice).
    """
    origin, direction, throughput, light, alive, rng = carry
    fetch = _resolve_fetch(scene, settings)
    sun_pos = lights.sun_position()
    sun_col = lights.sun_color * lights.sun_intensity

    kernel_mode = fetch == "kernel"
    trace_closest, trace_anyhit = tracers
    # park DEAD lanes far outside the scene so their walks terminate
    # at the root test (~1 node step). Their results are ignored
    # downstream (masked by `alive`), and the ray sort clusters the
    # parked origins into tiles that finish instantly — without this,
    # terminated paths keep paying full traversal every bounce.
    o_live = jnp.where(alive[:, None], origin, 3.0e37)
    res = trace_closest(o_live, direction)
    hit_idx = jnp.where(alive, res["hit_idx"], -1)
    krec = {k: res[k] for k in ("t", "u", "v", "uv", "face_nrm",
                                "mat")} if kernel_mode else None

    # --- soft-edge visibility (boundary-term gradients) ---
    # Near a triangle edge the hard hit/miss decision hides the visibility
    # derivative from AD. One extra closest-hit trace from just past each
    # hit finds what is BEHIND it, then the edge becomes differentiable
    # with the estimator matched to the backing:
    #  * environment-backed (continuation misses): DETERMINISTIC blend —
    #    light += (1-sigma) * sky, throughput *= sigma. Zero variance; the
    #    round-1 behavior, which sky-backed recovery tests showed converges
    #    exactly.
    #  * geometry-backed (continuation hits): stochastic keep/pass-through
    #    branch with probability sigma, reweighted by
    #    w/stop_grad(w) — value unchanged, gradient the exact single-sample
    #    estimator of d(sigma*L_hit + (1-sigma)*L_behind). This is the
    #    term the round-1 version lacked (it blended only toward the sky).
    edge_idx = hit_idx
    kept = jnp.ones_like(alive)
    cont_miss = jnp.zeros_like(alive)
    if settings.soft_edges > 0.0:
        rng, u_edge = random_float(rng)
        edge_idx = hit_idx
        sh0 = shade_hits(scene, origin, direction, edge_idx, fetch)
        b0 = _bary_min(sh0["bary"])
        sigma_sg = jax.lax.stop_gradient(
            1.0 - jnp.exp(-jnp.clip(b0, 0.0, 1.0)
                          / settings.soft_edges))
        hit0 = edge_idx >= 0
        # continuation just past the hit for ALL hit lanes (same walk
        # as the alpha re-trace); epsilon trade-off documented there
        adv = jnp.where(alive & hit0,
                        res["t"] * (1.0 + 1e-4) + 1e-4, 0.0)
        # lanes with no hit need no continuation: park them far out
        # so the re-trace costs ~1 node step
        o2 = jnp.where((alive & hit0)[:, None],
                       o_live + direction * adv[:, None], 3.0e37)
        res2 = trace_closest(o2, direction)
        cont_miss = alive & hit0 & (res2["hit_idx"] < 0)
        pass_th = (alive & hit0 & ~cont_miss
                   & (u_edge >= sigma_sg))
        hit_idx = jnp.where(pass_th, res2["hit_idx"], edge_idx)
        kept = ~pass_th
    miss = hit_idx < 0
    live_hit = alive & ~miss

    if settings.soft_edges > 0.0:
        # differentiable weight from the ORIGINAL edge triangle
        apply_edge = alive & (edge_idx >= 0)
        sh_e = shade_hits(scene, origin, direction, edge_idx, fetch)
        b_min = _bary_min(sh_e["bary"])
        # double-where: dead lanes' barycentrics are garbage whose
        # tangents would NaN-poison the gradient through jnp.where
        b_min = jnp.where(apply_edge, b_min, 0.5)
        sigma = 1.0 - jnp.exp(-jnp.clip(b_min, 0.0, 1.0)
                              / settings.soft_edges)
        # environment-backed: deterministic blend toward the sky
        sky_e = _sky(direction, lights)
        light = light + jnp.where(
            cont_miss[:, None],
            throughput * (1.0 - sigma)[:, None] * sky_e
            * lights.sky_intensity, 0.0)
        det_scale = jnp.where(cont_miss, sigma, 1.0)
        # geometry-backed: reweight the recorded stochastic branch
        w = jnp.where(kept, sigma, 1.0 - sigma)
        w = jnp.clip(w, 1e-4, 1.0)
        ratio = jnp.where(apply_edge & ~cont_miss,
                          w / jax.lax.stop_gradient(w), 1.0)
        # scales EVERYTHING downstream of the branch choice, including
        # the sky added below when a pass-through escapes
        throughput = throughput * (ratio * det_scale)[:, None]

    # --- sky on miss (RayGen.cuh:99-108) ---
    sky = _sky(direction, lights)
    add_sky = alive & miss
    light = light + jnp.where(add_sky[:, None],
                              throughput * sky * lights.sky_intensity, 0.0)

    if kernel_mode:
        sh = _shade_from_kernel(scene, origin, direction, hit_idx, krec)
    else:
        sh = shade_hits(scene, origin, direction, hit_idx, fetch,
                        smooth=settings.smooth_shading)
    matd = _fetch_material(scene, sh["material"], _mat_fetch(fetch))

    # --- emission (PBR mode; the reference parses EmissiveFactor but
    #     never shades it, Material.cuh:10-22) ---
    if settings.shading == "pbr":
        emis = matd["emissive"]
        light = light + jnp.where(live_hit[:, None], throughput * emis, 0.0)

    # --- surface throughput (RayGen.cuh:110-118) ---
    alb = _albedo(scene, matd, sh["uv"],
                  bilinear=settings.tex_filter == "bilinear")
    throughput = jnp.where(live_hit[:, None], throughput * alb, throughput)

    new_origin = sh["world_position"] + sh["normal"] * 1e-3

    # --- sun NEE shadow ray (RayGen.cuh:120-128) ---
    n = origin.shape[0]
    occluded = jnp.zeros((n,), bool)
    if settings.enable_sunlight:
        rng, jit_vec = random_unit_vec3(rng)
        shadow_dir = sun_pos[None, :] + jit_vec * 1.5
        # shadow rays only matter for live hits; park the rest
        nee_o = jnp.where(live_hit[:, None], new_origin, 3.0e37)
        occluded = trace_anyhit(nee_o, shadow_dir)
        contrib = sun_col[None, :] * throughput
        if settings.shading == "pbr":
            # A dielectric lane transmits with P = transmission, so only
            # the (1-transmission) reflected fraction sees the diffuse-
            # style sun term — without this, clear glass collected the
            # full sun contribution as if it were diffuse. Remaining
            # known bias (documented): the shadow ray's anyhit treats
            # transmissive panes as opaque occluders (hard shadows
            # behind glass) — matching the reference's own limitation
            # (`TraceRay.cu:34` "does not support glass material").
            diffuse_frac = 1.0 - (1.0 - matd["metallic"]) \
                * matd["transmission"]
            contrib = contrib * diffuse_frac[:, None]
        if settings.nee_cosine:  # opt-in physical N·L (off = reference)
            d_n = shadow_dir / jnp.linalg.norm(shadow_dir, axis=-1,
                                               keepdims=True)
            contrib = contrib * jnp.maximum(
                jnp.sum(sh["normal"] * d_n, axis=-1), 0.0)[:, None]
        light = light + jnp.where((live_hit & ~occluded)[:, None],
                                  contrib, 0.0)

    # --- russian roulette (new capability; north-star item) ---
    survive = jnp.ones((n,), bool)
    if settings.russian_roulette:
        rng, u_rr = random_float(rng)
        p = jnp.clip(jnp.max(throughput, axis=-1), 0.05, 1.0)
        do_rr = bounce_idx >= settings.rr_start_bounce
        survive = ~do_rr | (u_rr < jax.lax.stop_gradient(p))
        scale = jnp.where(do_rr & survive, 1.0 / p, 1.0)
        throughput = throughput * scale[:, None]
        alive = live_hit & survive
    else:
        alive = live_hit

    # --- bounce: diffuse (RayGen.cuh:133-134) or PBR metal lobe ---
    rng, ball = random_in_ball(rng)
    bounce_dir = sh["normal"] + ball
    if settings.cosine_weighted:
        rng, sph = random_unit_vec3(rng)
        bounce_dir = sh["normal"] + sph
        bounce_dir = bounce_dir / jnp.maximum(
            jnp.linalg.norm(bounce_dir, axis=-1, keepdims=True), 1e-8)
    if settings.shading == "pbr":
        # stochastic lobe choice: P(metal) = metallic; specular direction
        # is the mirror reflection fuzzed by roughness (differentiable in
        # roughness and geometry; the lobe CHOICE is discrete and
        # reweighted below so AD sees its probability)
        rng, u_lobe = random_float(rng)
        metallic = matd["metallic"]
        roughness = matd["roughness"]
        d_n = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
        refl = d_n - 2.0 * jnp.sum(d_n * sh["normal"], axis=-1,
                                   keepdims=True) * sh["normal"]
        spec_dir = refl + roughness[:, None] * ball
        is_metal = u_lobe < jax.lax.stop_gradient(metallic)
        bounce_dir = jnp.where(is_metal[:, None], spec_dir, bounce_dir)
        # w/stop_grad(w) reweight (same estimator as soft edges): value 1,
        # gradient = the lobe-choice probability derivative — without it
        # `metallic` is invisible to AD (its only effect is this discrete
        # branch). Applied to throughput AFTER this segment's light adds,
        # so it scales exactly the radiance downstream of the choice.
        w_lobe = jnp.where(is_metal, metallic, 1.0 - metallic)
        w_lobe = jnp.clip(w_lobe, 1e-3, 1.0)
        lobe_ratio = jnp.where(live_hit,
                               w_lobe / jax.lax.stop_gradient(w_lobe), 1.0)
        throughput = throughput * lobe_ratio[:, None]

        # --- glass (transmission) lobe ---
        # The reference's Material carries Transmission + refractive_index
        # and Random.cu declares refract()/reflectance() "for future
        # glass", but its integrator never implemented it (TraceRay.cu:34
        # "does not support glass material"). We do: a dielectric lane
        # (not metal) transmits with P = transmission; a transmitting lane
        # refracts by Snell or mirror-reflects on total internal
        # reflection / a Schlick-Fresnel coin. Both discrete choices
        # are reweighted by w/stop_grad(w), so gradients flow to
        # `transmission` (choice probability) and to `ior` (through the
        # refracted direction and Fresnel weight). Tint = albedo (already
        # multiplied into throughput above): colored glass.
        rng, u_glass = random_float(rng)
        rng, u_fresnel = random_float(rng)
        transm = matd["transmission"]
        ior = jnp.maximum(matd["ior"], 1.0 + 1e-4)
        is_glass = (~is_metal) & (
            u_glass < jax.lax.stop_gradient(transm))
        nrm = sh["normal"]  # viewer-flipped: cos_in >= 0 below
        eta = jnp.where(sh["front_face"], 1.0 / ior, ior)
        cos_in = jnp.clip(-jnp.sum(d_n * nrm, axis=-1), 0.0, 1.0)
        k = 1.0 - eta * eta * (1.0 - cos_in * cos_in)
        tir = k < 0.0
        # double-where: sqrt'(0) = inf would NaN-poison d/d(ior) through
        # the refl/refr select on TIR lanes (0 cotangent * inf = NaN)
        k_safe = jnp.where(tir, 1.0, jnp.maximum(k, 0.0))
        refr = (eta[:, None] * (d_n + cos_in[:, None] * nrm)
                - jnp.sqrt(k_safe)[:, None] * nrm)
        # Schlick reflectance (the reference's declared
        # `reflectance(cosine, ref_idx)`, Random.cu)
        r0 = ((1.0 - eta) / (1.0 + eta)) ** 2
        fres = r0 + (1.0 - r0) * (1.0 - cos_in) ** 5
        fres = jnp.clip(fres, 0.0, 1.0)
        reflect = tir | (u_fresnel < jax.lax.stop_gradient(fres))
        glass_dir = jnp.where(reflect[:, None], refl, refr) \
            + roughness[:, None] * ball  # frosted-glass fuzz
        bounce_dir = jnp.where(is_glass[:, None], glass_dir, bounce_dir)
        # transmitted rays continue THROUGH the surface: offset along
        # -normal instead of +normal
        transmitted = is_glass & ~reflect
        new_origin = jnp.where(transmitted[:, None],
                               sh["world_position"] - nrm * 1e-3,
                               new_origin)
        # reweights: glass-vs-diffuse choice, then reflect-vs-refract.
        # Metal lanes never flipped the glass coin (is_glass requires
        # ~is_metal), so their branch weight is 1 — gating by is_metal
        # keeps d(image)/d(transmission) unbiased when metallic > 0
        # (ungated, metal lanes picked up a spurious (1-transm) factor).
        w_g = jnp.where(is_glass, transm,
                        jnp.where(is_metal, 1.0, 1.0 - transm))
        w_f = jnp.where(reflect, fres, 1.0 - fres)
        w_f = jnp.where(is_glass & ~tir, w_f, 1.0)  # TIR is deterministic
        w = jnp.clip(w_g * w_f, 1e-3, 1.0)
        glass_ratio = jnp.where(live_hit,
                                w / jax.lax.stop_gradient(w), 1.0)
        throughput = throughput * glass_ratio[:, None]

    return (new_origin, bounce_dir, throughput, light, alive, rng), None


def render_pixels(scene, camera: Camera, lights: LightParams, frame_idx,
                  pixel_ids, *, width: int, height: int,
                  settings: RenderSettings):
    """Render one sample for a flat batch of pixel ids -> (N, 3) color.

    This is the shardable unit: a device mesh splits `pixel_ids` into
    tiles and each device runs this same function on its shard (see
    parallel/). `render_sample` below is the full-frame convenience.

    Non-debug rendering is ONE differentiable bounce scan with the
    traversal kernels inline (see _segment).
    """
    n = pixel_ids.shape[0]
    # normalize the fetch mode ONCE so the tracer construction
    # (_make_tracers' emit_attrs) and every _segment agree on the same
    # concrete choice — "auto" may resolve to the in-kernel fetch
    settings = settings.replace(shade_fetch=_resolve_fetch(scene, settings))
    debug = settings.render_mode == RenderMode.DEBUG

    def start_rays(cam):
        rng = seed_pixels(pixel_ids.astype(jnp.uint32), frame_idx)
        rng, origin, direction = generate_rays(cam, width, height, rng,
                                               pixel_ids=pixel_ids)
        # carry constants derive from the (possibly sharded) rays so the
        # scan carry is vma-consistent under shard_map (ops/intersect.py::
        # varying_zero)
        vz = varying_zero(origin)
        light = jnp.zeros((n, 3)) + vz[:, None]
        throughput = jnp.ones((n, 3)) + vz[:, None]
        alive = vz == 0.0
        return (origin, direction, throughput, light, alive, rng)

    if debug:
        # single traced iteration feeding the debug view heads
        # (RayGen.cuh:136-161)
        trace_closest, _ = _make_tracers(scene, settings)
        origin, direction, throughput, light, alive, _rng = start_rays(camera)
        res = trace_closest(origin, direction)
        hit_idx = res["hit_idx"]
        live_hit = alive & (hit_idx >= 0)
        fetch = _resolve_fetch(scene, settings)
        if fetch == "kernel":
            sh = _shade_from_kernel(scene, origin, direction, hit_idx, res)
        else:
            sh = shade_hits(scene, origin, direction, hit_idx, fetch,
                            smooth=settings.smooth_shading)
        alb = _albedo(scene,
                      _fetch_material(scene, sh["material"],
                                      _mat_fetch(fetch)),
                      sh["uv"], bilinear=settings.tex_filter == "bilinear")
        throughput = jnp.where(live_hit[:, None], throughput * alb, throughput)
        sky = _sky(direction, lights)
        light = light + jnp.where((~live_hit)[:, None],
                                  throughput * sky * lights.sky_intensity, 0.0)

        dm = settings.debug_mode
        if dm == DebugMode.ALBEDO:
            debug_out = jnp.where(live_hit[:, None], throughput, light)
        elif dm == DebugMode.NORMAL:
            debug_out = jnp.where(live_hit[:, None], sh["normal"], 0.0)
        elif dm == DebugMode.BARYCENTRIC:
            debug_out = jnp.where(live_hit[:, None], sh["bary"], 0.0)
        elif dm == DebugMode.UVS:
            uvs = jnp.concatenate([sh["uv"], jnp.zeros((n, 1))], axis=-1)
            debug_out = jnp.where(live_hit[:, None], uvs, 0.0)
        elif dm in (DebugMode.BVH, DebugMode.WORLD_BVH):
            # heat = visits * 0.05 (BVHTraversal.cuh:43), hit base color
            # (0, 0.1, 0.1) (RayGen.cuh:156-158)
            heat = res["visits"].astype(jnp.float32) * 0.05
            base = jnp.where(live_hit[:, None],
                             jnp.asarray([0.0, 0.1, 0.1]), 0.0)
            debug_out = base + heat[:, None]
        color = debug_out
        post = settings.debug_mode == DebugMode.ALBEDO
    else:
        bounce_ids = jnp.arange(settings.bounces, dtype=jnp.int32)

        # --- single differentiable scan (round 4). The kernels sit
        # INLINE: every traversal backend is an opaque custom_vjp
        # discrete selector with stop-gradient inputs (_make_tracers),
        # so reverse-mode AD saves their outputs as scan residuals and
        # transposes only the shading math around them. The previous
        # trace-then-replay design ran the full shading chain TWICE per
        # sample (the trace phase needs throughput/normals/RNG to
        # advance rays; the shade phase recomputed all of it for AD) —
        # measured 49 ms/sample on suzanne 512 b4 where traversal +
        # one shading pass account for ~30 ms. One phase computes the
        # primal once; fwd+bwd pays traversal once and shading's
        # linearization once, and the executable halves (compile-time
        # item, docs/COMPILE_TIME.md).
        tracers = _make_tracers(jax.lax.stop_gradient(scene), settings)

        def body(carry, bounce_idx):
            return _segment(scene, lights, settings, tracers, carry,
                            bounce_idx)

        carry, _ = jax.lax.scan(body, start_rays(camera), bounce_ids)
        color = carry[3]
        post = True

    # post (RayGen.cuh:164-169): tonemap + gamma in NORMAL mode and the
    # albedo debug view only
    if post and settings.enable_tonemap:
        color = uncharted2_filmic(color, camera.exposure)
    if post and settings.enable_gamma:
        color = gamma_correct(color)

    # Zero-valued anchor over EVERY input leaf: different settings
    # variants would otherwise prune different unused arguments from
    # their executables, and jax's C++ jit fastpath has a bug pairing one
    # variant's argument-pruning metadata with another variant's
    # executable ("Execution supplied N buffers but compiled program
    # expected M"). Making pruning identical across variants defuses it.
    return color + _use_all_inputs(scene, camera, lights)


def _use_all_inputs(*pytrees):
    z = jnp.float32(0.0)
    for t in pytrees:
        for leaf in jax.tree.leaves(t):
            z = z + 0.0 * jnp.ravel(leaf)[0].astype(jnp.float32)
    return z


@partial(jax.jit, static_argnames=("width", "height", "settings"),
         inline=True)
def render_sample(scene, camera: Camera, lights: LightParams, frame_idx,
                  *, width: int, height: int, settings: RenderSettings):
    """Render one sample per pixel; returns (H, W, 3) post-processed color.

    The reference's per-frame kernel launch (`RenderKernel.cu:20-35`)
    minus accumulation — see render/film.py for the progressive average.
    `frame_idx` decorrelates the RNG across progressive samples.
    """
    pixel_ids = jnp.arange(width * height, dtype=jnp.int32)
    color = render_pixels(scene, camera, lights, frame_idx, pixel_ids,
                          width=width, height=height, settings=settings)
    return color.reshape(height, width, 3)
