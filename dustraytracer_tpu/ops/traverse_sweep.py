"""Pallas TPU kernel: min-sweep cluster-BVH traversal.

The one-hot kernel (ops/traverse_pallas.py) pays O(total triangles) of
MXU work on EVERY while-step — each lane selects its own cluster with a
(C, T) one-hot contraction — so dense scenes collapse (15k tris ran 20x
slower per ray than 1k tris).

This kernel exploits a property of threaded DFS pre-order traversal:
a ray's node pointer only moves FORWARD (descend = i+1, miss/leaf =
skip link, both greater than i). So across a ray tile, the minimum
node pointer strictly increases, and the whole walk can be driven by a
single *uniform scalar* node cursor:

    i = min over lanes of node_ptr          (scalar)
    process node i for the lanes parked on it
    lanes advance; min strictly increases  ->  <= M iterations, ever

A uniform cursor changes the memory story completely:

- node fields become 8 *scalar* SMEM reads per step (no one-hot, no
  gather) broadcast against the ray vectors,
- a leaf's K triangles become ONE one-hot MATVEC (10K, C) @ (C, 1)
  against the VMEM-resident planar table — paid per leaf actually
  visited, not per step. (A dynamic lane-slice would be cheaper still,
  but Mosaic requires lane-dim slice starts to be 128-aligned; the
  matvec uses Precision.HIGHEST so f32 selection is exact.)

Per-tile work is therefore proportional to the nodes the tile's rays
*actually touch* (the union over lanes), matching SIMT GPU traversal
(`/root/reference/.../BVHTraversal.cuh:14-73`) instead of brute force:
coherent tiles finish in ~log(C)+few-leaf steps; the absolute worst
case (every lane fully divergent) degenerates to ONE full sweep over
the tree — which is what the one-hot kernel paid per *step*.

Same contract as traverse_cluster: stop-gradiented hit_idx / t /
visits (visits IS tracked here — state lives in VMEM scratch, not the
while carry, so the extra counter costs one masked add).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dustraytracer_tpu.accel.cluster import ClusterBvh

BIG = 3.4e38
# rays per kernel tile. Bigger tiles amortize per-tile dispatch/pipeline
# overhead; the union-of-visited-nodes per tile grows sublinearly for
# sorted rays, so the trade favors large tiles (measured on v5e:
# suzanne 28.8 -> 37.5, dense_monkey 9.6 -> 16.2 Mrays/s going 512 ->
# 2048). Per-ray results are tile-invariant (each lane's walk is
# independent; tiling only schedules).
TILE = 2048
# Node scalar tables live in SMEM when they fit (8 words/node across
# ALL 8 octant orderings, <= MAX_SMEM_NODES rows total); beyond that the
# kernel switches to PAGED mode: the tables stay in HBM (8 per-octant
# flat runs) and a 2-slot window of PAGE nodes of the TILE'S octant
# streams through SMEM via DMA. The uniform cursor only moves FORWARD,
# so page crossings are rare (>= PAGE node-steps apart minus skip jumps)
# and the walk has no node-count ceiling. 2835-node valorant_katana hit
# multi-minute Mosaic compiles / HTTP-500 aborts with a 91 KB monolithic
# SMEM table — paging keeps the resident scalar footprint at 2*PAGE*8
# words regardless of scene size.
MAX_SMEM_NODES = 512  # m=1024 resident tables hit the 1 MB SMEM cap
# (compiler: 'Used 1.00M of 1.00M smem') once pipeline bookkeeping is
# counted; 512 leaves margin. With 8 octant orderings resident the
# budget is shared (resident iff 8*m <= 512, e.g. suzanne m=31); denser
# scenes page per octant.
# nodes per SMEM page. Must keep BOTH flat page chunks 1024-aligned
# (Mosaic tiles 1-D refs at (1024,) and rejects unaligned slices):
# PAGE*6 f32 box words and PAGE*2 i32 link words -> PAGE multiple of 512.
PAGE = 512
# nodes processed per while-loop iteration: the loop's per-iteration
# overhead (scalar bookkeeping + cross-lane min reduction + branch) is
# ~500x the actual VPU slab work, so amortizing it over a window of
# consecutive pre-order nodes is nearly free parallel speedup for any
# tile whose visited nodes are pre-order-dense (which sorted coherent
# tiles are). Correctness is unchanged: node pointers only move forward,
# so processing i, i+1, ..., i+U-1 sequentially inside one iteration is
# exactly the original walk.
UNROLL = 4
# leaf intersection form: "dual" moves the six per-(K, T) ray dot
# products onto the MXU via precomputed dual-basis plane rows (see
# _kernel._leaf) — measured SLOWER on v5e (suzanne 108 -> 49 Mrays/s,
# results/leaf_form_bench.json): the (3K, 3) x (3, T) contractions pay
# Mosaic relayouts + a 3-deep systolic pass that wastes the MXU, and
# HIGHEST precision multiplies the passes. Kept as a documented
# negative result / A/B hook (tools/bench_leaf_form.py); "mt" is the
# Möller–Trumbore VPU form and the default.
LEAF_FORM = "mt"


def _kernel(node_box_ref, node_link_ref, mode_ref, octs_ref, rays_ref,
            tri_ref, out_ref, node_s, t_s, idx_s, vis_s, cnt_s, *extra,
            m, c, k, paged=False, m_pad=0, unroll=UNROLL, attrs=False,
            leaf=None):
    if attrs:
        attr_s, *paging = extra
    else:
        paging = extra
    if paged:
        box_pg, link_pg, sems = paging
        n_pages = m_pad // PAGE
    t = rays_ref.shape[-1]

    # anyhit is a RUNTIME scalar since round 5: closest and anyhit
    # traversal share ONE Mosaic kernel (the bodies were ~95% identical,
    # but as separate modules each paid its own ~90 s remote Mosaic
    # compile cold — docs/COMPILE_TIME.md).
    ah = mode_ref[0] != 0
    # per-tile direction-octant: selects which of the 8 near-child-first
    # pre-order threadings of the tree this tile walks (accel/cluster.py
    # _octant_orders). Any ordering is CORRECT for any ray — the choice
    # only schedules, letting early hits tighten hit_t before far
    # subtrees are box-tested (the reference's distance-ordered culling,
    # BVHTraversal.cuh:30-41, baked per octant).
    oct_id = octs_ref[pl.program_id(0)]

    ox = rays_ref[0:1, :]
    oy = rays_ref[1:2, :]
    oz = rays_ref[2:3, :]
    dx = rays_ref[3:4, :]
    dy = rays_ref[4:5, :]
    dz = rays_ref[5:6, :]
    lim = rays_ref[6:7, :]
    inv_x = 1.0 / dx
    inv_y = 1.0 / dy
    inv_z = 1.0 / dz

    # per-ray state in VMEM scratch (scratch persists across grid steps:
    # re-init every step). node == m means finished.
    node_s[:] = jnp.zeros((1, t), jnp.int32)
    t_s[:] = lim
    idx_s[:] = jnp.full((1, t), -1, jnp.int32)
    vis_s[:] = jnp.zeros((1, t), jnp.int32)
    cnt_s[0] = 0  # executed while-iterations (windows of UNROLL nodes)
    cnt_s[1] = 0  # executed leaf substeps (matvec + MT actually run)
    if attrs:
        attr_s[:] = jnp.zeros((8, t), jnp.float32)

    def cond(carry):
        step, i, _q = carry
        return jnp.logical_and(step < m + 4, i < m)

    def _load_pages(q):
        """Make pages q and q+1 of THIS TILE'S octant table resident
        (slot = page parity). Both are waited before returning: a window
        starting late in page q may read into page q+1 in the same
        iteration. Tables are FLAT 1-D so each page is one contiguous
        128-aligned HBM run (Mosaic rejects 2-D slices whose minor dim
        isn't lane-aligned); the octant base offsets are PAGE-aligned by
        construction (m_pad is a PAGE multiple)."""
        q2 = jnp.minimum(q + 1, n_pages - 1)
        base6 = oct_id * (m_pad * 6)
        base2 = oct_id * (m_pad * 2)
        for page, slot in ((q, q % 2), (q2, (q + 1) % 2)):
            cb = pltpu.make_async_copy(
                node_box_ref.at[pl.ds(base6 + page * (PAGE * 6),
                                      PAGE * 6)],
                box_pg.at[pl.ds(slot * (PAGE * 6), PAGE * 6)],
                sems.at[slot, 0])
            cl = pltpu.make_async_copy(
                node_link_ref.at[pl.ds(base2 + page * (PAGE * 2),
                                       PAGE * 2)],
                link_pg.at[pl.ds(slot * (PAGE * 2), PAGE * 2)],
                sems.at[slot, 1])
            cb.start()
            cl.start()
            cb.wait()
            cl.wait()

    def body(carry):
        step, i0, cur_q = carry
        if paged:
            q = i0 // PAGE

            @pl.when(q != cur_q)
            def _():
                _load_pages(q)
        else:
            q = cur_q
        last = (m_pad if paged else m) - 1
        for s in range(unroll):
            _substep(jnp.minimum(i0 + s, last))
        # the min over lanes strictly increases -> <= m iterations total
        # (the step counter is belt-and-braces against layout bugs)
        cnt_s[0] = cnt_s[0] + 1
        return step + 1, jnp.min(node_s[:]), q

    def _substep(i):
        # --- uniform node: 8 scalar SMEM reads (direct, or from the
        # resident page window — i is always within pages q/q+1) ---
        if paged:
            slot = (i // PAGE) % 2
            off = i % PAGE
            b_at = slot * (PAGE * 6) + off * 6
            l_at = slot * (PAGE * 2) + off * 2
            bminx = box_pg[b_at + 0]
            bminy = box_pg[b_at + 1]
            bminz = box_pg[b_at + 2]
            bmaxx = box_pg[b_at + 3]
            bmaxy = box_pg[b_at + 4]
            bmaxz = box_pg[b_at + 5]
            skip = link_pg[l_at + 0]     # already remapped: -1 -> m
            cluster = link_pg[l_at + 1]  # >= 0 iff leaf
        else:
            ni = oct_id * m + i  # this tile's octant table (8*m rows)
            bminx = node_box_ref[ni, 0]
            bminy = node_box_ref[ni, 1]
            bminz = node_box_ref[ni, 2]
            bmaxx = node_box_ref[ni, 3]
            bmaxy = node_box_ref[ni, 4]
            bmaxz = node_box_ref[ni, 5]
            skip = node_link_ref[ni, 0]     # already remapped: -1 -> m
            cluster = node_link_ref[ni, 1]  # >= 0 iff leaf
        is_leaf = cluster >= 0

        node = node_s[:]
        hit_t = t_s[:]
        active = node == i
        # clamped window sub-steps can process padding node ids >= m,
        # where "parked" lanes are actually DONE (sentinel m) — they are
        # inert for traversal (padding boxes never enter) but must not
        # count as visits
        vis_s[:] = vis_s[:] + (active & (i < m)).astype(jnp.int32)

        # --- slab test vs the uniform box (scalar-vector broadcast) ---
        tx0 = (bminx - ox) * inv_x
        tx1 = (bmaxx - ox) * inv_x
        ty0 = (bminy - oy) * inv_y
        ty1 = (bmaxy - oy) * inv_y
        tz0 = (bminz - oz) * inv_z
        tz1 = (bmaxz - oz) * inv_z
        t_lo = jnp.maximum(jnp.maximum(jnp.fmin(tx0, tx1),
                                       jnp.fmin(ty0, ty1)),
                           jnp.fmin(tz0, tz1))
        t_hi = jnp.minimum(jnp.minimum(jnp.fmax(tx0, tx1),
                                       jnp.fmax(ty0, ty1)),
                           jnp.fmax(tz0, tz1))
        t_enter = jnp.maximum(t_lo, 0.0)
        box_hit = (t_enter <= t_hi) & (t_hi >= 0.0)
        enter = active & box_hit & (t_enter < hit_t)

        # advance: enter an interior node -> its first child is i+1
        # (pre-order); otherwise the escape link. Leaf lanes intersect
        # below and then also escape.
        nxt = jnp.where(enter & (~is_leaf), i + 1, skip)
        node_s[:] = jnp.where(active, nxt, node)

        @pl.when(is_leaf & jnp.any(enter))
        def _leaf():
            cnt_s[1] = cnt_s[1] + 1
            # --- uniform cluster fetch: ONE one-hot matvec over the
            # fused component table, O(K*C) per leaf VISITED, not per
            # step (Mosaic forbids unaligned lane-dim dynamic slices,
            # so select via MXU). Precision HIGHEST: the default f32
            # matmul truncates operands to bf16 — 3xbf16 passes carry
            # 24 mantissa bits, so selecting an f32 by a 0/1 vector is
            # EXACT; without it hit-t values visibly drift. ---
            oh = (jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0)
                  == cluster).astype(jnp.float32)  # (C, 1)
            rows = jax.lax.dot_general(
                tri_ref[:], oh, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)  # (R*K, 1)
            if leaf == "dual":
                # --- dual-basis plane form (round 5): per triangle the
                # table carries [n | w_u | w_v | n.v0 | w_u.v0 | w_v.v0]
                # (w_u, w_v = the dual basis of (e1, e2) in the triangle
                # plane), so the six (K, T) ray dot products become TWO
                # (3K, 3) x (3, T) MXU contractions and the VPU tail is
                # ~15 ops instead of Möller–Trumbore's ~50. n.d equals
                # -det(MT), so the parallel-reject epsilon is unchanged.
                tri_id = rows[12 * k:13 * k].astype(jnp.int32)
                lhs = jnp.concatenate(
                    [jnp.concatenate([rows[0:k], rows[3 * k:4 * k],
                                      rows[6 * k:7 * k]], axis=0),
                     jnp.concatenate([rows[k:2 * k], rows[4 * k:5 * k],
                                      rows[7 * k:8 * k]], axis=0),
                     jnp.concatenate([rows[2 * k:3 * k],
                                      rows[5 * k:6 * k],
                                      rows[8 * k:9 * k]], axis=0)],
                    axis=1)  # (3K, 3): [n; w_u; w_v] per component
                cn = rows[9 * k:10 * k]
                cu0 = rows[10 * k:11 * k]
                cv0 = rows[11 * k:12 * k]
                dmat = jnp.concatenate([dx, dy, dz], axis=0)  # (3, T)
                omat = jnp.concatenate([ox, oy, oz], axis=0)
                pd = jax.lax.dot_general(
                    lhs, dmat, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)  # (3K, T)
                po = jax.lax.dot_general(
                    lhs, omat, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
                nd, wud, wvd = pd[0:k], pd[k:2 * k], pd[2 * k:3 * k]
                no, wuo, wvo = po[0:k], po[k:2 * k], po[2 * k:3 * k]
                par = jnp.abs(nd) < 1e-6
                inv_det = 1.0 / jnp.where(par, 1.0, nd)
                tt = (cn - no) * inv_det
                u = wuo + tt * wud - cu0
                v = wvo + tt * wvd - cv0
            else:
                v0x, v0y, v0z = rows[0:k], rows[k:2 * k], rows[2 * k:3 * k]
                e1x, e1y, e1z = (rows[3 * k:4 * k], rows[4 * k:5 * k],
                                 rows[5 * k:6 * k])
                e2x, e2y, e2z = (rows[6 * k:7 * k], rows[7 * k:8 * k],
                                 rows[8 * k:9 * k])
                tri_id = rows[9 * k:10 * k].astype(jnp.int32)  # (K, 1)

                # Möller–Trumbore, (K, 1) x (1, T) -> (K, T)
                px = dy * e2z - dz * e2y
                py = dz * e2x - dx * e2z
                pz = dx * e2y - dy * e2x
                det = e1x * px + e1y * py + e1z * pz
                par = jnp.abs(det) < 1e-6
                inv_det = 1.0 / jnp.where(par, 1.0, det)
                tvx = ox - v0x
                tvy = oy - v0y
                tvz = oz - v0z
                u = inv_det * (tvx * px + tvy * py + tvz * pz)
                qx = tvy * e1z - tvz * e1y
                qy = tvz * e1x - tvx * e1z
                qz = tvx * e1y - tvy * e1x
                v = inv_det * (dx * qx + dy * qy + dz * qz)
                tt = inv_det * (e2x * qx + e2y * qy + e2z * qz)
            cur_t = t_s[:]
            valid = (~par) & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) \
                & (u + v <= 1.0) & (tt > 1e-6) & (tri_id >= 0)
            valid = valid & enter & (tt < cur_t)

            t_masked = jnp.where(valid, tt, BIG)
            best_t = jnp.min(t_masked, axis=0, keepdims=True)  # (1, T)
            is_best = valid & (t_masked <= best_t)
            best_id = jnp.min(
                jnp.where(is_best, tri_id, jnp.int32(2**30)),
                axis=0, keepdims=True)
            improve = (best_t < cur_t) & (best_id < 2**30)
            t_s[:] = jnp.where(improve, best_t, cur_t)
            idx_s[:] = jnp.where(improve, best_id, idx_s[:])
            if attrs:
                # in-kernel shading fetch (the reference megakernel
                # shades in-kernel too, RayGen.cuh:110-118): select the
                # winner's u/v, interpolated uv, oriented geometric
                # normal and material id — one masked K-reduce per
                # channel, paid per leaf EXECUTED, vs an O(rays x tris)
                # one-hot fetch per shade site on the wavefront.
                ab = (13 if leaf == "dual" else 10) * k  # attr row base
                uv0x, uv0y = rows[ab:ab + k], rows[ab + k:ab + 2 * k]
                uv1x, uv1y = (rows[ab + 2 * k:ab + 3 * k],
                              rows[ab + 3 * k:ab + 4 * k])
                uv2x, uv2y = (rows[ab + 4 * k:ab + 5 * k],
                              rows[ab + 5 * k:ab + 6 * k])
                fnx, fny, fnz = (rows[ab + 6 * k:ab + 7 * k],
                                 rows[ab + 7 * k:ab + 8 * k],
                                 rows[ab + 8 * k:ab + 9 * k])
                matf = rows[ab + 9 * k:ab + 10 * k]
                sel = is_best & (tri_id == best_id)  # exactly one per lane
                wb = 1.0 - u - v
                uvx = wb * uv0x + u * uv1x + v * uv2x
                uvy = wb * uv0y + u * uv1y + v * uv2y

                def pick(x):  # (K, T) or (K, 1) -> winner per lane (1, T)
                    return jnp.sum(jnp.where(sel, x, 0.0), axis=0,
                                   keepdims=True)

                new_attr = jnp.concatenate(
                    [pick(u), pick(v), pick(uvx), pick(uvy),
                     pick(jnp.broadcast_to(fnx, (k, t))),
                     pick(jnp.broadcast_to(fny, (k, t))),
                     pick(jnp.broadcast_to(fnz, (k, t))),
                     pick(jnp.broadcast_to(matf, (k, t)))], axis=0)
                attr_s[:] = jnp.where(improve, new_attr, attr_s[:])
            # anyhit early-exit (runtime mode): a hit parks the lane at
            # the done sentinel immediately
            node_s[:] = jnp.where(improve & ah, m, node_s[:])

    if paged:
        _load_pages(jnp.int32(0))
    jax.lax.while_loop(cond, body,
                       (jnp.int32(0), jnp.int32(0), jnp.int32(0)))

    out_ref[0:1, :] = t_s[:]
    out_ref[1:2, :] = idx_s[:].astype(jnp.float32)
    out_ref[2:3, :] = vis_s[:].astype(jnp.float32)
    # rows 3/4: per-tile EXECUTED work counters (broadcast scalars) — the
    # exact quantities the speed-of-light model prices (utils/roofline).
    out_ref[3:4, :] = jnp.full((1, t), cnt_s[0], jnp.int32) \
        .astype(jnp.float32)
    out_ref[4:5, :] = jnp.full((1, t), cnt_s[1], jnp.int32) \
        .astype(jnp.float32)
    if attrs:
        out_ref[5:13, :] = attr_s[:]
        out_ref[13:16, :] = jnp.zeros((3, t), jnp.float32)
    else:
        out_ref[5:8, :] = jnp.zeros((3, t), jnp.float32)


_OPAQUE_CACHE = {}


def _opaque(anyhit: bool, interpret: bool, tile: int, unroll: int,
            emit_attrs: bool, leaf_form: str):
    """custom_vjp wrapper: discrete selector, zero cotangents (same
    contract as traverse_pallas — callers differentiate recomputed hit
    attributes, never the kernel; emitted shading attributes are
    likewise stop-gradient by construction)."""
    key = (anyhit, interpret, tile, unroll, emit_attrs, leaf_form)
    if key in _OPAQUE_CACHE:
        return _OPAQUE_CACHE[key]

    @jax.custom_vjp
    def run(cb, origin, direction, t_max):
        return _traverse_impl(cb, origin, direction, t_max,
                              anyhit=anyhit, interpret=interpret,
                              tile=tile, unroll=unroll,
                              emit_attrs=emit_attrs, leaf_form=leaf_form)

    def fwd(cb, origin, direction, t_max):
        shapes = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
            (cb, origin, direction, t_max))
        return run(cb, origin, direction, t_max), shapes

    def bwd(shapes, _g):
        return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    run.defvjp(fwd, bwd)
    _OPAQUE_CACHE[key] = run
    return run


def auto_tile(cb: ClusterBvh) -> int:
    """Ray-tile size for a scene's cluster tables (round-5 K x TILE
    grid, results/cluster_k_sweep.json + tile_sweep logs): 4096-lane
    tiles WITH K<=32 clusters win on every bundled scene (suzanne
    108 -> 141.6, cs16 23.7 -> 32.7, dense_monkey 28.8 -> 29.9, katana
    34.0 -> 40.8 Mrays/s) — the per-leaf fixed cost amortizes over more
    lanes faster than the per-tile node union grows, and (32, 4096)
    f32 Möller–Trumbore blocks still fit VMEM where (64, 4096) spills
    (katana collapsed to 12.96). K=64 tables keep 2048. The K side of
    the rule lives in scene.build_scene (cluster_k='auto').

    On CPU the kernel only ever runs in interpret mode (tests); per-ray
    results are tile-invariant, and small tiles keep tiny test waves
    from padding to 4096 dead lanes — 512 matches the explicit tile the
    interpret-mode tests always used."""
    import jax

    if jax.default_backend() == "cpu":
        return 512
    return 4096 if cb.k <= 32 else TILE


def traverse_cluster_sweep(cb: ClusterBvh, origin, direction, *,
                           anyhit: bool = False, t_max=None,
                           interpret: bool = False, tile: int = None,
                           unroll: int = None, emit_attrs: bool = False,
                           leaf_form: str = None):
    """Min-sweep kernel traversal; same results as traverse_cluster.

    Opaque to autodiff (zero gradients — discrete selector contract).
    Scenes past MAX_SMEM_NODES run in paged mode (node tables streamed
    HBM -> SMEM in PAGE windows) with no node-count ceiling.
    tile/unroll override the module defaults (per-ray results are
    invariant to both; they only schedule — tools/tune_sweep.py).
    emit_attrs=True (requires cb built with uv/face_nrm/mat tables)
    additionally returns the winning hit's interpolated uv, oriented
    geometric normal, material id and barycentric u/v — the in-kernel
    shading fetch (settings.shade_fetch == "kernel").
    """
    if t_max is None:
        t_max = jnp.float32(BIG)
    if emit_attrs and cb.uv is None:
        raise ValueError("emit_attrs requires attribute tables "
                         "(build_cluster_bvh uv/face_nrm/mat)")
    return _opaque(anyhit, interpret, tile or auto_tile(cb),
                   unroll or UNROLL, emit_attrs,
                   leaf_form or LEAF_FORM)(cb, origin, direction, t_max)


def _traverse_impl(cb: ClusterBvh, origin, direction, t_max,
                   *, anyhit: bool, interpret: bool, tile: int = TILE,
                   unroll: int = UNROLL, emit_attrs: bool = False,
                   leaf_form: str = "dual"):
    n = origin.shape[0]
    m = cb.n_nodes
    k = cb.k
    c_pad = cb.v0.shape[0]

    pad = (-n) % tile
    o = jnp.concatenate([origin, jnp.ones((pad, 3))], axis=0)
    d = jnp.concatenate([direction, jnp.ones((pad, 3))], axis=0)
    ntot = n + pad
    n_tiles = ntot // tile
    limit = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    lim = jnp.concatenate([limit, jnp.full((pad,), BIG)], axis=0)

    zero = jnp.zeros_like(lim)
    rays = jnp.stack([o[:, 0], o[:, 1], o[:, 2],
                      d[:, 0], d[:, 1], d[:, 2], lim, zero],
                     axis=0)  # (8, ntot)
    rays = rays.reshape(8, n_tiles, tile).transpose(1, 0, 2) \
        .reshape(n_tiles * 8, tile)

    # per-tile direction octant (bit2=x<0, bit1=y<0, bit0=z<0, matching
    # ray_sort_key's leading bits): the sort groups rays octant-major so
    # a tile's FIRST ray speaks for the tile; unsorted callers still get
    # correct results (any ordering is correct), just weaker culling.
    oct_ray = ((d[:, 0] < 0).astype(jnp.int32) * 4
               + (d[:, 1] < 0).astype(jnp.int32) * 2
               + (d[:, 2] < 0).astype(jnp.int32))
    octs = oct_ray.reshape(n_tiles, tile)[:, 0]
    mode = jnp.full((1,), 1 if anyhit else 0, jnp.int32)

    # 8 per-octant node tables (near-child-first threadings). Synthetic
    # ClusterBvh tables built without _octant_orders (roofline chains)
    # replicate the base ordering 8x so the kernel shape — and therefore
    # the Mosaic module the calibration prices — is identical.
    if cb.oct_min is not None:
        o_min = cb.oct_min[:, :m]
        o_max = cb.oct_max[:, :m]
        o_skip = cb.oct_skip[:, :m]
        o_cluster = cb.oct_cluster[:, :m]
    else:
        o_min = jnp.broadcast_to(cb.node_min[None, :m], (8, m, 3))
        o_max = jnp.broadcast_to(cb.node_max[None, :m], (8, m, 3))
        o_skip = jnp.broadcast_to(cb.node_skip[None, :m], (8, m))
        o_cluster = jnp.broadcast_to(cb.node_cluster[None, :m], (8, m))
    o_skip = jnp.where(o_skip < 0, m, o_skip)  # sentinel: done == m

    # resident only while all 8 tables fit the empirical SMEM budget
    paged = 8 * m > MAX_SMEM_NODES
    node_box = jnp.concatenate([o_min, o_max], axis=2)  # (8, m, 6)
    node_link = jnp.stack([o_skip, o_cluster], axis=2)  # (8, m, 2)
    m_pad = 0
    if paged:
        # pad each octant to whole pages; padding nodes are inert:
        # degenerate box (bmin == bmax == BIG never enters), escape to
        # done, not a leaf
        m_pad = ((m + PAGE - 1) // PAGE) * PAGE
        node_box = jnp.concatenate(
            [node_box,
             jnp.full((8, m_pad - m, 6), BIG, jnp.float32)], axis=1)
        pad_link = jnp.stack(
            [jnp.full((8, m_pad - m), m, jnp.int32),
             jnp.full((8, m_pad - m), -1, jnp.int32)], axis=2)
        node_link = jnp.concatenate([node_link, pad_link], axis=1)
    node_box = node_box.reshape(-1, 6)   # (8*m or 8*m_pad, 6)
    node_link = node_link.reshape(-1, 2)

    # fused planar component table (10K, C), clusters on lanes:
    # rows [v0x v0y v0z | e1xyz | e2xyz | tri_idx] x K — a leaf visit
    # is ONE one-hot matvec. With emit_attrs, 10 more planar row groups
    # [uv0x uv0y uv1x uv1y uv2x uv2y | fn xyz | mat] -> (20K, C).
    def plane_T(a):  # (C, K, 3) -> (3K, C)
        return jnp.concatenate([a[..., 0], a[..., 1], a[..., 2]],
                               axis=1).T

    if leaf_form == "dual":
        # dual-basis plane rows, derived from the (refit-able) v0/e1/e2
        # tables at trace time: n = e1 x e2; w_u, w_v = the dual basis
        # of (e1, e2) in the plane (w_u.e1 = 1, w_u.e2 = 0, ...);
        # degenerate padding rows collapse to all-zero -> n.d == 0 ->
        # parallel-rejected in the kernel (plus tri_idx == -1).
        nvec = jnp.cross(cb.e1, cb.e2)  # (C, K, 3)
        nn = jnp.sum(nvec * nvec, axis=-1, keepdims=True)
        good = nn > 1e-30
        inv_nn = jnp.where(good, 1.0 / jnp.where(good, nn, 1.0), 0.0)
        wu = jnp.cross(cb.e2, nvec) * inv_nn
        wv = jnp.cross(nvec, cb.e1) * inv_nn
        parts = [plane_T(nvec), plane_T(wu), plane_T(wv),
                 jnp.sum(nvec * cb.v0, axis=-1).T,
                 jnp.sum(wu * cb.v0, axis=-1).T,
                 jnp.sum(wv * cb.v0, axis=-1).T,
                 cb.tri_idx.astype(jnp.float32).T]
    else:
        parts = [plane_T(cb.v0), plane_T(cb.e1), plane_T(cb.e2),
                 cb.tri_idx.astype(jnp.float32).T]
    if emit_attrs:
        uv = cb.uv
        parts += [uv[..., 0, 0].T, uv[..., 0, 1].T,
                  uv[..., 1, 0].T, uv[..., 1, 1].T,
                  uv[..., 2, 0].T, uv[..., 2, 1].T,
                  plane_T(cb.face_nrm),
                  cb.mat.astype(jnp.float32).T]
    tri_tab = jnp.concatenate(parts, axis=0)  # (10K or 20K, C_pad)

    rows = 16 if emit_attrs else 8
    ray_spec = pl.BlockSpec((8, tile), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((rows, tile), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    kernel = partial(_kernel, m=m, c=c_pad, k=k,
                     paged=paged, m_pad=m_pad, unroll=unroll,
                     attrs=emit_attrs, leaf=leaf_form)

    node_space = pl.ANY if paged else pltpu.SMEM
    scratch = [pltpu.VMEM((1, tile), jnp.int32),
               pltpu.VMEM((1, tile), jnp.float32),
               pltpu.VMEM((1, tile), jnp.int32),
               pltpu.VMEM((1, tile), jnp.int32),
               pltpu.SMEM((2,), jnp.int32)]
    if emit_attrs:
        scratch += [pltpu.VMEM((8, tile), jnp.float32)]
    if paged:
        scratch += [pltpu.SMEM((2 * PAGE * 6,), jnp.float32),
                    pltpu.SMEM((2 * PAGE * 2,), jnp.int32),
                    pltpu.SemaphoreType.DMA((2, 2))]
        node_box = node_box.reshape(-1)  # flat: aligned 1-D page DMAs
        node_link = node_link.reshape(-1)

    packed = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=node_space),
                  pl.BlockSpec(memory_space=node_space),
                  pl.BlockSpec(memory_space=pltpu.SMEM),  # mode (1,)
                  pl.BlockSpec(memory_space=pltpu.SMEM),  # octs (n_tiles,)
                  ray_spec, tab_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * rows, tile),
                                       jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(node_box, node_link, mode, octs, rays, tri_tab)

    packed = packed.reshape(n_tiles, rows, tile)

    def row(i):
        return packed[:, i, :].reshape(-1)[:n]

    hit_t = row(0)
    hit_idx = row(1).astype(jnp.int32)
    visits = row(2).astype(jnp.int32)
    stop = jax.lax.stop_gradient
    out = {"hit_idx": stop(hit_idx), "t": stop(hit_t),
           "visits": stop(visits),
           # per-tile EXECUTED work (see _kernel tail): the attribution
           # inputs for the speed-of-light model. Dropped by the sorted-
           # tracer wrappers; read by bench/roofline tooling.
           "exec_windows": stop(packed[:, 3, 0].astype(jnp.int32)),
           "exec_leafs": stop(packed[:, 4, 0].astype(jnp.int32))}
    if emit_attrs:
        out.update({
            "u": stop(row(5)), "v": stop(row(6)),
            "uv": stop(jnp.stack([row(7), row(8)], axis=-1)),
            "face_nrm": stop(jnp.stack([row(9), row(10), row(11)],
                                       axis=-1)),
            "mat": stop(row(12).astype(jnp.int32))})
    return out
