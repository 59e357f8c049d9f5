"""Pallas TPU kernel: fused cluster-BVH traversal.

The XLA cluster walk (ops/traverse_cluster.py) already removed gathers,
but each while-iteration is a chain of separately-scheduled HLOs with
HBM-resident tables. This kernel fuses the whole walk on-chip:

- node + triangle tables live in VMEM for the kernel's lifetime (loaded
  once, reused by every grid step = ray tile),
- node row fetch and cluster fetch are one-hot matmuls feeding the MXU
  straight from VMEM,
- the loop body is one fused compute graph — per-iteration overhead
  drops from ~6us of XLA dispatch chains to pipeline latency.

Layout: rays ride the LANE dimension. Every in-kernel array is
(features, T) with T = 512 rays per grid step — per-ray state is (1, T),
one-hot selectors are (M, T)/(C, T), gathered triangle components are
(K, T). Mosaic rejects lane-1 blocks ((T, 1) state was a compile error),
and this orientation keeps all tiles at full 128-lane width.

Mosaic constraints shape the rest (see pallas_guide.md): no int
indexing (hence one-hot everywhere), 2D iota only, argmin expressed as
min + where/min, component-planar tables so Möller–Trumbore runs on
clean 2D tiles.

Same contract as traverse_cluster: stop-gradiented hit_idx / t / visits.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dustraytracer_tpu.accel.cluster import ClusterBvh

BIG = 3.4e38
IBIG = 2**30  # plain int: jnp scalars captured in kernels trip Pallas
TILE = 512
MAX_STEPS_FACTOR = 2  # hard bound: threaded walk touches each node <= once


def _kernel(rays_ref, node_ref, v0_ref, e1_ref, e2_ref, idx_ref,
            out_ref, *, m, c, k, anyhit, max_steps):
    t = rays_ref.shape[-1]

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

    # Carry kept minimal: the remote Mosaic compiler crashes on large
    # while bodies with many carries (bisected), so `done` is folded into
    # `node` (negative == finished) and the visit counter lives only in
    # the XLA path. Bools in the carry also crash it — ints only.
    node = jnp.zeros((1, t), jnp.int32)
    hit_t = lim
    hit_idx = jnp.full((1, t), -1, jnp.int32)

    node_iota = jax.lax.broadcasted_iota(jnp.int32, (m, t), 0)
    clus_iota = jax.lax.broadcasted_iota(jnp.int32, (c, t), 0)

    def cond(carry):
        step, node, _t, _i = carry
        return jnp.logical_and(step < max_steps, jnp.any(node >= 0))

    def body(carry):
        step, node, hit_t, hit_idx = carry
        active = node >= 0
        nd = jnp.maximum(node, 0)

        # --- node row: (8, M) @ onehot(M, T) -> (8, T) ---
        oh_n = (node_iota == nd).astype(jnp.float32)  # (M, T)
        nrow = jnp.dot(node_ref[:], oh_n,
                       preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)  # (8, T)
        bminx = nrow[0:1, :]
        bminy = nrow[1:2, :]
        bminz = nrow[2:3, :]
        bmaxx = nrow[3:4, :]
        bmaxy = nrow[4:5, :]
        bmaxz = nrow[5:6, :]
        skip = nrow[6:7, :].astype(jnp.int32)
        cluster = nrow[7:8, :].astype(jnp.int32)
        is_leaf = cluster >= 0

        # --- slab test (NaN-suppressing min/max like CUDA fminf) ---
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

        # --- leaf: one-hot cluster fetch -> (3K, T), K-wide MT ---
        sel = jnp.where(enter & is_leaf, cluster, -1)
        oh_c = (clus_iota == sel).astype(jnp.float32)  # (C, T)
        v0r = jnp.dot(v0_ref[:], oh_c,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)  # (3K, T)
        e1r = jnp.dot(e1_ref[:], oh_c, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        e2r = jnp.dot(e2_ref[:], oh_c, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        v0x, v0y, v0z = v0r[:k, :], v0r[k:2 * k, :], v0r[2 * k:, :]
        e1x, e1y, e1z = e1r[:k, :], e1r[k:2 * k, :], e1r[2 * k:, :]
        e2x, e2y, e2z = e2r[:k, :], e2r[k:2 * k, :], e2r[2 * k:, :]

        # Möller–Trumbore, component form on (K, T)
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
        valid = (~par) & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) \
            & (u + v <= 1.0) & (tt > 1e-6)
        valid = valid & (enter & is_leaf) & (tt < hit_t)

        t_masked = jnp.where(valid, tt, BIG)
        best_t = jnp.min(t_masked, axis=0, keepdims=True)  # (1, T)
        idr = jnp.dot(idx_ref[:], oh_c,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)  # (K, T)
        tri_id = idr.astype(jnp.int32)
        is_best = valid & (t_masked <= best_t)
        best_id = jnp.min(jnp.where(is_best, tri_id, IBIG), axis=0,
                          keepdims=True)
        improve = (best_t < hit_t) & (best_id >= 0) & (best_id < IBIG)
        hit_t = jnp.where(improve, best_t, hit_t)
        hit_idx = jnp.where(improve, best_id, hit_idx)

        # --- threaded step (done is node = -1; anyhit forces it on hit) ---
        descend = enter & ~is_leaf
        nxt = jnp.where(descend, nd + 1, skip)
        if anyhit:
            nxt = jnp.where(improve, -1, nxt)
        node = jnp.where(active, nxt, node)
        return step + 1, node, hit_t, hit_idx

    carry = (jnp.int32(0), node, hit_t, hit_idx)
    _, node, hit_t, hit_idx = jax.lax.while_loop(cond, body, carry)

    # pack results into one (8, T) f32 block (sublane counts must be
    # multiples of 8; int ids are exact in f32 below 2^24)
    out_ref[0:1, :] = hit_t
    out_ref[1:2, :] = hit_idx.astype(jnp.float32)
    out_ref[2:8, :] = jnp.zeros((6, hit_t.shape[1]), jnp.float32)


def _plane_T(a):
    """(C, K, 3) -> (3K, C): planar [x…|y…|z…] rows, clusters as lanes."""
    c, k, _ = a.shape
    return jnp.concatenate([a[..., 0], a[..., 1], a[..., 2]], axis=1).T


_OPAQUE_CACHE = {}


def _opaque(anyhit: bool, interpret: bool):
    """custom_vjp wrapper: the kernel is a discrete selector — zero
    cotangents for every input. Without this, reverse-mode AD tries to
    linearize through pallas_call and fails; callers differentiate the
    *recomputed* hit attributes instead (shade_hits)."""
    key = (anyhit, interpret)
    if key in _OPAQUE_CACHE:
        return _OPAQUE_CACHE[key]

    @jax.custom_vjp
    def run(cb, origin, direction, t_max):
        return _traverse_impl(cb, origin, direction, t_max,
                              anyhit=anyhit, interpret=interpret)

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


def traverse_cluster_pallas(cb: ClusterBvh, origin, direction, *,
                            anyhit: bool = False, t_max=None,
                            interpret: bool = False):
    """Fused-kernel traversal; same results as traverse_cluster.

    Opaque to autodiff (zero gradients — discrete selector contract)."""
    if t_max is None:
        t_max = jnp.float32(BIG)
    return _opaque(anyhit, interpret)(cb, origin, direction, t_max)


def _traverse_impl(cb: ClusterBvh, origin, direction, t_max,
                   *, anyhit: bool, interpret: bool):
    n = origin.shape[0]
    m = cb.node_min.shape[0]
    c = cb.v0.shape[0]
    k = cb.k

    pad = (-n) % TILE
    o = jnp.concatenate([origin, jnp.ones((pad, 3))], axis=0)
    d = jnp.concatenate([direction, jnp.ones((pad, 3))], axis=0)
    ntot = n + pad
    n_tiles = ntot // TILE
    limit = jnp.broadcast_to(
        jnp.float32(BIG) if t_max is None else t_max, (n,))
    lim = jnp.concatenate([limit, jnp.full((pad,), BIG)], axis=0)

    # rays: (8 * n_tiles, TILE) — one (8, TILE) 2-D block per grid step.
    # 3-D blocks with sub-refs crash Mosaic, and block sublane counts
    # must be multiples of 8, hence 7 ray rows + 1 zero pad row.
    zero = jnp.zeros_like(lim)
    rays = jnp.stack([o[:, 0], o[:, 1], o[:, 2],
                      d[:, 0], d[:, 1], d[:, 2], lim, zero],
                     axis=0)  # (8, ntot)
    rays = rays.reshape(8, n_tiles, TILE).transpose(1, 0, 2) \
        .reshape(n_tiles * 8, TILE)

    node_tab = jnp.concatenate(
        [cb.node_min, cb.node_max,
         cb.node_skip.astype(jnp.float32)[:, None],
         cb.node_cluster.astype(jnp.float32)[:, None]], axis=1).T  # (8, M)

    ray_spec = pl.BlockSpec((8, TILE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((8, TILE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    max_steps = MAX_STEPS_FACTOR * max(cb.n_nodes, 1) + 4

    kernel = partial(_kernel, m=m, c=c, k=k, anyhit=anyhit,
                     max_steps=max_steps)

    packed = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[ray_spec] + [tab_spec] * 5,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * 8, TILE), jnp.float32),
        interpret=interpret,
    )(rays, node_tab, _plane_T(cb.v0), _plane_T(cb.e1), _plane_T(cb.e2),
      cb.tri_idx.astype(jnp.float32).T)

    packed = packed.reshape(n_tiles, 8, TILE)
    hit_t = packed[:, 0, :].reshape(-1)[:n]
    hit_idx = packed[:, 1, :].reshape(-1)[:n].astype(jnp.int32)
    stop = jax.lax.stop_gradient
    # visits not tracked in-kernel (carry size crashes the compiler);
    # the BVH debug view uses the XLA cluster path instead
    return {"hit_idx": stop(hit_idx), "t": stop(hit_t),
            "visits": stop(jnp.zeros_like(hit_idx))}
