"""Cluster BVH: the MXU-native acceleration structure.

Per-lane gathers are the slow path on TPU (no hardware gather; XLA lowers
them to serialized HBM loads) — the threaded walk in ops/traverse.py pays
for one gather set per step. This module removes gathers entirely:

1. The SAH-permuted triangle soup is cut into C fixed-size *clusters* of
   K consecutive triangles (SAH ordering makes runs spatially coherent).
2. A small threaded BVH is built over cluster AABBs (leaf = 1 cluster).
3. Triangle data lives in dense cluster-major tables (C, K, ...).

Traversal (ops/traverse_cluster.py) then *selects* rows by one-hot
matmul: `onehot(node_ids, M) @ node_table` and
`onehot(cluster_ids, C) @ tri_table` — dense MXU contractions instead of
random access. Each ray that reaches a leaf intersects the cluster's
full K-wide triangle vector; the waste (K tests instead of ~leaf-size)
is deliberate — dense FLOPs on the MXU are orders of magnitude cheaper
than gathers.

This is the structure the Pallas kernel consumes with everything pinned
in VMEM. Capability lineage: same role as the reference's flat
BVHNode array + reordered soup (`BVHBuilder.cu:175-214`), re-laid-out
for a systolic-array machine.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

CLUSTER_K = 64  # triangles per cluster; multiple of the 8-sublane tile


@jax.tree_util.register_dataclass
@dataclass
class ClusterBvh:
    """Dense cluster tables + threaded top-level BVH (all padded)."""

    # top-level threaded BVH over clusters (M nodes, pre-order + skip)
    node_min: jax.Array   # (M, 3) f32
    node_max: jax.Array   # (M, 3) f32
    node_skip: jax.Array  # (M,) i32
    node_cluster: jax.Array  # (M,) i32 cluster id for leaves, -1 internal

    # cluster-major triangle data (C clusters x K tris)
    v0: jax.Array  # (C, K, 3) f32
    e1: jax.Array  # (C, K, 3) f32  v1 - v0
    e2: jax.Array  # (C, K, 3) f32  v2 - v0
    tri_idx: jax.Array  # (C, K) i32 original triangle id, -1 for padding

    n_nodes: int = field(metadata=dict(static=True), default=0)
    n_clusters: int = field(metadata=dict(static=True), default=0)
    k: int = field(metadata=dict(static=True), default=CLUSTER_K)

    # static refit plan: subtree_mask[i, c] == True iff ORIGINAL cluster
    # c lies in node i's subtree. Lets refit_cluster_bvh re-derive every
    # node AABB from live vertices with fixed topology (vertex
    # optimization on the fast kernel path). None for synthetic tables
    # that never refit (roofline chains).
    subtree_mask: jax.Array | None = None

    # optional shading-attribute tables (same cluster-major layout).
    # When present, the sweep kernel emits the winning hit's
    # interpolated uv, oriented geometric normal and material id
    # directly (in-kernel shading fetch — the reference megakernel
    # shades in-kernel too, RayGen.cuh:110-118), sparing the wavefront
    # the O(rays x triangles) one-hot attribute fetch.
    uv: jax.Array | None = None        # (C, K, 3, 2) f32 corner UVs
    face_nrm: jax.Array | None = None  # (C, K, 3) f32 oriented normal
    mat: jax.Array | None = None       # (C, K) i32 material id


def build_cluster_bvh(tri_pos: np.ndarray, k: int = CLUSTER_K,
                      bins: int = 16, uv: np.ndarray | None = None,
                      face_nrm: np.ndarray | None = None,
                      mat: np.ndarray | None = None) -> ClusterBvh:
    """Build cluster tables over an (already SAH-permuted) triangle array.

    `tri_pos` must be the post-BVH-permutation (N, 3, 3) array (the padded
    Scene.tri_pos works: padding triangles are degenerate and never hit).
    `uv`/`face_nrm`/`mat` (same permutation) are optional shading
    attribute arrays; when given, the sweep kernel can shade in-kernel.
    """
    from dustraytracer_tpu.accel.bvh import _build_bvh_numpy, thread_bvh

    n = tri_pos.shape[0]
    c = max(1, -(-n // k))
    pad_n = c * k
    tp = np.zeros((pad_n, 3, 3), np.float32)
    tp[:n] = tri_pos

    def _attr(a, shape, dtype, fill=0):
        if a is None:
            return None
        out = np.full((pad_n,) + shape, fill, dtype)
        out[:n] = a[:pad_n][:n]
        return out.reshape((c, k) + shape)

    uv_t = _attr(uv, (3, 2), np.float32)
    fn_t = _attr(face_nrm, (3,), np.float32)
    mat_t = _attr(mat, (), np.int32)

    v0 = tp[:, 0].reshape(c, k, 3)
    e1 = (tp[:, 1] - tp[:, 0]).reshape(c, k, 3)
    e2 = (tp[:, 2] - tp[:, 0]).reshape(c, k, 3)
    tri_idx = np.arange(pad_n, dtype=np.int32).reshape(c, k)
    tri_idx[tri_idx >= n] = -1
    # padding tris are all-zero -> MT det==0 -> rejected; also mask by
    # tri_idx in the traversal

    # cluster AABBs; build a tiny BVH treating each cluster as one "tri"
    # with its AABB corners as a degenerate triangle for the builder
    cl_min = tp.reshape(c, k * 3, 3).min(axis=1)
    cl_max = tp.reshape(c, k * 3, 3).max(axis=1)
    # represent each cluster by a 3-corner "triangle" spanning its AABB so
    # the SAH builder sees the right bounds and centroids
    fake = np.stack([cl_min, cl_max, 0.5 * (cl_min + cl_max)], axis=1)
    bvh = thread_bvh(_build_bvh_numpy(fake, leaf_target=1, bins=bins))

    m = bvh.n_nodes
    node_cluster = np.full(bvh.node_min.shape[0], -1, np.int32)
    leaf = bvh.node_count[:m] > 0
    # leaf_target=1 => every leaf holds exactly one cluster (= its
    # node_first index into the permuted cluster order)
    node_cluster[:m][leaf] = bvh.perm[bvh.node_first[:m][leaf]].astype(np.int32)

    # --- static refit plan (refit_cluster_bvh) ---
    # Pre-order subtree = contiguous node range; its leaves cover a
    # contiguous range of the PERMUTED cluster order. Reverse pass:
    # children (at higher indices) are resolved before their parent;
    # internal node i has left child i+1 and right child skip[i+1].
    lo = np.zeros(m, np.int64)
    hi = np.zeros(m, np.int64)
    skipl = bvh.node_skip[:m]
    for i in range(m - 1, -1, -1):
        if leaf[i]:
            lo[i] = bvh.node_first[i]
            hi[i] = bvh.node_first[i] + bvh.node_count[i]
        else:
            left = i + 1
            right = skipl[left]
            lo[i] = lo[left]
            hi[i] = hi[right] if 0 <= right < m else hi[left]
    subtree_mask = np.zeros((m, c), bool)
    permc = bvh.perm.astype(np.int64)
    for i in range(m):
        subtree_mask[i, permc[lo[i]:hi[i]]] = True

    # One-hot matmul selection computes 0 * x for every non-selected row —
    # padding must be FINITE (0 * inf = NaN would poison every result).
    # Inverted finite boxes (min > max) can never be entered.
    node_min_f = np.nan_to_num(bvh.node_min, posinf=1e30, neginf=-1e30)
    node_max_f = np.nan_to_num(bvh.node_max, posinf=1e30, neginf=-1e30)

    # Pad both tables to multiples of 128 rows: the one-hot contraction
    # dimension then tiles exactly onto the MXU (mis-aligned contraction
    # dims triggered pathological Mosaic compiles on v5e).
    def pad128(a, fill=0.0):
        r = (-a.shape[0]) % 128
        if r == 0:
            return a
        return np.concatenate(
            [a, np.full((r,) + a.shape[1:], fill, a.dtype)], axis=0)

    return ClusterBvh(
        node_min=jnp.asarray(pad128(node_min_f, 1e30)),
        node_max=jnp.asarray(pad128(node_max_f, -1e30)),
        node_skip=jnp.asarray(pad128(bvh.node_skip, -1)),
        node_cluster=jnp.asarray(pad128(node_cluster, -1)),
        v0=jnp.asarray(pad128(v0)),
        e1=jnp.asarray(pad128(e1)),
        e2=jnp.asarray(pad128(e2)),
        tri_idx=jnp.asarray(pad128(tri_idx, -1)),
        n_nodes=m,
        n_clusters=c,
        k=k,
        subtree_mask=jnp.asarray(subtree_mask),
        uv=None if uv_t is None else jnp.asarray(pad128(uv_t)),
        face_nrm=None if fn_t is None else jnp.asarray(pad128(fn_t)),
        mat=None if mat_t is None else jnp.asarray(pad128(mat_t)),
    )


def refit_cluster_bvh(cb: ClusterBvh, tri_pos) -> ClusterBvh:
    """Re-bake the cluster tables + every node AABB from live triangle
    positions, topology fixed. Pure jnp (jit-safe) — the inverse-
    rendering train step calls this so VERTEX optimization runs on the
    sweep/cluster fast path instead of the gather walk (round-2 verdict
    item 4: baked tables went stale against tri_pos updates).

    `tri_pos` must be the same SAH-permuted (N, 3, 3) array family the
    tables were built from (clusters are consecutive K-runs of it).
    Padding semantics match build_cluster_bvh exactly: padding triangles
    are zeros (degenerate, never hit) and participate in cluster bounds
    the same way, so refit(cb, original_tri_pos) reproduces the built
    tables. Gradients do NOT flow through the refit tables (traversal is
    an opaque discrete selector); shading recomputes hit attributes from
    tri_pos directly.
    """
    import dataclasses

    if cb.subtree_mask is None:
        raise ValueError("ClusterBvh was built without a refit plan")
    c, k, m = cb.n_clusters, cb.k, cb.n_nodes
    pad_n = c * k
    take = min(tri_pos.shape[0], pad_n)
    tp = tri_pos[:take].astype(jnp.float32)
    if take < pad_n:
        # padding via zeros_like (derived from tri_pos) so the array
        # carries tri_pos's mesh/vma type under shard_map — a bare
        # jnp.zeros / broadcast_to trips the Manual-context mesh check
        # (same pattern as ops/intersect.py varying_zero)
        pad_rows = jnp.zeros_like(tp, shape=(pad_n - take, 3, 3))
        tp = jnp.concatenate([tp, pad_rows], axis=0)
    v0 = tp[:, 0].reshape(c, k, 3)
    e1 = (tp[:, 1] - tp[:, 0]).reshape(c, k, 3)
    e2 = (tp[:, 2] - tp[:, 0]).reshape(c, k, 3)

    corners = tp.reshape(c, k * 3, 3)
    cl_min = corners.min(axis=1)
    cl_max = corners.max(axis=1)
    big = 3.0e38
    nm = jnp.where(cb.subtree_mask[:, :, None], cl_min[None], big) \
        .min(axis=1)
    nx = jnp.where(cb.subtree_mask[:, :, None], cl_max[None], -big) \
        .max(axis=1)
    # slice+concat, NOT .at[].set: the scatter path broadcasts the update
    # with the operand's committed (replicated, Auto-mesh) sharding
    # attached, which the Manual mesh context inside shard_map rejects —
    # concatenate carries no sharding annotation.
    def splice(old, new):
        return jnp.concatenate([new, old[new.shape[0]:]], axis=0)

    extra = {}
    if cb.face_nrm is not None:
        # re-derive the oriented geometric normal from live edges; the
        # ingest orientation (Scene.cu:270-302 rule) is preserved by
        # sign-matching against the previous normal (same rule
        # shade_hits applies when it recomputes normals for AD).
        # Double-where normalization: padding rows are exactly zero,
        # where sqrt'(0)=inf would NaN-poison even ZERO cotangents in
        # the refit transpose (Scene.replace differentiates through
        # this on the way to a stop_gradient boundary).
        raw = jnp.cross(e1, e2)
        n2 = jnp.sum(raw * raw, axis=-1, keepdims=True)
        good = n2 > 1e-24
        raw = jnp.where(good,
                        raw / jnp.sqrt(jnp.where(good, n2, 1.0)), 0.0)
        old = cb.face_nrm[:c]
        sign = jnp.where(jnp.sum(raw * old, axis=-1, keepdims=True) < 0,
                         -1.0, 1.0)
        extra["face_nrm"] = splice(cb.face_nrm, raw * sign)

    return dataclasses.replace(
        cb,
        node_min=splice(cb.node_min, nm),
        node_max=splice(cb.node_max, nx),
        v0=splice(cb.v0, v0),
        e1=splice(cb.e1, e1),
        e2=splice(cb.e2, e2),
        **extra,
    )
