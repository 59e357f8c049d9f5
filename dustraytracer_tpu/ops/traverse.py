"""Batched BVH traversal for TPU: wavefront, masked, stack-in-arrays.

The reference walks the BVH with one divergent per-thread loop and a
64-deep register stack (`/root/reference/DustRayTracer/src/Core/BVH/
BVHTraversal.cuh:14-134`). A TPU has no per-lane control flow, so this is
re-designed as a *lockstep wavefront*: all N rays advance one stack-pop
per iteration of a single `lax.while_loop`, with per-ray stacks held as an
(N, D) array and finished rays masked out. Every step is a fused batch of
VPU ops + gathers:

  pop node  ->  gather node SoA  ->  leaf?  intersect MAX_LEAF triangles
                                     inner? slab-test both children,
                                            push far-then-near (ordered)

Matching reference semantics:
- near-child-first ordering with distance culling against the current
  closest hit (`BVHTraversal.cuh:57-71`),
- leaf intersection keeps the closest passing hit (`:46-55`),
- visit-count "heat" accumulated for the BVH debug view (`:43`),
- any-hit variant without ordering, early-exit on first accepted hit
  (`traverseBVH_raytest`, `:76-134`),
- optional alpha-cutout AnyHit filter (`Shaders/AnyHit.cuh:8-28`).

Differentiation contract: traversal is a *discrete selector* — it returns
integer hit ids (and distances for control only). Callers recompute hit
attributes differentiably from `hit_idx` (see render/integrator.py and
diff/); the while_loop itself is never differentiated.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from dustraytracer_tpu.ops.intersect import moller_trumbore, ray_aabb_entry
from dustraytracer_tpu.scene.scene import MAX_LEAF

BIG = jnp.float32(3.4e38)


def _sample_alpha(scene, tex_idx, uv):
    """Point-sampled, wrapped alpha fetch (`Texture.cu:60-75`), batched.
    tex_idx: (...,) i32 (may be -1); uv: (..., 2). Returns alpha (...,)."""
    safe_tex = jnp.maximum(tex_idx, 0)
    hw = scene.tex_hw[safe_tex]  # (..., 2)
    h = hw[..., 0]
    w = hw[..., 1]
    fu = uv[..., 0] - jnp.floor(uv[..., 0])
    fv = uv[..., 1] - jnp.floor(uv[..., 1])
    x = jnp.clip((fu * w).astype(jnp.int32), 0, w - 1)
    y = jnp.clip((fv * h).astype(jnp.int32), 0, h - 1)
    a = scene.tex_stack[safe_tex, y, x, 3].astype(jnp.float32) / 255.0
    opaque = (tex_idx < 0) | ~scene.tex_has_alpha[safe_tex]
    return jnp.where(opaque, 1.0, a)


def _leaf_intersect(scene, node, origin, direction, hit_t, alpha_test):
    """Intersect the MAX_LEAF-wide triangle window of each ray's leaf.

    Returns (best_t, best_idx, best_valid) per ray. `node` may point at an
    internal node — caller masks. Vectorizes the reference's scalar prim
    loop (`BVHTraversal.cuh:46-55`) into an (N, L) batch.
    """
    first = scene.node_first[node]  # (N,)
    count = scene.node_count[node]
    lanes = jnp.arange(MAX_LEAF, dtype=jnp.int32)
    prim = first[:, None] + lanes[None, :]  # (N, L)
    in_leaf = lanes[None, :] < count[:, None]

    v0 = scene.tri_pos[prim, 0]  # (N, L, 3)
    v1 = scene.tri_pos[prim, 1]
    v2 = scene.tri_pos[prim, 2]
    valid, t, u, v = moller_trumbore(
        origin[:, None, :], direction[:, None, :], v0, v1, v2)
    valid = valid & in_leaf & (t < hit_t[:, None])

    if alpha_test:
        # AnyHit alpha cutout (AnyHit.cuh:8-28): reject candidate hits whose
        # albedo texture alpha < 1 at the interpolated UV.
        w_b = 1.0 - u - v
        uv_i = (w_b[..., None] * scene.tri_uv[prim, 0]
                + u[..., None] * scene.tri_uv[prim, 1]
                + v[..., None] * scene.tri_uv[prim, 2])
        mat = scene.tri_mat[prim]
        tex = scene.mat_albedo_tex[mat]
        alpha = _sample_alpha(scene, tex, uv_i)
        valid = valid & (alpha >= 1.0)

    t_masked = jnp.where(valid, t, BIG)
    j = jnp.argmin(t_masked, axis=1)
    rows = jnp.arange(t_masked.shape[0])
    best_t = t_masked[rows, j]
    best_idx = prim[rows, j]
    return best_t, best_idx, valid.any(axis=1)


@partial(jax.jit, static_argnames=("stack_depth", "alpha_test"))
def traverse_closest(scene, origin, direction, *, stack_depth: int,
                     alpha_test: bool = False):
    """Closest-hit BVH traversal for N rays.

    Args:
      scene: Scene pytree (flat SoA BVH + triangles).
      origin, direction: (N, 3) f32. Direction need not be normalized.
      stack_depth: static stack size (>= bvh depth + 1).
      alpha_test: enable the alpha-cutout AnyHit filter.

    Returns dict of (N,) arrays: `hit_idx` (i32, -1 = miss), `t` (f32,
    BIG on miss), `visits` (i32 node-visit heat, `BVHTraversal.cuh:43`).
    All returned values are wrapped in stop_gradient.
    """
    n = origin.shape[0]
    inv_dir = 1.0 / direction  # inf on zero components is slab-guarded
    rows = jnp.arange(n)

    stack = jnp.zeros((n, stack_depth), jnp.int32)  # root = node 0
    sptr = jnp.ones((n,), jnp.int32)
    hit_t = jnp.full((n,), BIG)
    hit_idx = jnp.full((n,), -1, jnp.int32)
    visits = jnp.zeros((n,), jnp.int32)

    def cond(carry):
        _stack, sptr, *_ = carry
        return jnp.any(sptr > 0)

    def body(carry):
        stack, sptr, hit_t, hit_idx, visits = carry
        active = sptr > 0
        top = jnp.maximum(sptr - 1, 0)
        node = stack[rows, top]
        sptr = jnp.where(active, sptr - 1, sptr)
        visits = visits + active.astype(jnp.int32)

        is_leaf = scene.node_count[node] > 0

        # --- leaf: vectorized triangle window ---
        leaf_mask = active & is_leaf
        best_t, best_idx, any_valid = _leaf_intersect(
            scene, node, origin, direction, hit_t, alpha_test)
        take = leaf_mask & any_valid & (best_t < hit_t)
        hit_t = jnp.where(take, best_t, hit_t)
        hit_idx = jnp.where(take, best_idx, hit_idx)

        # --- internal: slab-test both children, push far then near ---
        inner_mask = active & ~is_leaf
        left = scene.node_left[node]
        right = scene.node_right[node]
        lhit, lt = ray_aabb_entry(origin, inv_dir, scene.node_min[left],
                                  scene.node_max[left])
        rhit, rt = ray_aabb_entry(origin, inv_dir, scene.node_min[right],
                                  scene.node_max[right])
        lhit = lhit & (lt < hit_t)  # distance culling (BVHTraversal.cuh:63-70)
        rhit = rhit & (rt < hit_t)

        l_near = lt <= rt
        near_node = jnp.where(l_near, left, right)
        far_node = jnp.where(l_near, right, left)
        near_ok = inner_mask & jnp.where(l_near, lhit, rhit)
        far_ok = inner_mask & jnp.where(l_near, rhit, lhit)

        # Masked push via drop-mode scatter: lanes that don't push write
        # to column `stack_depth`, which is out of bounds and dropped.
        far_col = jnp.where(far_ok, sptr, stack_depth)
        stack = stack.at[rows, far_col].set(far_node, mode="drop")
        sptr = sptr + far_ok.astype(jnp.int32)
        near_col = jnp.where(near_ok, sptr, stack_depth)
        stack = stack.at[rows, near_col].set(near_node, mode="drop")
        sptr = sptr + near_ok.astype(jnp.int32)

        return stack, sptr, hit_t, hit_idx, visits

    _, _, hit_t, hit_idx, visits = jax.lax.while_loop(
        cond, body, (stack, sptr, hit_t, hit_idx, visits))
    stop = jax.lax.stop_gradient
    return {"hit_idx": stop(hit_idx), "t": stop(hit_t), "visits": stop(visits)}


@partial(jax.jit, static_argnames=("stack_depth", "alpha_test"))
def traverse_anyhit(scene, origin, direction, *, stack_depth: int,
                    alpha_test: bool = False, t_max=None):
    """Boolean occlusion query (shadow rays).

    Unordered walk with early exit on the first accepted hit — semantics
    of `traverseBVH_raytest` (`BVHTraversal.cuh:76-134`). Returns (N,)
    bool `occluded`.
    """
    n = origin.shape[0]
    inv_dir = 1.0 / direction
    rows = jnp.arange(n)
    limit = jnp.broadcast_to(BIG if t_max is None else t_max, (n,))

    stack = jnp.zeros((n, stack_depth), jnp.int32)
    sptr = jnp.ones((n,), jnp.int32)
    occluded = jnp.zeros((n,), bool)

    def cond(carry):
        _stack, sptr, occ = carry
        return jnp.any((sptr > 0) & ~occ)

    def body(carry):
        stack, sptr, occluded = carry
        active = (sptr > 0) & ~occluded
        top = jnp.maximum(sptr - 1, 0)
        node = stack[rows, top]
        sptr = jnp.where(active, sptr - 1, sptr)

        is_leaf = scene.node_count[node] > 0
        _t, _idx, any_valid = _leaf_intersect(
            scene, node, origin, direction, limit, alpha_test)
        occluded = occluded | (active & is_leaf & any_valid)

        inner_mask = active & ~is_leaf
        left = scene.node_left[node]
        right = scene.node_right[node]
        lhit, lt = ray_aabb_entry(origin, inv_dir, scene.node_min[left],
                                  scene.node_max[left])
        rhit, rt = ray_aabb_entry(origin, inv_dir, scene.node_min[right],
                                  scene.node_max[right])
        l_ok = inner_mask & lhit & (lt < limit)
        r_ok = inner_mask & rhit & (rt < limit)

        l_col = jnp.where(l_ok, sptr, stack_depth)
        stack = stack.at[rows, l_col].set(left, mode="drop")
        sptr = sptr + l_ok.astype(jnp.int32)
        r_col = jnp.where(r_ok, sptr, stack_depth)
        stack = stack.at[rows, r_col].set(right, mode="drop")
        sptr = sptr + r_ok.astype(jnp.int32)
        return stack, sptr, occluded

    _, _, occluded = jax.lax.while_loop(cond, body, (stack, sptr, occluded))
    return jax.lax.stop_gradient(occluded)
