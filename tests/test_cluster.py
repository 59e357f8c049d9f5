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
