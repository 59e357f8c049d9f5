"""Min-sweep Pallas kernel: equivalence with the XLA cluster walk.

Runs in interpret mode on CPU (the tests' 8-virtual-device backend);
the real Mosaic compile is exercised on TPU by bench.py and the render
CLI. Kernel contract: identical hits to traverse_cluster / the gather
walk, zero gradients (discrete-selector custom_vjp).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dustraytracer_tpu.accel.cluster import build_cluster_bvh
from dustraytracer_tpu.ops.traverse import traverse_closest
from dustraytracer_tpu.ops.traverse_cluster import traverse_cluster
from dustraytracer_tpu.ops.traverse_sweep import traverse_cluster_sweep
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


def test_sweep_matches_gather_closest(soup):
    scene, cb = soup
    o, d = _rays(999, 7)  # deliberately not a TILE multiple
    rs = traverse_cluster_sweep(cb, o, d, interpret=True)
    rg = traverse_closest(scene, o, d)
    i_s, i_g = np.asarray(rs["hit_idx"]), np.asarray(rg["hit_idx"])
    np.testing.assert_array_equal(i_s >= 0, i_g >= 0)
    m = i_g >= 0
    np.testing.assert_allclose(np.asarray(rs["t"])[m],
                               np.asarray(rg["t"])[m], rtol=1e-4)
    np.testing.assert_array_equal(i_s[m], i_g[m])


def test_sweep_anyhit_and_tmax(soup):
    scene, cb = soup
    o, d = _rays(512, 11)
    sa = traverse_cluster_sweep(cb, o, d, anyhit=True, interpret=True)
    ca = traverse_cluster(cb, o, d, anyhit=True)
    np.testing.assert_array_equal(np.asarray(sa["hit_idx"]) >= 0,
                                  np.asarray(ca["hit_idx"]) >= 0)
    # shadow-ray style t limit
    sl = traverse_cluster_sweep(cb, o, d, anyhit=True,
                                t_max=jnp.float32(0.5), interpret=True)
    cl = traverse_cluster(cb, o, d, anyhit=True, t_max=jnp.float32(0.5))
    np.testing.assert_array_equal(np.asarray(sl["hit_idx"]) >= 0,
                                  np.asarray(cl["hit_idx"]) >= 0)


def test_sweep_analytic_hit_and_visits():
    scene = make_tri_scene()
    cb = build_cluster_bvh(np.asarray(scene.tri_pos), k=8)
    res = traverse_cluster_sweep(cb, jnp.array([[0.0, 3.0, 0.0]]),
                                 jnp.array([[0.0, -1.0, 0.0]]),
                                 interpret=True)
    assert int(res["hit_idx"][0]) >= 0
    np.testing.assert_allclose(float(res["t"][0]), 3.0, rtol=1e-5)
    assert int(res["visits"][0]) >= 1  # BVH heat view needs real counts


def test_ray_sort_is_invisible(soup):
    """_sorted_tracers must return results in original ray order."""
    from dustraytracer_tpu.render.integrator import _sorted_tracers
    scene, cb = soup
    o, d = _rays(777, 5)

    def closest(oo, dd):
        return traverse_cluster(cb, oo, dd)

    def anyhit(oo, dd):
        return traverse_cluster(cb, oo, dd, anyhit=True)["hit_idx"] >= 0

    sc, sa = _sorted_tracers(scene, closest, anyhit)
    plain, srt = closest(o, d), sc(o, d)
    np.testing.assert_array_equal(np.asarray(plain["hit_idx"]),
                                  np.asarray(srt["hit_idx"]))
    np.testing.assert_allclose(np.asarray(plain["t"]),
                               np.asarray(srt["t"]))
    np.testing.assert_array_equal(np.asarray(anyhit(o, d)),
                                  np.asarray(sa(o, d)))


def test_sweep_zero_gradient_contract(soup):
    _, cb = soup
    o, d = _rays(64, 3)

    def f(origin):
        r = traverse_cluster_sweep(cb, origin, d, interpret=True)
        return jnp.sum(r["t"] * (r["t"] < 1e30))

    g = jax.grad(f)(o)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_sweep_paged_matches_resident(monkeypatch):
    """Paged mode (node tables streamed HBM->SMEM in PAGE windows) must
    walk identically to resident mode. Forced on a small scene by
    shrinking the thresholds; multi-page coverage: m >> PAGE."""
    import dustraytracer_tpu.ops.traverse_sweep as tsw

    scene = build_scene(make_random_tri_doc(900, seed=5), use_native=False)
    cb = build_cluster_bvh(np.asarray(scene.tri_pos), k=8)
    assert cb.n_nodes > 128, cb.n_nodes  # several 32-node pages

    o, d = _rays(700, 3)
    resident = traverse_cluster_sweep(cb, o, d, interpret=True)

    monkeypatch.setattr(tsw, "MAX_SMEM_NODES", 16)
    monkeypatch.setattr(tsw, "PAGE", 32)
    tsw._OPAQUE_CACHE.clear()  # cached closures baked the old thresholds
    paged = traverse_cluster_sweep(cb, o, d, interpret=True)
    tsw._OPAQUE_CACHE.clear()

    np.testing.assert_array_equal(np.asarray(paged["hit_idx"]),
                                  np.asarray(resident["hit_idx"]))
    np.testing.assert_allclose(np.asarray(paged["t"]),
                               np.asarray(resident["t"]), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(paged["visits"]),
                                  np.asarray(resident["visits"]))
