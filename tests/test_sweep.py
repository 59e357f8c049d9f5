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


def test_sweep_emit_attrs_match_shade_recompute():
    """emit_attrs=True: the kernel's in-kernel shading fetch (winner
    u/v, interpolated uv, oriented face normal, material id) must equal
    the wavefront recompute from the hit ids."""
    scene = build_scene(make_random_tri_doc(500, seed=9), use_native=False)
    cb = scene.cluster
    assert cb.uv is not None and cb.face_nrm is not None
    rng = np.random.default_rng(4)
    o = rng.uniform(-12, 12, (700, 3)).astype(np.float32)
    tgt = rng.uniform(-4, 4, (700, 3)).astype(np.float32)  # aim at soup
    d = tgt - o
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    o = jnp.asarray(o)

    res = traverse_cluster_sweep(cb, o, d, interpret=True,
                                 emit_attrs=True)
    hit = np.asarray(res["hit_idx"])
    m = hit >= 0
    assert m.sum() > 50

    from dustraytracer_tpu.ops.intersect import moller_trumbore
    safe = np.maximum(hit, 0)
    tp = np.asarray(scene.tri_pos)
    _ok, t_ref, u_ref, v_ref = (np.asarray(x) for x in moller_trumbore(
        o, d, jnp.asarray(tp[safe, 0]), jnp.asarray(tp[safe, 1]),
        jnp.asarray(tp[safe, 2])))
    np.testing.assert_allclose(np.asarray(res["u"])[m], u_ref[m],
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(res["v"])[m], v_ref[m],
                               rtol=2e-3, atol=2e-4)
    uv_tab = np.asarray(scene.tri_uv)[safe]
    w_ref = 1.0 - u_ref - v_ref
    uv_ref = (w_ref[:, None] * uv_tab[:, 0] + u_ref[:, None] * uv_tab[:, 1]
              + v_ref[:, None] * uv_tab[:, 2])
    np.testing.assert_allclose(np.asarray(res["uv"])[m], uv_ref[m],
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(res["face_nrm"])[m],
                               np.asarray(scene.tri_face_nrm)[safe][m],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(res["mat"])[m],
                                  np.asarray(scene.tri_mat)[safe][m])


def test_sweep_emit_attrs_same_hits_as_plain():
    """Attribute emission must not perturb the walk itself."""
    scene = build_scene(make_random_tri_doc(300, seed=2), use_native=False)
    cb = scene.cluster
    rng = np.random.default_rng(6)
    o = jnp.asarray(rng.uniform(-10, 10, (512, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(512, 3)).astype(np.float32))
    plain = traverse_cluster_sweep(cb, o, d, interpret=True)
    emit = traverse_cluster_sweep(cb, o, d, interpret=True,
                                  emit_attrs=True)
    for key in ("hit_idx", "t", "visits"):
        np.testing.assert_array_equal(np.asarray(plain[key]),
                                      np.asarray(emit[key]))


def test_kernel_shade_fetch_matches_wavefront_render():
    """Full render with shade_fetch='kernel' (in-kernel attribute
    emission, sweep forced in interpret mode) vs the wavefront gather
    fetch on the same sweep traversal: same RNG, same discrete
    decisions, so images agree except where float-identical t/uv
    recomputation vs kernel emission (~1e-6 relative) lands a bounce on
    a different side of a silhouette — gate on the 99th percentile."""
    from dustraytracer_tpu.render.integrator import render_sample
    from dustraytracer_tpu.scene.camera import make_camera
    from dustraytracer_tpu.scene.settings import LightParams, RenderSettings

    scene = build_scene(make_random_tri_doc(400, seed=3), use_native=False)
    cam = make_camera(position=(0, 2, 12), look_at=(0, 0, 0), vfov_deg=50)
    base = RenderSettings(bounces=2, enable_tonemap=False,
                          enable_gamma=False, traversal="sweep")
    lights = LightParams.from_settings(base)

    a = np.asarray(render_sample(
        scene, cam, lights, jnp.uint32(1), width=48, height=48,
        settings=base.replace(shade_fetch="kernel")))
    b = np.asarray(render_sample(
        scene, cam, lights, jnp.uint32(1), width=48, height=48,
        settings=base.replace(shade_fetch="gather")))
    assert np.isfinite(a).all()
    diff = np.abs(a - b)
    assert np.quantile(diff, 0.99) < 1e-3, np.quantile(diff, 0.99)
    assert np.median(diff) < 1e-5


def test_kernel_shade_fetch_material_gradients_flow():
    """shade_fetch='kernel' keeps material/light gradients alive (only
    geometry becomes stop-gradient)."""
    from dustraytracer_tpu.render.integrator import render_pixels
    from dustraytracer_tpu.scene.camera import make_camera
    from dustraytracer_tpu.scene.settings import LightParams, RenderSettings

    scene = build_scene(make_random_tri_doc(300, seed=8), use_native=False)
    cam = make_camera(position=(0, 2, 12), look_at=(0, 0, 0), vfov_deg=50)
    s = RenderSettings(bounces=2, enable_tonemap=False, enable_gamma=False,
                       traversal="sweep", shade_fetch="kernel")
    lights = LightParams.from_settings(s)
    ids = jnp.arange(24 * 24, dtype=jnp.int32)

    def loss(albedo):
        img = render_pixels(scene.replace(mat_albedo=albedo), cam, lights,
                            jnp.uint32(0), ids, width=24, height=24,
                            settings=s)
        return jnp.mean(img)

    g = np.asarray(jax.grad(loss)(scene.mat_albedo))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0.0


def test_kernel_shade_fetch_vertex_grads_match_onehot():
    """Round-4 contract (VERDICT r3 items 1/4): shade_fetch='kernel' is
    gradient-COMPLETE — tri_pos gradients from the custom-VJP backward
    recompute (integrator._kernel_shade) must match the wavefront
    one-hot fetch path's, and must be nonzero."""
    from dustraytracer_tpu.render.integrator import render_pixels
    from dustraytracer_tpu.scene.camera import make_camera
    from dustraytracer_tpu.scene.settings import LightParams, RenderSettings

    scene = build_scene(make_random_tri_doc(400, seed=12), use_native=False)
    cam = make_camera(position=(0, 2, 12), look_at=(0, 0, 0), vfov_deg=50)
    lights = LightParams.from_settings(RenderSettings())
    ids = jnp.arange(16 * 16, dtype=jnp.int32)

    def loss(tri_pos, fetch):
        s = RenderSettings(bounces=2, enable_tonemap=False,
                           enable_gamma=False, traversal="sweep",
                           shade_fetch=fetch)
        img = render_pixels(scene.replace(tri_pos=tri_pos), cam, lights,
                            jnp.uint32(0), ids, width=16, height=16,
                            settings=s)
        return jnp.mean(img)

    gk = np.asarray(jax.grad(lambda tp: loss(tp, "kernel"))(scene.tri_pos))
    go = np.asarray(jax.grad(lambda tp: loss(tp, "onehot"))(scene.tri_pos))
    assert np.isfinite(gk).all()
    assert np.abs(gk).max() > 0.0
    scale = np.abs(go).max()
    np.testing.assert_allclose(gk, go, atol=2e-4 * scale, rtol=2e-3)


def test_kernel_shade_fetch_camera_grads_match_onehot():
    """Camera-ray gradients (through origin/direction -> t/u/v -> uv ->
    bilinear texture weights) survive the kernel fetch and agree with
    the one-hot path. A textured material + bilinear filtering makes
    the radiance CONTINUOUS in camera position (flat albedo would be
    piecewise-constant: zero gradient a.e. in both paths)."""
    import numpy as _np

    from dustraytracer_tpu.render.integrator import render_pixels
    from dustraytracer_tpu.scene.camera import make_camera
    from dustraytracer_tpu.scene.gltf import GltfMaterial
    from dustraytracer_tpu.scene.settings import LightParams, RenderSettings

    doc = make_random_tri_doc(300, seed=4)
    rng = _np.random.default_rng(0)
    tex = rng.integers(0, 255, (8, 8, 4), dtype=_np.uint8)
    tex[..., 3] = 255
    doc = doc.__class__(meshes=doc.meshes,
                        materials=[GltfMaterial(base_color_texture=0)],
                        images=[tex], cameras=doc.cameras)
    scene = build_scene(doc, use_native=False)
    cam = make_camera(position=(0, 2, 12), look_at=(0, 0, 0), vfov_deg=50)
    lights = LightParams.from_settings(RenderSettings())
    ids = jnp.arange(16 * 16, dtype=jnp.int32)

    def loss(position, fetch):
        s = RenderSettings(bounces=1, enable_tonemap=False,
                           enable_gamma=False, traversal="sweep",
                           shade_fetch=fetch, tex_filter="bilinear")
        img = render_pixels(scene, cam.replace(position=position), lights,
                            jnp.uint32(0), ids,
                            width=16, height=16, settings=s)
        return jnp.mean(img)

    gk = np.asarray(jax.grad(lambda p: loss(p, "kernel"))(cam.position))
    go = np.asarray(jax.grad(lambda p: loss(p, "onehot"))(cam.position))
    assert np.isfinite(gk).all()
    assert np.abs(gk).max() > 0.0
    np.testing.assert_allclose(gk, go, rtol=5e-3,
                               atol=2e-4 * np.abs(go).max())


def test_resolve_fetch_auto_crossovers(monkeypatch):
    """Auto shade_fetch crossovers (round-4 measured): onehot to ~12k
    tris, in-kernel fetch for dense upper-mid scenes (gradient-safe via
    _kernel_shade — the r3 auto pick that silently zeroed vertex grads
    is covered by the grad-equality tests above), packed gathers
    beyond; incompatible modes force the wavefront fetch."""
    from dustraytracer_tpu.render import integrator as ig
    from dustraytracer_tpu.scene.settings import RenderSettings

    # >512 padded tris so the auto-brute crossover doesn't mask the pick
    scene = build_scene(make_random_tri_doc(600, seed=1), use_native=False)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    import dataclasses

    def with_n(n):
        return dataclasses.replace(
            scene, tri_pos=jnp.zeros((n, 3, 3)), cluster=scene.cluster)

    assert ig._resolve_fetch(with_n(9000), RenderSettings()) == "onehot"
    assert ig._resolve_fetch(with_n(15000), RenderSettings()) == "kernel"
    assert ig._resolve_fetch(
        with_n(15000), RenderSettings(smooth_shading=True)) == "onehot"
    assert ig._resolve_fetch(with_n(20000), RenderSettings()) == "gather"
