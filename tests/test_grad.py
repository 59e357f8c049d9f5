"""Differentiability gates: AD pixel gradients vs finite-difference oracle
(BASELINE.json: 'pixel-grad allclose pass rate').

All cases use interior-hit configurations (no silhouette crossings) so
central differences are a valid oracle; see diff/fd.py docstring.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dustraytracer_tpu.diff.fd import check_grads_vs_fd
from dustraytracer_tpu.render.integrator import render_sample
from dustraytracer_tpu.scene.camera import make_camera
from dustraytracer_tpu.scene.settings import LightParams, RenderSettings

W = H = 16


@pytest.fixture(scope="module")
def setup(tri_scene):
    # camera staring straight down at the big ground quad: every ray hits
    # triangle interior, far from edges
    cam = make_camera(position=(0.2, 4.0, 0.3), forward=(0, -1, 0),
                      vfov_deg=25.0)
    s = RenderSettings(bounces=2, enable_tonemap=False, enable_gamma=False,
                       nee_cosine=True)
    lights = LightParams.from_settings(s)
    return tri_scene, cam, s, lights


def test_albedo_grads_match_fd(setup):
    scene, cam, s, lights = setup

    def f(albedo):
        img = render_sample(scene.replace(mat_albedo=albedo), cam, lights,
                            jnp.uint32(0), width=W, height=H, settings=s)
        return jnp.mean(img)

    check_grads_vs_fd(f, scene.mat_albedo, eps=5e-2, rtol=2e-2)


def test_sun_intensity_grad_matches_fd(setup):
    scene, cam, s, lights = setup

    def f(inten):
        li = jax.tree.map(lambda x: x, lights)
        li.sun_intensity = inten.reshape(())
        img = render_sample(scene, cam, li, jnp.uint32(0),
                            width=W, height=H, settings=s)
        return jnp.mean(img)

    check_grads_vs_fd(f, np.array([30.0]), eps=5e-1, rtol=2e-2)


def test_sky_color_grad_matches_fd(setup):
    scene, cam, s, lights = setup

    def f(sky):
        li = jax.tree.map(lambda x: x, lights)
        li.sky_color = sky
        img = render_sample(scene, cam, li, jnp.uint32(0),
                            width=W, height=H, settings=s)
        return jnp.mean(img)

    check_grads_vs_fd(f, np.array([0.2, 0.4, 1.0]), eps=2e-2, rtol=2e-2)


def test_camera_position_grad_matches_fd(setup):
    scene, cam, s, lights = setup

    def f(pos):
        c = cam.replace(position=pos)
        img = render_sample(scene, c, lights, jnp.uint32(0),
                            width=W, height=H, settings=s)
        return jnp.mean(img)

    # all-interior view: moving the camera slides hit points smoothly
    check_grads_vs_fd(f, np.array([0.2, 4.0, 0.3]), eps=5e-3, rtol=8e-2)


def test_vertex_position_grad_matches_fd(setup):
    """Interior geometric gradient: perturb the ground quad's vertices.

    The loss responds through hit distance, face normal (NEE cosine) and
    bounce direction — all recomputed differentiably from stop-gradiented
    hit ids (shade_hits)."""
    scene, cam, s, lights = setup

    base = np.asarray(scene.tri_pos)

    def f(delta):
        # tilt the ground quad: raise ONE vertex of triangle 0 — changes
        # the face normal (NEE cosine + bounce lobe) and the hit point;
        # pure translation would be invisible to this integrator (constant
        # sun direction, directional sky). Scene.replace re-bakes the
        # cluster tables from the live tri_pos (round-5 stale-table
        # guard), so this runs on the DEFAULT traversal path.
        tp = jnp.asarray(base).at[0, 0, 1].add(delta.reshape(()))
        img = render_sample(scene.replace(tri_pos=tp), cam, lights,
                            jnp.uint32(0), width=W, height=H, settings=s)
        return jnp.mean(img)

    ad, fd = check_grads_vs_fd(f, np.array([0.0]), eps=5e-3, rtol=8e-2)
    assert abs(float(ad[0])) > 1e-6, "gradient should be nonzero"


def test_light_params_pipeline_grad(setup):
    """grad through the full LightParams pytree in one call."""
    scene, cam, s, lights = setup

    def f(li):
        img = render_sample(scene, cam, li, jnp.uint32(0),
                            width=W, height=H, settings=s)
        return jnp.mean(img)

    g = jax.grad(f)(lights)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert float(jnp.abs(g.sun_intensity)) > 0
    assert float(jnp.abs(g.sky_intensity)) > 0


def test_grad_zero_through_traversal_ids(setup):
    """Traversal must be a pure selector: its outputs carry no gradient
    (stop_gradient contract)."""
    from dustraytracer_tpu.ops.traverse import traverse_closest

    scene, cam, s, lights = setup

    def f(tri_pos):
        sc = scene.replace(tri_pos=tri_pos)
        res = traverse_closest(sc, jnp.array([[0.0, 4.0, 0.0]]),
                               jnp.array([[0.0, -1.0, 0.0]]))
        return jnp.sum(res["t"])

    g = jax.grad(f)(scene.tri_pos)
    assert float(jnp.abs(g).max()) == 0.0


def test_soft_edge_silhouette_gradient():
    """Boundary-term gradient, ENVIRONMENT-backed: translating a quad
    whose silhouette is seen against the sky must produce a vertex
    gradient that gradient descent can follow back to the truth. With
    hard visibility this gradient is zero/undefined (the hit mask is
    discrete); soft_edges takes the deterministic sky-blend path here
    (continuation ray misses). Geometry-backed edges are covered by
    test_soft_edge_geometry_backed_gradient below.
    """
    from dustraytracer_tpu.scene.gltf import (GltfDocument, GltfMaterial)
    from dustraytracer_tpu.scene.scene import build_scene
    from tests.util_scenes import make_quad

    doc = GltfDocument(
        meshes=[("wall", [make_quad((0, 4, -2), 2, axis=2, mat=0)])],
        materials=[GltfMaterial(base_color=np.array([0.9, 0.2, 0.2],
                                                    np.float32))],
        images=[], cameras=[])
    scene = build_scene(doc, use_native=False)

    cam = make_camera(position=(0.0, 1.0, 2.0), look_at=(0.0, 4.0, -2.0),
                      vfov_deg=60.0)
    s = RenderSettings(bounces=1, enable_tonemap=False, enable_gamma=False,
                       enable_sunlight=False, soft_edges=0.08,
                       traversal="gather")
    lights = LightParams.from_settings(s)
    base = np.asarray(scene.tri_pos)

    true_dx = 0.3

    def render_at(dx, frame):
        tp = jnp.asarray(base).at[:2, :, 0].add(dx)
        return render_sample(scene.replace(tri_pos=tp), cam, lights,
                            frame, width=W, height=H, settings=s)

    target = render_at(jnp.float32(true_dx), jnp.uint32(0))

    def loss(dx, frame):
        return jnp.mean((render_at(dx, frame) - target) ** 2)

    grad_fn = jax.jit(jax.grad(loss))

    # Pointwise AD != FD at boundary-kink pixels (one-sided derivatives;
    # inherent to soft visibility under finite sampling), so the gate is
    # BEHAVIORAL: gradient descent on the silhouette must recover the
    # true translation. Hard visibility has zero gradient and goes
    # nowhere.
    import optax

    tx = optax.adam(0.03)
    dx = jnp.float32(0.0)
    opt = tx.init(dx)
    for step in range(200):
        g = grad_fn(dx, jnp.uint32(step % 8))
        upd, opt = tx.update(g, opt, dx)
        dx = optax.apply_updates(dx, upd)
    assert abs(float(dx) - true_dx) < 0.05, \
        f"silhouette optimization should recover dx={true_dx}, got {float(dx)}"

    # hard visibility: zero gradient, no movement
    s_hard = s.replace(soft_edges=0.0)

    def loss_hard(dx):
        tp = jnp.asarray(base).at[:2, :, 0].add(dx)
        img = render_sample(scene.replace(tri_pos=tp), cam, lights,
                            jnp.uint32(0), width=W, height=H,
                            settings=s_hard)
        return jnp.mean((img - target) ** 2)

    g_hard = float(jax.jit(jax.grad(loss_hard))(jnp.float32(0.0)))
    assert g_hard == 0.0, "hard visibility has no silhouette gradient"


def test_soft_edge_geometry_backed_gradient():
    """Boundary-term gradient, GEOMETRY-backed: an occluder quad seen
    against a big back wall (no sky behind the silhouette). Round 1's
    soft edges only blended toward the environment, so this exact setup
    had zero usable gradient (VERDICT r1 missing-item 3). The pass-through
    continuation branch makes it differentiable: descent must recover the
    occluder's translation.
    """
    import optax

    from dustraytracer_tpu.scene.gltf import GltfDocument, GltfMaterial
    from dustraytracer_tpu.scene.scene import build_scene
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

    cam = make_camera(position=(0.0, 2.0, 2.0), look_at=(0.0, 2.0, -1.0),
                      vfov_deg=55.0)
    s = RenderSettings(bounces=2, enable_tonemap=False, enable_gamma=False,
                       soft_edges=0.08, traversal="gather")
    lights = LightParams.from_settings(s)
    base = np.asarray(scene.tri_pos)
    true_dx = 0.25

    def render_at(dx, frame):
        # translate ONLY the occluder (triangles 0-1); the wall stays
        tp = jnp.asarray(base).at[:2, :, 0].add(dx)
        return render_sample(scene.replace(tri_pos=tp), cam, lights,
                             frame, width=W, height=H, settings=s)

    target = render_at(jnp.float32(true_dx), jnp.uint32(0))

    def loss(dx, frame):
        return jnp.mean((render_at(dx, frame) - target) ** 2)

    grad_fn = jax.jit(jax.grad(loss))

    # hard visibility: every pixel either sees the occluder or the wall —
    # zero gradient for the translation
    g_hard0 = jax.jit(jax.grad(
        lambda dx: jnp.mean((render_sample(
            scene.replace(tri_pos=jnp.asarray(base).at[:2, :, 0].add(dx)),
            cam, lights, jnp.uint32(0), width=W, height=H,
            settings=s.replace(soft_edges=0.0)) - target) ** 2)))
    assert float(g_hard0(jnp.float32(0.0))) == 0.0

    tx = optax.adam(0.02)
    dx = jnp.float32(0.0)
    opt = tx.init(dx)
    for step in range(400):
        g = (grad_fn(dx, jnp.uint32((2 * step) % 16))
             + grad_fn(dx, jnp.uint32((2 * step + 1) % 16))) / 2
        upd, opt = tx.update(g, opt, dx)
        dx = optax.apply_updates(dx, upd)
    assert abs(float(dx) - true_dx) < 0.05, \
        f"geometry-backed silhouette should recover dx={true_dx}, " \
        f"got {float(dx)}"


def test_soft_edges_off_matches_reference(tri_scene):
    """soft_edges=0 must leave the image bit-identical."""
    cam = make_camera(position=(0, 2, 6), look_at=(0, 1, 0), vfov_deg=50.0)
    s0 = RenderSettings(bounces=2, enable_tonemap=False, enable_gamma=False)
    lights = LightParams.from_settings(s0)
    a = render_sample(tri_scene, cam, lights, jnp.uint32(0),
                      width=W, height=H, settings=s0)
    b = render_sample(tri_scene, cam, lights, jnp.uint32(0), width=W,
                      height=H, settings=s0.replace(soft_edges=0.0))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
