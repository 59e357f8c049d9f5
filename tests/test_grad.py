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

    # vertex optimization mutates tri_pos -> baked cluster tables go
    # stale; the gather traversal reads live geometry (documented
    # constraint, integrator._make_tracers)
    sg = s.replace(traversal="gather")

    def f(delta):
        # tilt the ground quad: raise ONE vertex of triangle 0 — changes
        # the face normal (NEE cosine + bounce lobe) and the hit point;
        # pure translation would be invisible to this integrator (constant
        # sun direction, directional sky)
        tp = jnp.asarray(base).at[0, 0, 1].add(delta.reshape(()))
        img = render_sample(scene.replace(tri_pos=tp), cam, lights,
                            jnp.uint32(0), width=W, height=H, settings=sg)
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
