"""Alpha-cutout any-hit coverage + golden-render regression tests.

The reference has no automated tests; its de-facto fixtures are the
bundled probe scenes (SURVEY §4). We turn them into real regressions:
- mcTransparencyTest.glb exercises the AnyHit alpha path
  (`AnyHit.cuh:8-28`),
- golden hashes of tiny deterministic renders catch unintended behavior
  changes in the full pipeline (update deliberately when semantics
  change).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dustraytracer_tpu.render.integrator import render_sample
from dustraytracer_tpu.scene import load_scene, make_camera
from dustraytracer_tpu.scene.settings import LightParams, RenderSettings

MODELS = "/root/reference/models"


@pytest.fixture(scope="module")
def mc_scene():
    return load_scene(f"{MODELS}/minecraft/mcTransparencyTest.glb")


def test_alpha_scene_has_alpha_textures(mc_scene):
    assert bool(np.asarray(mc_scene.tex_has_alpha).any())


def test_alpha_test_changes_image(mc_scene):
    """Enabling alpha-cutout must let rays pass through cutout texels —
    the rendered image must differ from the opaque render."""
    # aim at the scene bbox center
    lo = np.asarray(mc_scene.node_min[0])
    hi = np.asarray(mc_scene.node_max[0])
    center = (lo + hi) / 2
    size = float(np.linalg.norm(hi - lo))
    cam = make_camera(position=center + np.array([0, 0.15 * size, 0.8 * size]),
                      look_at=center, vfov_deg=55.0)
    base = RenderSettings(bounces=2, enable_tonemap=False,
                          enable_gamma=False)
    lights = LightParams.from_settings(base)
    opaque = np.asarray(render_sample(mc_scene, cam, lights, jnp.uint32(0),
                                      width=64, height=64, settings=base))
    cut = np.asarray(render_sample(
        mc_scene, cam, lights, jnp.uint32(0), width=64, height=64,
        settings=base.replace(alpha_test=True)))
    assert np.isfinite(cut).all()
    assert not np.array_equal(opaque, cut)


def test_alpha_fast_path_matches_gather(mc_scene):
    """The cluster fast path handles cutout by re-tracing past
    transparent hits (integrator._alpha_retrace_tracers); it must render
    the same image as the gather walk's in-traversal AnyHit filter."""
    lo = np.asarray(mc_scene.node_min[0])
    hi = np.asarray(mc_scene.node_max[0])
    center = (lo + hi) / 2
    size = float(np.linalg.norm(hi - lo))
    cam = make_camera(position=center + np.array([0, 0.15 * size, 0.8 * size]),
                      look_at=center, vfov_deg=55.0)
    base = RenderSettings(bounces=2, enable_tonemap=False,
                          enable_gamma=False, alpha_test=True)
    lights = LightParams.from_settings(base)
    fast = np.asarray(render_sample(
        mc_scene, cam, lights, jnp.uint32(0), width=64, height=64,
        settings=base.replace(traversal="cluster")))
    gather = np.asarray(render_sample(
        mc_scene, cam, lights, jnp.uint32(0), width=64, height=64,
        settings=base.replace(traversal="gather")))
    # identical RNG -> identical decisions except where cutout and
    # opaque geometry (near-)coincide, where the winner is traversal-
    # order-defined (same as the reference's stack order): allow a tiny
    # fraction of differing pixels, not none
    diff = np.abs(fast - gather).max(axis=-1)
    assert (diff > 1e-3).mean() < 0.005
    assert np.isfinite(fast).all()


def test_alpha_anyhit_direct():
    """Unit-level: a ray through a fully-transparent texel region is not
    occluded; through an opaque texel it is."""
    import dataclasses

    from dustraytracer_tpu.ops.traverse import traverse_anyhit
    from tests.util_scenes import make_tri_scene

    scene = make_tri_scene()
    # give material 1 (the wall quad at z=-2) an alpha texture: left half
    # transparent (alpha 0), right half opaque
    tex = np.zeros((1, 8, 8, 4), np.uint8)
    tex[..., :3] = 128
    tex[:, :, 4:, 3] = 255  # u >= 0.5 opaque
    scene = scene.replace(
        tex_stack=jnp.asarray(tex),
        tex_hw=jnp.asarray([[8, 8]], np.int32),
        tex_has_alpha=jnp.asarray([True]),
        mat_albedo_tex=jnp.asarray([-1, 0], np.int32),
    )
    # wall spans x in [-1, 1], uv.u = 0..1 left-to-right
    o = jnp.asarray([[-0.5, 1.0, 2.0], [0.5, 1.0, 2.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]], jnp.float32)
    occ = np.asarray(traverse_anyhit(scene, o, d, alpha_test=True))
    assert not occ[0], "transparent texel must not occlude"
    assert occ[1], "opaque texel must occlude"
    occ_no = np.asarray(traverse_anyhit(scene, o, d, alpha_test=False))
    assert occ_no.all(), "without alpha test both rays hit the wall"


GOLDEN = {
    # (scene, camera preset) -> (mean, std) of a 32x32 1-bounce render,
    # frame 0, default settings minus sun (deterministic, fast)
    "cornell_box.glb": (0.3209, 0.4872),
    "suzanne_plane.glb": (0.8178, 0.4482),
}


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_golden_stats(name):
    scene = load_scene(f"{MODELS}/{name}")
    lo = np.asarray(scene.node_min[0])
    hi = np.asarray(scene.node_max[0])
    center = (lo + hi) / 2
    size = float(np.linalg.norm(hi - lo))
    cam = make_camera(position=center + np.array([0.3, 0.2, 0.9]) * size,
                      look_at=center, vfov_deg=50.0)
    s = RenderSettings(bounces=1, enable_sunlight=False)
    lights = LightParams.from_settings(s)
    img = np.asarray(render_sample(scene, cam, lights, jnp.uint32(0),
                                   width=32, height=32, settings=s))
    mean, std = GOLDEN[name]
    assert abs(float(img.mean()) - mean) < 2e-3, \
        f"{name}: mean {img.mean():.4f} != golden {mean}"
    assert abs(float(img.std()) - std) < 2e-3, \
        f"{name}: std {img.std():.4f} != golden {std}"


def test_alpha_retrace_epsilon_contract():
    """Pin the re-trace epsilon semantics on the cluster fast path
    (integrator._alpha_retrace_tracers): opaque geometry separated from a
    fully-transparent cutout by >= 1e-3 of the hit distance must ALWAYS
    be found by the re-trace — the advance epsilon (t*(1+1e-5)+1e-5) may
    only skip geometry closer than ~2e-5*t, which is the documented
    trade-off (VERDICT r1 weak-7)."""
    import dataclasses

    from dustraytracer_tpu.render.integrator import _make_tracers
    from dustraytracer_tpu.scene.gltf import (GltfDocument, GltfMaterial)
    from dustraytracer_tpu.scene.scene import build_scene
    from dustraytracer_tpu.scene.settings import RenderSettings
    from tests.util_scenes import make_quad

    for sep in (1e-3, 1e-2, 0.1, 1.0):
        doc = GltfDocument(
            meshes=[("cutout", [make_quad((0, 0, -1.0), 4, axis=2, mat=0)]),
                    ("opaque", [make_quad((0, 0, -1.0 - sep), 4, axis=2,
                                          mat=1)])],
            materials=[GltfMaterial(base_color=np.ones(3, np.float32),
                                    base_color_texture=0),
                       GltfMaterial(base_color=np.ones(3, np.float32))],
            images=[np.zeros((4, 4, 4), np.uint8)],  # alpha 0 everywhere
            cameras=[])
        scene = build_scene(doc, use_native=False)
        s = RenderSettings(alpha_test=True, traversal="cluster")
        closest, anyhit = _make_tracers(scene, s)
        o = jnp.asarray([[0.0, 0.0, 2.0]], jnp.float32)
        d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
        r = closest(o, d)
        hit = int(np.asarray(r["hit_idx"])[0])
        t = float(np.asarray(r["t"])[0])
        # must land on the opaque quad (triangles 2-3 pre-BVH-reorder;
        # check by distance: t == 3 + sep)
        assert hit >= 0, f"sep={sep}: cutout skipped everything"
        np.testing.assert_allclose(t, 3.0 + sep, rtol=1e-4,
                                   err_msg=f"sep={sep}")
        assert bool(np.asarray(anyhit(o, d))[0])


def test_alpha_retrace_epsilon_boundary():
    """Pin the epsilon BOUNDARY itself (VERDICT r2 weak #6), both sides.

    The re-trace advances to adv = t*(1+1e-5) + 1e-5; with the cutout at
    t=3 the skip window ends at ~3.00004. Construct opaque geometry just
    OUTSIDE the window (sep=2e-4, 5x margin) -> must be found, and
    essentially COINCIDENT (sep=1e-6, inside the window) -> deterministic
    miss: coincident-with-cutout geometry is treated as part of the
    cutout. That replaces 'traversal-order-defined' with a pinned
    contract at the boundary."""
    from dustraytracer_tpu.render.integrator import _make_tracers
    from dustraytracer_tpu.scene.gltf import GltfDocument, GltfMaterial
    from dustraytracer_tpu.scene.scene import build_scene
    from dustraytracer_tpu.scene.settings import RenderSettings
    from tests.util_scenes import make_quad

    def trace(sep):
        doc = GltfDocument(
            meshes=[("cutout", [make_quad((0, 0, -1.0), 4, axis=2, mat=0)]),
                    ("opaque", [make_quad((0, 0, -1.0 - sep), 4, axis=2,
                                          mat=1)])],
            materials=[GltfMaterial(base_color=np.ones(3, np.float32),
                                    base_color_texture=0),
                       GltfMaterial(base_color=np.ones(3, np.float32))],
            images=[np.zeros((4, 4, 4), np.uint8)],  # alpha 0 everywhere
            cameras=[])
        scene = build_scene(doc, use_native=False)
        s = RenderSettings(alpha_test=True, traversal="cluster")
        closest, _anyhit = _make_tracers(scene, s)
        r = closest(jnp.asarray([[0.0, 0.0, 2.0]], jnp.float32),
                    jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32))
        return int(np.asarray(r["hit_idx"])[0]), float(np.asarray(r["t"])[0])

    # outside the skip window: must find the opaque quad
    hit, t = trace(2e-4)
    assert hit >= 0
    np.testing.assert_allclose(t, 3.0 + 2e-4, rtol=1e-5)
    # inside the window (near-coincident): pinned to 'part of the cutout'
    hit, _t = trace(1e-6)
    assert hit < 0, "coincident geometry must resolve as cutout (miss)"
