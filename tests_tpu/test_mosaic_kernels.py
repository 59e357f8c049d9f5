"""Mosaic-compiled sweep kernel: on-device equivalence + golden gates.

Round-2 verdict item 2: the compiled (non-interpret) kernel — including
the HBM->SMEM paged node window — was exercised only by bench throughput;
a Mosaic miscompile would ship silently. These tests run the REAL kernel
on the chip and assert hit/t/visits equality against the XLA cluster
walk (`ops/traverse_cluster.py`, the interpret-mode-verified oracle),
plus the committed per-pixel goldens.

Role model in the reference: the debug-view visual oracles
(`RayGen.cuh:136-161`, `RendererSettings.h:12-20`) — automated.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from dustraytracer_tpu.accel.cluster import build_cluster_bvh
from dustraytracer_tpu.ops import traverse_sweep
from dustraytracer_tpu.ops.traverse_cluster import traverse_cluster
from dustraytracer_tpu.ops.traverse_sweep import traverse_cluster_sweep
from dustraytracer_tpu.scene.scene import build_scene
from tests.util_scenes import make_random_tri_doc

MODELS = "/root/reference/models"


@pytest.fixture(scope="module")
def soup():
    scene = build_scene(make_random_tri_doc(2000, seed=5), use_native=False)
    cb = build_cluster_bvh(np.asarray(scene.tri_pos), k=64)
    # resident mode budget covers all 8 octant orderings (round 5)
    assert 8 * cb.n_nodes <= traverse_sweep.MAX_SMEM_NODES
    return scene, cb


def _rays(n, seed, spread=12.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _assert_equiv(res, ref, t_rtol=1e-4, visits_exact=True):
    """visits_exact: True = bit-equal, False = cull-boundary envelope,
    None = skip visit comparison (different ORDERINGS legitimately
    visit different node sets — round-5 octant tables)."""
    hi, href = np.asarray(res["hit_idx"]), np.asarray(ref["hit_idx"])
    np.testing.assert_array_equal(hi >= 0, href >= 0)
    m = href >= 0
    # ties between coincident triangles may resolve differently; demand
    # overwhelming id agreement and t agreement everywhere
    assert (hi[m] == href[m]).mean() > 0.999, \
        f"id mismatch {(hi[m] != href[m]).sum()} of {m.sum()}"
    np.testing.assert_allclose(np.asarray(res["t"])[m],
                               np.asarray(ref["t"])[m], rtol=t_rtol)
    if visits_exact is None:
        return
    v, vref = np.asarray(res["visits"]), np.asarray(ref["visits"])
    if visits_exact:
        np.testing.assert_array_equal(v, vref)
    else:
        # Cross-FORMULATION tolerance: the kernel's planar (K,1)x(1,T)
        # Möller-Trumbore and the walk's vmapped one round hit_t apart in
        # the last ulp, so `t_enter < hit_t` culls can diverge on boxes
        # whose entry grazes the current hit. Dense scenes (katana) show
        # ~1.4% of lanes +-4 visits with IDENTICAL hits/t — reproduced
        # bit-for-bit in interpret mode on CPU (round-3 log), i.e. an
        # arithmetic-boundary property, not a Mosaic/paging defect. The
        # same-kernel paged-vs-resident comparison stays bit-exact.
        mm = v != vref
        assert mm.mean() < 0.02 and np.abs(v - vref).max() <= 8, (
            f"visits diverge beyond the cull-boundary envelope: "
            f"{mm.sum()} lanes, max |d| {np.abs(v - vref).max()}")


def test_sweep_resident_matches_cluster_walk(soup):
    """Compiled resident-mode kernel == XLA cluster walk on an
    incoherent ray soup.

    Two comparisons since round 5's per-tile octant orderings:
    - base-ordering kernel (octant tables stripped -> the impl
      replicates the base threading 8x): bit-level ids AND visit
      counts against the walk, the original gate;
    - full octant-ordered kernel: identical hits/t; visits drop on
      average (that is the point of near-first ordering: more culls)."""
    import dataclasses

    _scene, cb = soup
    o, d = _rays(4096, 7)
    cb_base = dataclasses.replace(cb, oct_min=None, oct_max=None,
                                  oct_skip=None, oct_cluster=None,
                                  oct_perm0=None)
    res = traverse_cluster_sweep(cb_base, o, d)
    ref = traverse_cluster(cb, o, d)
    _assert_equiv(res, ref)

    res_oct = traverse_cluster_sweep(cb, o, d)
    _assert_equiv(res_oct, ref, visits_exact=None)
    v_oct = np.asarray(res_oct["visits"]).mean()
    v_base = np.asarray(ref["visits"]).mean()
    assert v_oct <= v_base * 1.05, (
        f"octant ordering should not add visits on average "
        f"({v_oct:.2f} vs base {v_base:.2f})")


def test_sweep_anyhit_matches_cluster_walk(soup):
    _scene, cb = soup
    o, d = _rays(4096, 11)
    res = traverse_cluster_sweep(cb, o, d, anyhit=True)
    ref = traverse_cluster(cb, o, d, anyhit=True)
    np.testing.assert_array_equal(np.asarray(res["hit_idx"]) >= 0,
                                  np.asarray(ref["hit_idx"]) >= 0)


def test_sweep_paged_forced_matches_resident(soup, monkeypatch):
    """Force the DMA paging path on a small scene (MAX_SMEM_NODES
    lowered so the node tables stream through the 2-slot SMEM window)
    and demand bit-identical results to the resident-mode kernel."""
    _scene, cb = soup
    o, d = _rays(4096, 13)
    resident = traverse_cluster_sweep(cb, o, d)
    monkeypatch.setattr(traverse_sweep, "MAX_SMEM_NODES", 8)
    traverse_sweep._OPAQUE_CACHE.clear()  # drop traced closures
    paged = traverse_cluster_sweep(cb, o, d)
    try:
        for k in ("hit_idx", "t", "visits"):
            np.testing.assert_array_equal(np.asarray(paged[k]),
                                          np.asarray(resident[k]))
    finally:
        monkeypatch.undo()
        traverse_sweep._OPAQUE_CACHE.clear()


def test_sweep_natural_paged_katana():
    """valorant_katana (90k tris, 2835 nodes) pages naturally; the
    compiled paged walk must match the XLA cluster walk on-device."""
    from dustraytracer_tpu.scene import load_scene

    path = os.path.join(MODELS, "valorant_katana.glb")
    if not os.path.exists(path):
        pytest.skip("valorant_katana.glb not bundled")
    scene = load_scene(path)
    cb = scene.cluster
    assert cb.n_nodes > traverse_sweep.MAX_SMEM_NODES  # really paged
    rng = np.random.default_rng(3)
    # rays aimed at the blade from a shell around it
    o = rng.uniform(-1, 1, (2048, 3)).astype(np.float32) * [2, 1, 2] \
        + [0, 2.9, 1.5]
    t = rng.uniform(-0.5, 0.5, (2048, 3)).astype(np.float32) + [0, 2.9, 0]
    d = t - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    res = traverse_cluster_sweep(cb, o, d)
    ref = traverse_cluster(cb, o, d)
    # visits: the octant-ordered kernel walks a different threading than
    # the base-ordering XLA walk — only hits/t are comparable
    _assert_equiv(res, ref, visits_exact=None)
    assert int(np.sum(np.asarray(res["hit_idx"]) >= 0)) > 100  # non-trivial


@pytest.mark.parametrize("name", ["cornell_box", "suzanne_plane"])
def test_exact_golden_on_tpu(name):
    """The committed per-pixel goldens, regenerated ON THE CHIP.

    CPU and TPU disagree only through XLA fusion/rounding order and the
    f32-HIGHEST one-hot contractions (selection exact by construction);
    the gate is the same 'storage quantization + numerics drift' budget
    as the CPU tier, widened 2x for the cross-backend comparison.
    """
    from tests.test_reference_parity import _load_golden, _render

    golden, meta = _load_golden(f"{name}_exact")
    img = _render(meta)
    diff = np.abs(img - golden)
    assert diff.max() < 4e-3, (
        f"max per-pixel diff {diff.max():.5f} at "
        f"{np.unravel_index(diff.argmax(), diff.shape)}")
