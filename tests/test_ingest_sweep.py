"""Ingest robustness sweep over the reference's bundled scene zoo.

The reference ships ~26 .glb files it only ever loads by hand
(`EditorLayer.cpp:50` hardcodes one path). We treat the whole zoo as an
ingest regression corpus: every file must parse, build a BVH, and
produce internally-consistent SoA arrays. A representative subset keeps
the suite fast while covering the stress axes: many textures
(mcMidTest: 29), many materials (lightweightRTtest: 17), big soup
(valorant_katana: 90,736 tris), multi-texture character (animemaid),
node hierarchy (sceneHierTest).
"""

import os

import numpy as np
import pytest

MODELS = "/root/reference/models"

SWEEP = [
    "animemaid.glb",
    "lightweightRTtest.glb",
    "minecraft/mcMidTest.glb",
    "valorant_katana.glb",
    "cube_plane.glb",
    "test/uvTextureCube.glb",
    "sceneHierTest.glb",
]


@pytest.mark.parametrize("rel", SWEEP)
def test_ingest(rel):
    path = os.path.join(MODELS, rel)
    if not os.path.exists(path):
        pytest.skip(f"{rel} not bundled")
    from dustraytracer_tpu.scene import load_scene

    s = load_scene(path)
    # slice padding rows off first: pad triangles are zeros, which would
    # dilute the finiteness/material checks and spuriously fail the
    # root-AABB containment for scenes whose bounds exclude the origin
    t = np.asarray(s.tri_pos)[: s.n_tris]
    n = t.shape[0]
    assert n > 0 and t.shape[1:] == (3, 3)
    assert np.isfinite(t).all()
    # material indices in range
    mats = np.asarray(s.tri_mat)[: s.n_tris]
    assert mats.min() >= 0 and mats.max() < s.mat_albedo.shape[0]
    # texture ids either -1 or valid stack rows
    tex = np.asarray(s.mat_albedo_tex)
    assert tex.min() >= -1 and tex.max() < s.tex_stack.shape[0]
    # BVH nodes bound their triangles: root AABB contains the whole soup
    lo = np.asarray(s.node_min).min(axis=0)
    hi = np.asarray(s.node_max).max(axis=0)
    pad = 1e-3 + 1e-3 * np.abs(t).max()
    assert (t.reshape(-1, 3) >= lo - pad).all()
    assert (t.reshape(-1, 3) <= hi + pad).all()
