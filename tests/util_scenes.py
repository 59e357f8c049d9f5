"""Synthetic scene builders for tests — no file IO, tiny and exact."""

from __future__ import annotations

import numpy as np

from dustraytracer_tpu.scene.gltf import GltfDocument, GltfMaterial, GltfPrimitive
from dustraytracer_tpu.scene.scene import Scene, build_scene


def make_quad(center, size, axis, mat=0, flip=False):
    """Two triangles forming a square perpendicular to `axis`."""
    c = np.asarray(center, np.float32)
    h = size / 2.0
    if axis == 2:  # XY plane
        corners = np.array([[-h, -h, 0], [h, -h, 0], [h, h, 0], [-h, h, 0]])
        n = np.array([0, 0, 1.0])
    elif axis == 1:  # XZ plane
        corners = np.array([[-h, 0, -h], [h, 0, -h], [h, 0, h], [-h, 0, h]])
        n = np.array([0, 1.0, 0])
    else:  # YZ plane
        corners = np.array([[0, -h, -h], [0, h, -h], [0, h, h], [0, -h, h]])
        n = np.array([1.0, 0, 0])
    if flip:
        n = -n
        corners = corners[::-1]
    corners = (corners + c).astype(np.float32)
    tris = np.stack([corners[[0, 1, 2]], corners[[0, 2, 3]]])
    normals = np.broadcast_to(n, (2, 3, 3)).astype(np.float32)
    uvs = np.array([[[0, 0], [1, 0], [1, 1]], [[0, 0], [1, 1], [0, 1]]],
                   np.float32)
    return GltfPrimitive(positions=tris, normals=normals.copy(),
                         uvs=uvs, material=mat)


def make_tri_scene() -> Scene:
    """Two quads: a ground plane and a small wall, two materials."""
    doc = GltfDocument(
        meshes=[
            ("ground", [make_quad((0, 0, 0), 10, axis=1, mat=0)]),
            ("wall", [make_quad((0, 1, -2), 2, axis=2, mat=1)]),
        ],
        materials=[
            GltfMaterial(name="ground", base_color=np.array([0.8, 0.8, 0.8],
                                                            np.float32)),
            GltfMaterial(name="wall", base_color=np.array([0.9, 0.2, 0.2],
                                                          np.float32)),
        ],
        images=[],
        cameras=[],
    )
    return build_scene(doc, use_native=False)


def make_random_tri_doc(n_tris: int, seed=0) -> GltfDocument:
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-5, 5, (n_tris, 1, 3))
    offsets = rng.normal(0, 0.3, (n_tris, 3, 3))
    pos = (centers + offsets).astype(np.float32)
    nrm = np.zeros_like(pos)
    uvs = rng.uniform(0, 1, (n_tris, 3, 2)).astype(np.float32)
    prim = GltfPrimitive(positions=pos, normals=nrm, uvs=uvs, material=0)
    return GltfDocument(meshes=[("soup", [prim])],
                        materials=[GltfMaterial()], images=[], cameras=[])


def make_glass_panes_scene() -> Scene:
    """Deterministic synthetic glass fixture for the golden harness
    ("synthetic:glass_panes"): a tilted glass pane (transmission 0.85,
    ior 1.5) in front of a red emissive wall over a grey ground — covers
    refraction, Fresnel reflection and colored-throughput paths that no
    bundled reference scene reaches (the reference parses Transmission/
    ior but never shades them, Material.cuh:10-22)."""
    pane = make_quad((0, 1.2, -0.8), 2.2, axis=2, mat=0)
    pane_pos = pane.positions.copy()
    # tilt the pane 20 deg about X so Fresnel varies across it
    c, s = np.cos(np.radians(20)), np.sin(np.radians(20))
    y = pane_pos[..., 1] - 1.2
    z = pane_pos[..., 2] + 0.8
    pane_pos[..., 1] = 1.2 + c * y - s * z
    pane_pos[..., 2] = -0.8 + s * y + c * z
    pane = GltfPrimitive(positions=pane_pos, normals=pane.normals,
                         uvs=pane.uvs, material=0)
    doc = GltfDocument(
        meshes=[
            ("pane", [pane]),
            ("wall", [make_quad((0, 1.5, -3), 6, axis=2, mat=1)]),
            ("ground", [make_quad((0, 0, 0), 12, axis=1, mat=2)]),
        ],
        materials=[
            GltfMaterial(name="glass", base_color=np.array(
                [0.95, 0.98, 1.0], np.float32), roughness=0.0,
                transmission=0.85, ior=1.5),
            GltfMaterial(name="wall", base_color=np.zeros(3, np.float32),
                         emissive=np.array([3.5, 0.4, 0.4], np.float32),
                         roughness=1.0),
            GltfMaterial(name="ground", base_color=np.array(
                [0.55, 0.55, 0.55], np.float32), roughness=1.0),
        ],
        images=[], cameras=[])
    return build_scene(doc, use_native=False)
