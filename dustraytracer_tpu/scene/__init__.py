from dustraytracer_tpu.scene.gltf import load_gltf, GltfDocument
from dustraytracer_tpu.scene.scene import Scene, build_scene, load_scene
from dustraytracer_tpu.scene.camera import Camera, make_camera
from dustraytracer_tpu.scene.settings import RenderSettings, RenderMode, DebugMode

__all__ = [
    "load_gltf", "GltfDocument",
    "Scene", "build_scene", "load_scene",
    "Camera", "make_camera",
    "RenderSettings", "RenderMode", "DebugMode",
]
