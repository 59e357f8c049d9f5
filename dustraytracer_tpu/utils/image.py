"""Image export (PNG) — parity with the reference's stb_image_write path
(`/root/reference/DustRayTracer/src/Editor/EditorLayer.cpp:23-31,85-96`):
RGBA8 PNG of the current framebuffer, vertically flipped because pixel
row 0 is the bottom scanline (GL convention)."""

from __future__ import annotations

import numpy as np


def to_uint8(image) -> np.ndarray:
    arr = np.asarray(image)
    return (np.clip(arr, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def save_png(path, image, flip: bool = True) -> None:
    from PIL import Image

    arr = to_uint8(image)
    if flip:
        arr = arr[::-1]
    if arr.shape[-1] == 3:
        mode = "RGB"
    else:
        mode = "RGBA"
    Image.fromarray(arr, mode).save(str(path))
