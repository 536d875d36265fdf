"""Image IO: linear RGBA -> PNG with sRGB encode.

Mimics the reference's render-target semantics: shaders write linear
premultiplied color into an Rgba8UnormSrgb target (src/render/mod.rs:914-982) so
scanout applies the sRGB OETF; the headless example copies that target to a PNG
(examples/headless.rs:349-411).
"""

from __future__ import annotations

import numpy as np


def to_srgb_u8(image, premultiplied: bool = True) -> np.ndarray:
    """[H, W, 4] linear (premultiplied) RGBA float -> [H, W, 4] u8 sRGB."""
    img = np.asarray(image, dtype=np.float32)
    rgb = img[..., :3]
    a = img[..., 3:4]
    rgb = np.clip(rgb, 0.0, 1.0)
    # sRGB OETF
    srgb = np.where(
        rgb <= 0.0031308, rgb * 12.92, 1.055 * np.power(np.maximum(rgb, 1e-12), 1 / 2.4) - 0.055
    )
    out = np.concatenate([srgb, np.clip(a, 0.0, 1.0)], axis=-1)
    return (out * 255.0 + 0.5).astype(np.uint8)


def save_png(image, path: str, premultiplied: bool = True) -> None:
    from PIL import Image

    Image.fromarray(to_srgb_u8(image, premultiplied), mode="RGBA").save(path)


def load_png(path: str) -> np.ndarray:
    """PNG -> [H, W, 4] float sRGB-decoded linear RGBA."""
    from PIL import Image

    arr = np.asarray(Image.open(path).convert("RGBA"), dtype=np.float32) / 255.0
    rgb = arr[..., :3]
    lin = np.where(rgb <= 0.04045, rgb / 12.92, np.power((rgb + 0.055) / 1.055, 2.4))
    return np.concatenate([lin, arr[..., 3:4]], axis=-1)


def non_black_pixel_count(image, threshold: float = 1.0 / 255.0) -> int:
    """The reference's coarse render assertion metric
    (tests/visibility_render.rs:36-37)."""
    img = np.asarray(image)
    return int((img[..., :3].max(axis=-1) > threshold).sum())
