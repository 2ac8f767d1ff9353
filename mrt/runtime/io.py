"""PNG export/import.

The reference exports via the `image` crate with a vertical flip because
its buffers are bottom-up (reference: src/main.rs:760-783); film rows here
are also bottom-up so `save_png` flips the same way.
"""

from __future__ import annotations

import os

import numpy as np


def save_png(path, rgb_bytes):
    """Write (H,W,3) uint8 bottom-up rows to a top-down PNG file
    (reference: Image::dump, main.rs:760-783)."""
    from PIL import Image as PILImage

    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)
    PILImage.fromarray(rgb_bytes[::-1]).save(path, format="PNG")


def load_png(path):
    """Load a PNG to normalized float32 RGBA (reference:
    Texture::load_png, texture.rs:30-69).  Returns (H,W,4) in [0,1],
    top-down rows as stored in the file."""
    from PIL import Image as PILImage

    img = PILImage.open(path).convert("RGBA")
    return np.asarray(img, np.float32) / 255.0
