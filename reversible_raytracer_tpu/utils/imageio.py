"""PNG image I/O (reference capability C13: per-iteration frame dumps)."""

from __future__ import annotations

import os

import numpy as np


def to_uint8(image) -> np.ndarray:
    img = np.asarray(image)
    return (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def save_png(path: str, image) -> None:
    """Save an (H, W, 3) float image in [0, 1] (or uint8) as PNG."""
    from PIL import Image

    arr = np.asarray(image)
    if arr.dtype != np.uint8:
        arr = to_uint8(arr)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray(arr).save(path)


def load_png(path: str) -> np.ndarray:
    """Load a PNG as float32 (H, W, 3) in [0, 1]."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    return np.asarray(img, dtype=np.float32) / 255.0


def save_gif(path: str, frames, duration_ms: int = 80) -> None:
    """Assemble frames (list of float images or a frames directory of PNGs)
    into an animated GIF — the reference's convergence-demo artifact."""
    import glob

    from PIL import Image

    if isinstance(frames, str):
        files = sorted(glob.glob(os.path.join(frames, "*.png")))
        imgs = [Image.open(f).convert("RGB") for f in files]
    else:
        imgs = [Image.fromarray(to_uint8(f)) for f in frames]
    if not imgs:
        raise ValueError("no frames to assemble")
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    imgs[0].save(path, save_all=True, append_images=imgs[1:],
                 duration=duration_ms, loop=0)
