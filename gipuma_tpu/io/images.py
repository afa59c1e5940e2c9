"""Image loading — the reference's cv::imread grayscale/color float path
(main.cpp:741-751): grayscale CV_32F (0..255) or float RGB."""
from __future__ import annotations

import os
from pathlib import Path

import numpy as np
from PIL import Image


def load_image(path: str | os.PathLike, color: bool = False) -> np.ndarray:
    """Load as float32; grayscale [H,W] (luma, 0..255) or color [H,W,3]."""
    img = Image.open(path)
    if color:
        return np.asarray(img.convert("RGB"), dtype=np.float32)
    return np.asarray(img.convert("L"), dtype=np.float32)


def list_images(folder: str | os.PathLike,
                extensions=(".png", ".jpg", ".jpeg", ".ppm", ".pgm", ".tif",
                            ".tiff", ".bmp")) -> list[str]:
    """Sorted image filenames in a folder."""
    out = [p.name for p in sorted(Path(folder).iterdir())
           if p.suffix.lower() in extensions]
    return out
