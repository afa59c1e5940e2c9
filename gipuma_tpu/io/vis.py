"""PNG visualizations — capability of displayUtils.h:19-57,239-245 and the
normal-sphere legend of main.cpp:845-868.

* disparity/depth -> 16-bit gray and JET-colormapped 8-bit PNG (with gamma)
* normals -> RGB encoding n*32767+32767 scaled to 8-bit
* cost map -> gray PNG
* half-sphere normal legend composited into the normal image corner
"""
from __future__ import annotations

import os

import numpy as np
from PIL import Image


def jet_colormap(v: np.ndarray) -> np.ndarray:
    """Classic JET colormap for v in [0, 1] -> uint8 RGB."""
    v = np.clip(v, 0.0, 1.0)
    four = 4.0 * v
    r = np.clip(np.minimum(four - 1.5, -four + 4.5), 0, 1)
    g = np.clip(np.minimum(four - 0.5, -four + 3.5), 0, 1)
    b = np.clip(np.minimum(four + 0.5, -four + 2.5), 0, 1)
    return (np.stack([r, g, b], axis=-1) * 255).astype(np.uint8)


def disparity_to_gray16(disp: np.ndarray, max_disp: float) -> np.ndarray:
    """16-bit disparity visualization (getDisparityForDisplay,
    displayUtils.h:19-26)."""
    v = np.clip(np.nan_to_num(disp) / max(max_disp, 1e-9), 0.0, 1.0)
    return (v * 65535.0).astype(np.uint16)


def depth_to_jet(depth: np.ndarray, depth_min: float, depth_max: float,
                 gamma: float = 1.0) -> np.ndarray:
    """JET-colormapped depth visualization (convertDisparityDepthImage,
    displayUtils.h:239-245)."""
    v = (np.nan_to_num(depth) - depth_min) / max(depth_max - depth_min, 1e-9)
    v = np.clip(v, 0.0, 1.0) ** gamma
    rgb = jet_colormap(v)
    rgb[~np.isfinite(depth) | (depth <= 0)] = 0
    return rgb


def normals_to_rgb(normals: np.ndarray) -> np.ndarray:
    """RGB-encode unit normals (getNormalsForDisplay, displayUtils.h:28-33:
    n*32767+32767 in 16-bit, here scaled to 8-bit)."""
    v = np.clip(normals * 0.5 + 0.5, 0.0, 1.0)
    return (v * 255.0).astype(np.uint8)


def normal_sphere_legend(size: int = 64) -> np.ndarray:
    """Half-sphere normal color legend (main.cpp:845-868): a disk whose
    pixels show the color coding of camera-facing normals."""
    ys, xs = np.mgrid[0:size, 0:size]
    u = (xs - size / 2.0) / (size / 2.0)
    v = (ys - size / 2.0) / (size / 2.0)
    r2 = u * u + v * v
    nz = -np.sqrt(np.clip(1.0 - r2, 0.0, 1.0))
    n = np.stack([u, v, nz], axis=-1)
    rgb = normals_to_rgb(n)
    rgb[r2 > 1.0] = 0
    return rgb


def normals_png(normals: np.ndarray, with_legend: bool = True) -> np.ndarray:
    img = normals_to_rgb(normals)
    if with_legend:
        leg = normal_sphere_legend(min(64, img.shape[0] // 4, img.shape[1] // 4))
        s = leg.shape[0]
        img = img.copy()
        img[-s:, -s:] = np.where(leg.sum(-1, keepdims=True) > 0, leg, img[-s:, -s:])
    return img


def cost_to_gray(cost: np.ndarray, max_cost: float) -> np.ndarray:
    v = np.clip(np.nan_to_num(cost) / max(max_cost, 1e-9), 0.0, 1.0)
    return (v * 255.0).astype(np.uint8)


def save_png(path: str | os.PathLike, img: np.ndarray) -> None:
    if img.dtype == np.uint16:
        Image.fromarray(img.astype(np.int32), mode="I").convert("I;16").save(path)
    else:
        Image.fromarray(img).save(path)
