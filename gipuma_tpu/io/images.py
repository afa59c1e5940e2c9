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


def _read_png_raw(path: str) -> np.ndarray:
    """Minimal PNG decoder preserving bit depth (PIL collapses 16-bit RGB
    to 8-bit): gray/RGB/gray+alpha/RGBA at 8 or 16 bits, no interlace.
    Returns uint8/uint16 [H,W] or [H,W,C]."""
    import struct
    import zlib

    with open(path, "rb") as fh:
        data = fh.read()
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, idat = 8, []
    w = h = depth = ctype = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if ctag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(
                ">IIBBBBB", body)
            if interlace:
                raise ValueError("interlaced PNG unsupported")
        elif ctag == b"IDAT":
            idat.append(body)
        elif ctag == b"IEND":
            break
    nch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    if depth not in (8, 16):
        raise ValueError(f"bit depth {depth} unsupported")
    bpp = nch * depth // 8                       # bytes per pixel
    stride = w * bpp
    raw = zlib.decompress(b"".join(idat))
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(raw, np.uint8,
                             stride, y * (stride + 1) + 1).astype(np.int32)
        if f == 0:
            cur = line
        elif f == 2:                             # Up
            cur = (line + prev) & 0xFF
        else:                                    # Sub/Average/Paeth: serial
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if f == 1:
                    pr = a
                elif f == 3:
                    pr = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c)
                cur[x] = (line[x] + pr) & 0xFF
        out[y] = cur.astype(np.uint8)
        prev = cur
    if depth == 16:
        arr = out.reshape(h, w, nch, 2).astype(np.uint16)
        arr = (arr[..., 0] << 8) | arr[..., 1]   # PNG is big-endian
    else:
        arr = out.reshape(h, w, nch)
    return arr[..., 0] if nch == 1 else arr


def load_image_raw(path: str | os.PathLike) -> np.ndarray:
    """cv::imread(path, -1) analog (main.cpp:770-772,786,800): decode
    preserving bit depth and channel count, as float32 — the reference
    accepts ANY image as ground truth and converts to CV_32F."""
    p = str(path)
    if p.lower().endswith(".png"):
        try:
            return _read_png_raw(p).astype(np.float32)
        except Exception:
            pass   # fall through to PIL for odd PNGs
    return np.asarray(Image.open(p), dtype=np.float32)


def decode_normal_map_16u(arr: np.ndarray) -> np.ndarray:
    """16-bit GT normal-map decode (main.cpp:800-817): channels store
    n*32767 + 32767; all-32767 pixels (encoded zero) stay (0,0,0), others
    are normalized.  arr: [H,W,3] float of uint16 values -> [H,W,3] unit
    normals.  (The reference's BGR2RGB swap undoes imread's BGR order —
    our decoder reads the PNG's native RGB, so no swap.)"""
    n = np.asarray(arr, np.float32) - 32767.0
    zero = np.all(n == 0.0, axis=-1)
    norm = np.linalg.norm(n, axis=-1, keepdims=True)
    out = n / np.maximum(norm, 1e-12)
    out[zero] = 0.0
    return out


def list_images(folder: str | os.PathLike,
                extensions=(".png", ".jpg", ".jpeg", ".ppm", ".pgm", ".tif",
                            ".tiff", ".bmp")) -> list[str]:
    """Sorted image filenames in a folder."""
    out = [p.name for p in sorted(Path(folder).iterdir())
           if p.suffix.lower() in extensions]
    return out
