"""Per-pair epipolar rectification — groundwork for row-aligned sampling.

Motivation (see ROADMAP.md): the TPU's fast gather (`tpu.dynamic_gather`,
~59 Gelem/s) serves sample row i from operand row i only.  Rectifying each
(reference, source) pair so epipolar lines are horizontal makes the source
row of every sample STATIC (equal to the sample's own rectified row), which
is exactly that layout.  Two classical facts make PatchMatch work there:

* a plane hypothesis (n, d) in the reference frame induces a disparity
  field AFFINE in rectified pixel coordinates (exact, not approximate):
      1/z(p) = -(M^T m) . p  with  m = n/d,  M = (K_new R_new)^-1
      disparity(p) = f_new * B * (1/z(p))
* corresponding rectified pixels share the row:  p_src = p_ref - (disp, 0).

Fusiello-Trucco-Verri-style rectification: both cameras get a common
rotation whose x-axis is the baseline.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np


class RectifiedPair(NamedTuple):
    T_ref: np.ndarray   # [3,3] homography: reference pixel -> rectified pixel
    T_src: np.ndarray   # [3,3] homography: source pixel -> rectified pixel
    K_new: np.ndarray   # [3,3] shared rectified intrinsics
    R_new: np.ndarray   # [3,3] shared rectified rotation (world <- ref frame)
    M: np.ndarray       # [3,3] = inv(K_new @ R_new)
    f_new: float        # rectified focal (x)
    baseline: float     # real inter-camera distance |C_src|


def rectify_pair(K_ref: np.ndarray, K_src: np.ndarray, R_src: np.ndarray,
                 t_src: np.ndarray, K_new: np.ndarray | None = None
                 ) -> RectifiedPair:
    """Rectify a (rebased-reference, source) pair.

    Inputs are in the engine's rebased convention: reference = K_ref [I|0],
    source = K_src [R_src | t_src].
    """
    C2 = -R_src.T @ t_src
    B = float(np.linalg.norm(C2))
    if B < 1e-12:
        raise ValueError("coincident camera centers cannot be rectified")

    # New shared rotation: x along the baseline, y ⟂ (x, old ref z), z = x×y.
    x = C2 / B
    z_old = np.array([0.0, 0.0, 1.0])
    y = np.cross(z_old, x)
    ny = np.linalg.norm(y)
    if ny < 1e-9:
        # Baseline parallel to the optical axis (pure forward motion):
        # horizontal-epipolar rectification is degenerate.
        raise ValueError("baseline parallel to the optical axis — "
                         "pair cannot be row-rectified")
    y = y / ny
    z = np.cross(x, y)
    R_new = np.stack([x, y, z], axis=0)   # rows = new axes (world->rect)

    if K_new is None:
        K_new = 0.5 * (K_ref + K_src)
        K_new[0, 1] = 0.0                 # no skew

    T_ref = K_new @ R_new @ np.linalg.inv(K_ref)
    T_src = K_new @ R_new @ R_src.T @ np.linalg.inv(K_src)
    M = np.linalg.inv(K_new @ R_new)
    return RectifiedPair(T_ref=T_ref, T_src=T_src, K_new=K_new, R_new=R_new,
                         M=M, f_new=float(K_new[0, 0]), baseline=B)


def plane_disparity_coeffs(rect: RectifiedPair, m: np.ndarray) -> np.ndarray:
    """Affine disparity coefficients (a, b, c) of plane vector m = n/d:

        disparity(x̂, ŷ) = a*x̂ + b*ŷ + c    (rectified pixel coords)

    Derivation: plane n.X + d = 0 with X = z * M p̂  gives
    1/z = -(M^T m).p̂; disparity = f_new * B / z."""
    return -(rect.f_new * rect.baseline) * (rect.M.T @ np.asarray(m))


def rectified_bounds(T: np.ndarray, w: int, h: int) -> tuple[np.ndarray, np.ndarray]:
    """Axis-aligned bounds of the image corners under homography T."""
    corners = np.array([[0, 0, 1], [w - 1, 0, 1], [0, h - 1, 1],
                        [w - 1, h - 1, 1]], dtype=np.float64)
    q = corners @ T.T
    q = q[:, :2] / q[:, 2:3]
    return q.min(axis=0), q.max(axis=0)


def warp_to_rectified(img, T: np.ndarray, out_h: int, out_w: int,
                      offset: np.ndarray | None = None):
    """Inverse-warp an image into the rectified frame (one-time, per pair).

    offset shifts the rectified window (e.g. -min corner from
    rectified_bounds).  jnp in, jnp out; bilinear clamp-to-edge."""
    import jax.numpy as jnp

    from ..geometry import transforms as Tf
    from ..ops.sampling import bilinear_sample

    T = np.asarray(T, dtype=np.float64)
    off = np.zeros(2) if offset is None else np.asarray(offset)
    Tinv = np.linalg.inv(T)
    xg, yg = Tf.pixel_grid(out_h, out_w)
    xs = xg + off[0]
    ys = yg + off[1]
    ones = jnp.ones_like(xs)
    q = jnp.stack([xs, ys, ones], -1) @ jnp.asarray(Tinv, jnp.float32).T
    xw = q[..., 0] / q[..., 2]
    yw = q[..., 1] / q[..., 2]
    img = img if img.ndim == 3 else img[..., None]
    return bilinear_sample(jnp.asarray(img, jnp.float32), xw, yw)
