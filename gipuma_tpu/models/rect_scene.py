"""RectScene construction: per-pair rectification + permutation tables.

One-time (per reference view) host+device setup for the rectified fast cost
path (ops/rect_cost.py).  For every selected source view:

1. rectify the (reference, source) pair (geometry/rectify.py) and choose a
   shared rect window covering both warped image footprints plus the cost
   window margin;
2. warp both images into the window once (XLA bilinear — amortized) and
   compute rect-frame gradient channels;
3. fold the window origin into the plane->disparity map L so the device
   code works entirely in local rect coordinates;
4. build the static 2-pass permutation tables (ops/permute2d.py):
   state -> rect (nearest full-grid reference pixel, parity-independent)
   and rect -> active pixel per parity.

Raises RectifyUnsupported when a pair cannot be row-rectified (baseline
along the optical axis) or the rect window blows up (epipole near the
image) — callers fall back to the exact cost path.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

from ..config import AlgorithmParams
from ..geometry.camera import Rig
from ..geometry.rectify import rectified_bounds, rectify_pair, warp_to_rectified
from ..ops.permute2d import build_tables, tile_span_blocks
from ..ops.rect_cost import RectScene
from ..ops.sampling import central_gradients
from .scene import build_scene


class RectifyUnsupported(ValueError):
    """This rig/pair cannot use the rectified fast path."""


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _land(y, x, k: int, h: int, w: int):
    """Coordinates where pixel (y, x) of an [h, w] array lands after
    jnp.rot90(a, k) (counter-clockwise).  Accepts real-valued coords."""
    k %= 4
    if k == 0:
        return y, x
    if k == 1:
        return (w - 1) - x, y
    if k == 2:
        return (h - 1) - y, (w - 1) - x
    return x, (h - 1) - y


def _unland(yk, xk, k: int, h: int, w: int):
    """Inverse of `_land`: original (y, x) given rotated coords."""
    k %= 4
    if k == 0:
        return yk, xk
    if k == 1:
        return xk, (w - 1) - yk
    if k == 2:
        return (h - 1) - yk, (w - 1) - xk
    return (h - 1) - xk, yk


# Linear part of `_land` acting on (x, y) direction vectors.
_ROT_LIN = {
    0: np.array([[1.0, 0.0], [0.0, 1.0]]),
    1: np.array([[0.0, 1.0], [-1.0, 0.0]]),
    2: np.array([[-1.0, 0.0], [0.0, -1.0]]),
    3: np.array([[0.0, -1.0], [1.0, 0.0]]),
}


def _pick_rotation(T_inv: np.ndarray, center: np.ndarray) -> int:
    """k*90 deg pre-rotation minimizing the residual in-plane rotation of
    the rect->reference map (measured at the rect window center via the
    polar-decomposition angle of the Jacobian)."""
    def refxy(p):
        q = T_inv @ np.array([p[0], p[1], 1.0])
        return q[:2] / q[2]

    p0 = refxy(center)
    jx = refxy(center + [1.0, 0.0]) - p0
    jy = refxy(center + [0.0, 1.0]) - p0
    J = np.stack([jx, jy], axis=1)        # d(ref x,y) / d(rect x,y)
    best_k, best_a = 0, np.inf
    for k in range(4):
        Jk = _ROT_LIN[k] @ J
        ang = abs(np.arctan2(Jk[1, 0] - Jk[0, 1], Jk[0, 0] + Jk[1, 1]))
        if ang < best_a:
            best_k, best_a = k, ang
    return best_k


def build_rect_scene(images: Sequence[np.ndarray], rig: Rig,
                     view_subset: Sequence[int], params: AlgorithmParams,
                     depth_min: float, depth_max: float,
                     base=None, max_blowup: float = 8.0
                     ) -> tuple[RectScene, dict]:
    """Build the rect fast-path scene; returns (RectScene, build info).

    `base` lets callers reuse an existing ScenePack (build_scene otherwise).
    max_blowup: reject pairs whose rect window exceeds this multiple of the
    image area (near-epipole distortion would dominate the run).
    """
    if base is None:
        base = build_scene(images, rig, view_subset, params,
                           depth_min, depth_max)
    ref_img = np.asarray(images[0], np.float32)
    if ref_img.ndim == 2:
        ref_img = ref_img[..., None]
    h, w = ref_img.shape[:2]
    margin = max(params.box_hrad, params.box_vrad) + 2
    ref_cam = rig.cameras[0]

    per_pair = []
    info = {"pairs": []}
    for v in view_subset:
        cam = rig.cameras[v]
        try:
            rect = rectify_pair(ref_cam.K, cam.K, cam.R, cam.t)
            # Density normalization: scale K_new so the reference image's
            # rectified footprint holds as many pixels as the image itself.
            # Keeps the (pixel-unit) cost window the same physical size as
            # the reference engine's, and removes oversampling waste.
            corners = np.array([[0, 0, 1], [w - 1, 0, 1],
                                [w - 1, h - 1, 1], [0, h - 1, 1]], float)
            q = corners @ rect.T_ref.T
            q = q[:, :2] / q[:, 2:3]
            area = 0.5 * abs(sum(
                q[i, 0] * q[(i + 1) % 4, 1] - q[(i + 1) % 4, 0] * q[i, 1]
                for i in range(4)))
            s = float(np.clip(np.sqrt(h * w / max(area, 1.0)), 0.25, 4.0))
            K_scaled = np.diag([s, s, 1.0]) @ rect.K_new
            rect = rectify_pair(ref_cam.K, cam.K, cam.R, cam.t,
                                K_new=K_scaled)
        except ValueError as e:
            raise RectifyUnsupported(f"view {v}: {e}") from e

        lo_r, hi_r = rectified_bounds(rect.T_ref, w, h)
        lo_s, hi_s = rectified_bounds(rect.T_src, w, h)
        # Rows: the reference footprint only (cost windows are centered on
        # reference pixels; rows the reference never reaches are dead work).
        # Columns: the union (source samples land anywhere in the source
        # footprint).
        lo = np.array([np.floor(min(lo_r[0], lo_s[0])),
                       np.floor(lo_r[1])]) - margin
        hi = np.array([np.ceil(max(hi_r[0], hi_s[0])),
                       np.ceil(hi_r[1])]) + margin
        hr = int(hi[1] - lo[1]) + 1
        wr = _round_up(int(hi[0] - lo[0]) + 1, 128)
        if hr * wr > max_blowup * h * w:
            raise RectifyUnsupported(
                f"view {v}: rect window {hr}x{wr} exceeds {max_blowup}x the "
                f"image area — epipole too close to the image")

        src_img = np.asarray(images[v], np.float32)
        if src_img.ndim == 2:
            src_img = src_img[..., None]

        def channels(img, T):
            warped = warp_to_rectified(jnp.asarray(img), T, hr, wr, offset=lo)
            chw = jnp.moveaxis(warped, -1, 0)                 # [C, hr, wr]
            gx, gy = central_gradients(chw)
            return jnp.concatenate([chw, gx, gy], axis=0)     # [3C, hr, wr]

        ref_rect = channels(ref_img, rect.T_ref)
        src_rect = channels(src_img, rect.T_src)

        # abc_local = L @ m with the window origin folded in:
        # disp = a*x̂g + b*ŷg + c and x̂g = x̂ + lo_x  =>  c' = c + a*lo_x + b*lo_y.
        L_global = -(rect.f_new * rect.baseline) * rect.M.T
        shift = np.array([[1.0, 0.0, 0.0],
                          [0.0, 1.0, 0.0],
                          [lo[0], lo[1], 1.0]])
        L_local = shift @ L_global

        # Pre-rotation: the rect<->reference maps of off-axis baselines
        # contain up to 180 deg of in-plane rotation; rotating the reference
        # grid by k*90 deg (exact array op at runtime) keeps the residual
        # within +-45 deg, where the 2-pass table decomposition is exact.
        T_inv = np.linalg.inv(rect.T_ref)
        center = np.array([lo[0] + wr / 2.0, lo[1] + hr / 2.0])
        k_rot = _pick_rotation(T_inv, center)
        s_sq = max(h, w)

        # Forward map: rect pixel -> nearest pixel of the k-rotated
        # reference grid.  Rect pixels whose pre-image is outside the
        # reference image are marked invalid: their cost is never read
        # back, and excluding them keeps them from stealing table slots.
        ys, xs = np.meshgrid(np.arange(hr, dtype=np.float64),
                             np.arange(wr, dtype=np.float64), indexing="ij")
        q = np.stack([xs + lo[0], ys + lo[1], np.ones_like(xs)], -1) @ T_inv.T
        xr = q[..., 0] / q[..., 2]
        yr = q[..., 1] / q[..., 2]
        in_ref = ((xr > -0.5) & (xr < w - 0.5)
                  & (yr > -0.5) & (yr < h - 0.5))
        yk, xk = _land(yr, xr, k_rot, h, w)
        fwd = build_tables(np.round(yk), np.round(xk), s_sq, s_sq,
                           valid=in_ref)

        # Return map: k-rotated full-grid reference pixel -> nearest rect
        # pixel.  (Full grid, not the compressed half-grid: the half-grid's
        # active-x zigzag breaks the smoothness the decomposition needs;
        # the cost_fn un-rotates and compresses afterwards.)
        sk, lk = np.meshgrid(np.arange(s_sq, dtype=np.float64),
                             np.arange(s_sq, dtype=np.float64),
                             indexing="ij")
        yy, xx = _unland(sk, lk, k_rot, h, w)
        orig_ok = (yy >= 0) & (yy <= h - 1) & (xx >= 0) & (xx <= w - 1)
        qa = np.stack([xx, yy, np.ones_like(xx)], -1) @ rect.T_ref.T
        with np.errstate(invalid="ignore", divide="ignore"):
            xl = qa[..., 0] / qa[..., 2] - lo[0]
            yl = qa[..., 1] / qa[..., 2] - lo[1]
        xl = np.where(orig_ok, xl, 0.0)
        yl = np.where(orig_ok, yl, 0.0)
        ret = build_tables(np.round(yl), np.round(xl), hr, wr,
                           valid=orig_ok)

        # Disparity clamp for cost evaluation (rect pixels): the depth range
        # maps to [f_new*B/depth_max, f_new*B/depth_min]; the margin admits
        # slanted-window extrapolation beyond the center disparity.
        fb = rect.f_new * rect.baseline
        d_lo = fb / depth_max - 16.0
        d_hi = fb / depth_min + 16.0

        per_pair.append((ref_rect, src_rect, L_local, fwd, ret, hr, wr,
                         k_rot, (d_lo, d_hi)))
        info["pairs"].append({
            "view": v, "rect_shape": (hr, wr), "rot_k": k_rot,
            "fwd_conflicts": fwd.conflicts,
            "fwd_affected_frac": float(fwd.affected.mean()),
            "ret_conflicts": ret.conflicts,
            "ret_affected_frac": float(ret.affected[orig_ok].mean()),
        })

    hrp = _round_up(max(p[5] for p in per_pair), 8)
    wrp = max(p[6] for p in per_pair)
    s_sq = max(h, w)

    def pad_hw(a, th, tw):
        return jnp.pad(a, ((0, 0),) * (a.ndim - 2)
                       + ((0, th - a.shape[-2]), (0, tw - a.shape[-1])))

    ref_rect = jnp.stack([pad_hw(p[0], hrp, wrp) for p in per_pair])
    src_rect = jnp.stack([pad_hw(p[1], hrp, wrp) for p in per_pair])
    L = jnp.asarray(np.stack([p[2] for p in per_pair]), jnp.float32)
    fwd_c1 = jnp.stack([pad_hw(jnp.asarray(p[3].c1), s_sq, wrp)
                        for p in per_pair])
    fwd_r = jnp.stack([pad_hw(jnp.asarray(p[3].r), hrp, wrp)
                       for p in per_pair])
    ret_c1 = jnp.stack([pad_hw(jnp.asarray(p[4].c1), hrp, s_sq)
                        for p in per_pair])
    ret_r = jnp.stack([jnp.asarray(p[4].r) for p in per_pair])
    rot_k = jnp.asarray([p[7] for p in per_pair], jnp.int32)
    disp_bounds = jnp.asarray(np.asarray([p[8] for p in per_pair],
                                         np.float32))

    # Static row_gather scratch-window bounds (see ops/pallas_rowgather):
    # sampling span from the clamped disparity range + tile width; permute
    # span measured exactly from the built tables.
    max_range = max(p[8][1] - p[8][0] for p in per_pair)
    span_sample = int(np.ceil((146.0 + max_range) / 128.0)) + 1
    span_perm = max(max(tile_span_blocks(p[3].c1),
                        tile_span_blocks(np.ascontiguousarray(p[3].r.T)),
                        tile_span_blocks(p[4].c1),
                        tile_span_blocks(np.ascontiguousarray(p[4].r.T)))
                    for p in per_pair)
    if span_perm > 6:
        raise RectifyUnsupported(
            f"permutation tables need {span_perm} 128-col blocks per tile "
            "(map too distorted for the scratch-window gather)")
    spans = jnp.zeros((span_sample, span_perm), jnp.int8)

    scene = RectScene(base=base, ref_rect=ref_rect, src_rect=src_rect, L=L,
                      fwd_c1=fwd_c1, fwd_r=fwd_r, ret_c1=ret_c1, ret_r=ret_r,
                      rot_k=rot_k, disp_bounds=disp_bounds, spans=spans)
    info["rect_shape_padded"] = (hrp, wrp)
    info["spans"] = (span_sample, span_perm)
    return scene, info
