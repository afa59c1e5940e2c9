"""Consistency-based depth-map fusion — the capability the reference
delegates to the out-of-tree `fusibile` binary (invoked by every script,
e.g. scripts/dtu_fast.sh:56-57 with --disp_thresh --normal_thresh
--num_consistent).

Semantics (interface parity with fusibile's flags):
  For each view i (greedy, in order) and each of its valid pixels:
    * back-project to a world point X;
    * project X into every other view j; at the hit pixel q compare
        - disparity difference |disp(depth_j(q)) - disp(depth_of_X_in_j)|
          < disp_thresh   (disparity = f*baseline/depth, the same fake-
          baseline convention as the PatchMatch stage), and
        - angle(normal_i(p), normal_j(q)) < normal_thresh degrees;
    * if at least `num_consistent` other views agree, emit one fused point
      (mean of the consistent views' world points and normals) and mark the
      consumed pixels in the other views as used so each surface point is
      emitted once.

  TPU-native design: all per-pixel work is dense jnp (one jit per view pair
  batch); only the greedy used-masking is sequential over views.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FusionParams
from ..geometry.camera import FAKE_BASELINE


def _cam_arrays(Ps: np.ndarray):
    """Per-view M_inv, P_col4, P for world<->pixel mapping."""
    Ps = np.asarray(Ps, dtype=np.float64)
    M_inv = np.linalg.inv(Ps[:, :, :3])
    return (jnp.asarray(M_inv, jnp.float32),
            jnp.asarray(Ps[:, :, 3], jnp.float32),
            jnp.asarray(Ps, jnp.float32))


def _back_project_grid(M_inv, p4, depth):
    """World points of a full depth map. depth [H,W] -> X [H,W,3]."""
    h, w = depth.shape
    y = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    x = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    pt = jnp.stack([depth * x - p4[0], depth * y - p4[1], depth - p4[2]], -1)
    return jnp.einsum("ij,hwj->hwi", M_inv, pt)


@functools.partial(jax.jit, static_argnames=("shape",))
def _project(P, X, shape):
    """Project world points X [...,3] with P; returns (xi, yi, depth) with
    integer pixel coords clipped to the image and a validity mask."""
    h, w = shape
    q = jnp.einsum("ij,...j->...i", P[:, :3], X) + P[:, 3]
    depth = q[..., 2]
    x = q[..., 0] / depth
    y = q[..., 1] / depth
    xi = jnp.clip(jnp.round(x), 0, w - 1).astype(jnp.int32)
    yi = jnp.clip(jnp.round(y), 0, h - 1).astype(jnp.int32)
    inside = ((x >= -0.5) & (x <= w - 0.5) & (y >= -0.5) & (y <= h - 0.5)
              & (depth > 0) & jnp.isfinite(x) & jnp.isfinite(y))
    return xi, yi, depth, inside


def fuse_depthmaps(depths: np.ndarray, normals: np.ndarray, Ps: Sequence[np.ndarray],
                   params: FusionParams, colors: np.ndarray | None = None,
                   f: float | None = None,
                   baseline: float = FAKE_BASELINE):
    """Fuse per-view depth maps into one consistent point cloud.

    depths [N,H,W] (0 = invalid), normals [N,H,W,3] world-frame unit
    normals, Ps: N original (un-rebased) 3x4 projections, colors optional
    [N,H,W] or [N,H,W,3].
    Returns (points [M,3], normals [M,3], colors [M,3]) numpy arrays.
    """
    depths = jnp.asarray(np.asarray(depths), jnp.float32)
    normals_j = jnp.asarray(np.asarray(normals), jnp.float32)
    N, h, w = depths.shape
    M_inv, p4, Pj = _cam_arrays(np.stack([np.asarray(p) for p in Ps]))
    if f is None:
        # focal from P decomposition is overkill here; use K[0,0] of view 0
        # recovered via RQ — callers normally pass rig.f.
        from ..geometry.camera import decompose_projection
        f = float(decompose_projection(np.asarray(Ps[0]))[0][0, 0])

    cos_thresh = float(np.cos(np.radians(params.normal_thresh)))
    fb = float(f) * float(baseline)

    # World points per view (computed once).
    X_all = jax.vmap(_back_project_grid)(M_inv, p4, depths)
    # Static per-view channels packed [N, H*W, 4] (d, n) so each view pair
    # costs ONE aligned 16-byte row gather instead of four XLA gathers —
    # the per-pair gather chain dominated the 49-view DTU-shape fusion
    # (224 s on the 2-core CPU before).  The world point X_j is recomputed
    # from the gathered d_j (9 mul + 6 add — cheaper than gathering 3 more
    # channels), and the greedy `used` mask lives in the SIGN of the packed
    # d channel (masked pixels become -1), eliminating the per-pair bool
    # gather entirely.
    packed0 = jnp.concatenate(
        [depths[..., None], normals_j], -1).reshape(N, h * w, 4)

    @jax.jit
    def run_chunk(packed_in, idxs, act):
        """One chunk of the greedy view loop in ONE executable (lax.scan
        over the reference views `idxs` with the used-sign-masked pack as
        carry — a per-view jit + 3 host fetches would serialize 49
        dispatch round-trips and re-fetch full maps every view).  The
        loop is chunked so the stacked per-view outputs (keep/fused_X/
        fused_n, ~28 B/px/view) stay bounded: at 49 views x 1200x1600 an
        all-views output is >2 GB live at once on the fusion host.  `act`
        masks padded tail entries (keep=False => no marks, no emits), so
        every chunk shares one executable."""

        def consistency(packed, i_act):
            i, a = i_act
            Xi = X_all[i]
            ni = normals_j[i]
            valid_i = (packed[i, :, 0].reshape(h, w) > 0) & (a > 0)
            is_i = jnp.arange(N) == i

            def body(carry, vin):
                count, acc_X, acc_n = carry
                Pj_, Mi_, p4_, pk, isi = vin
                xi_, yi_, d_proj, inside = _project(Pj_, Xi, (h, w))
                lin = (yi_ * w + xi_).reshape(-1)
                # _project already clipped the coords into the image.
                g = pk.at[lin].get(
                    mode="promise_in_bounds").reshape(h, w, 4)
                d_j = g[..., 0]          # < 0 where invalid OR consumed
                n_j = g[..., 1:4]
                # Back-project the hit pixel of view j at its own depth.
                pt = jnp.stack([d_j * xi_.astype(jnp.float32) - p4_[0],
                                d_j * yi_.astype(jnp.float32) - p4_[1],
                                d_j - p4_[2]], -1)
                X_j = jnp.einsum("ab,hwb->hwa", Mi_, pt)
                ok = (inside & valid_i & ~isi & (d_j > 0)
                      & (jnp.abs(fb / d_j - fb / d_proj)
                         < params.disp_thresh)
                      & (jnp.sum(ni * n_j, -1) > cos_thresh))
                count = count + ok.astype(jnp.int32)
                acc_X = acc_X + jnp.where(ok[..., None], X_j, 0.0)
                acc_n = acc_n + jnp.where(ok[..., None], n_j, 0.0)
                return (count, acc_X, acc_n), (lin, ok)

            # Inner scan over source views (measured FASTER on the 2-core
            # CPU than batching all N views into [N, h, w] ops — 122 s vs
            # 170 s at the 49-view DTU shape: the big materializations
            # overwhelm the caches and XLA:CPU threads poorly either way).
            (count, acc_X, acc_n), (lins, oks) = jax.lax.scan(
                body, (jnp.zeros((h, w), jnp.int32), Xi, ni),
                (Pj, M_inv, p4, packed, is_i))
            keep = valid_i & (count >= params.num_consistent)
            denom = (count + 1).astype(jnp.float32)[..., None]
            fused_X = acc_X / denom
            fused_n = acc_n / jnp.maximum(
                jnp.linalg.norm(acc_n, axis=-1, keepdims=True), 1e-12)
            # Mark consumed pixels: flip the packed d sign to -1 at marked
            # slots (min is idempotent under duplicate hits, unlike mul).
            # View i's own ok row is all False via ~is_i; its pixels are
            # consumed by `keep` directly.
            marks = jnp.where((oks & keep).reshape(N, h * w), -1.0,
                              jnp.inf)
            new_d = jax.vmap(
                lambda dch, l, m: dch.at[l].min(m, mode="promise_in_bounds")
            )(packed[..., 0], lins, marks)
            new_d = jnp.where(
                is_i[:, None],
                jnp.where(keep.reshape(-1)[None], -1.0, new_d), new_d)
            packed = jnp.concatenate([new_d[..., None], packed[..., 1:]],
                                     -1)
            return packed, (keep, fused_X, fused_n)

        return jax.lax.scan(consistency, packed_in, (idxs, act))

    chunk = int(getattr(params, "chunk_views", 0))
    if chunk <= 0:
        # ~256 MB live output per chunk (keep bool + X f32x3 + n f32x3).
        chunk = max(1, min(N, (256 << 20) // (h * w * 28)))
    out_pts, out_nrm, out_col = [], [], []
    packed = packed0
    for c0 in range(0, N, chunk):
        ids = np.arange(c0, c0 + chunk, dtype=np.int32)
        act = (ids < N).astype(np.int32)
        ids = np.minimum(ids, N - 1)
        packed, (keeps, fXs, fns) = run_chunk(packed, jnp.asarray(ids),
                                              jnp.asarray(act))
        keeps = np.asarray(keeps)
        fXs = np.asarray(fXs)
        fns = np.asarray(fns)
        for k in range(min(chunk, N - c0)):
            i = c0 + k
            keep_np = keeps[k]
            out_pts.append(fXs[k][keep_np])
            out_nrm.append(fns[k][keep_np])
            if colors is not None:
                ci = np.asarray(colors[i])
                if ci.ndim == 2:
                    ci = np.repeat(ci[..., None], 3, axis=-1)
                out_col.append(ci[keep_np])
            else:
                out_col.append(np.full((int(keep_np.sum()), 3), 255.0,
                                       np.float32))

    return (np.concatenate(out_pts), np.concatenate(out_nrm),
            np.concatenate(out_col))
