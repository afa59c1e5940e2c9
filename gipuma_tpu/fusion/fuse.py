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
    disp = lambda dpt: f * baseline / dpt

    # World points per view (computed once).
    X_all = jax.vmap(_back_project_grid)(M_inv, p4, depths)

    used = jnp.zeros((N, h, w), jnp.bool_)
    out_pts, out_nrm, out_col = [], [], []

    @jax.jit
    def consistency(i, used):
        """For view i (TRACED index — one compiled executable regardless
        of N; a static index compiled N distinct executables, each
        unrolling an N-view loop — untenable at DTU's 49 or T&T's
        hundreds of views): per-pixel consistent-view count, accumulated
        point/normal sums, and the consumed-pixel marks."""
        Xi = X_all[i]
        ni = normals_j[i]
        valid_i = (depths[i] > 0) & ~used[i]
        is_i = jnp.arange(N) == i

        def body(carry, vin):
            count, acc_X, acc_n = carry
            Pj_, d_map, n_map, X_map, u_map, isi = vin
            xi_, yi_, d_proj, inside = _project(Pj_, Xi, (h, w))
            d_j = d_map[yi_, xi_]
            n_j = n_map[yi_, xi_]
            X_j = X_map[yi_, xi_]
            u_j = u_map[yi_, xi_]
            ok = (inside & valid_i & ~u_j & ~isi & (d_j > 0)
                  & (jnp.abs(disp(d_j) - disp(d_proj)) < params.disp_thresh)
                  & (jnp.sum(ni * n_j, -1) > cos_thresh))
            count = count + ok.astype(jnp.int32)
            acc_X = acc_X + jnp.where(ok[..., None], X_j, 0.0)
            acc_n = acc_n + jnp.where(ok[..., None], n_j, 0.0)
            return (count, acc_X, acc_n), (yi_, xi_, ok)

        (count, acc_X, acc_n), (yis, xis, oks) = jax.lax.scan(
            body, (jnp.zeros((h, w), jnp.int32), Xi, ni),
            (Pj, depths, normals_j, X_all, used, is_i))
        keep = valid_i & (count >= params.num_consistent)
        denom = (count + 1).astype(jnp.float32)[..., None]
        fused_X = acc_X / denom
        fused_n = acc_n / jnp.maximum(
            jnp.linalg.norm(acc_n, axis=-1, keepdims=True), 1e-12)
        # Mark consumed pixels in other views (view i's own ok row is all
        # False via ~is_i; its pixels are consumed by `keep` directly).
        new_used = jax.vmap(
            lambda u, y, x, m: u.at[y, x].max(m))(used, yis, xis, oks & keep)
        new_used = jnp.where(is_i[:, None, None], new_used | keep, new_used)
        return keep, fused_X, fused_n, new_used

    for i in range(N):
        keep, fx, fn, used = consistency(jnp.asarray(i, jnp.int32), used)
        keep_np = np.asarray(keep)
        out_pts.append(np.asarray(fx)[keep_np])
        out_nrm.append(np.asarray(fn)[keep_np])
        if colors is not None:
            ci = np.asarray(colors[i])
            if ci.ndim == 2:
                ci = np.repeat(ci[..., None], 3, axis=-1)
            out_col.append(ci[keep_np])
        else:
            out_col.append(np.full((int(keep_np.sum()), 3), 255.0, np.float32))

    return (np.concatenate(out_pts), np.concatenate(out_nrm),
            np.concatenate(out_col))
