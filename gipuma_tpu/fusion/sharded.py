"""View-sharded consistency fusion — pod-scale fusibile.

The single-host fusion (fusion/fuse.py) keeps every view's depth map on one
device and loops views serially.  At pod scale the depth maps are produced
sharded (one group of reference views per chip, parallel/mesh.py "job"
axis) and may not fit one chip; this module shards the VIEW axis of the
consistency check instead:

* every chip holds an [N/k, H, W] slice of the depth/normal/world-point
  stacks and its slice of the `used` mask;
* for each reference view i (host loop, same greedy order as fusibile):
  the replicated (Xi, ni, depth_i) are projected into each LOCAL view j,
  per-chip partial consistency counts / point sums are combined with ONE
  `psum` over the view axis (the all-to-all reprojection the reference
  delegates to out-of-tree fusibile, SURVEY.md §2.7), and the consumed-
  pixel marks are applied to the local `used` slice — no other
  communication.

Semantics match fuse_depthmaps exactly (same greedy order, same
accept rule); tests/test_fusion_sharded.py checks equality on an 8-device
CPU mesh.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import FusionParams
from ..geometry.camera import FAKE_BASELINE
from .fuse import _back_project_grid, _cam_arrays, _project


def fuse_depthmaps_sharded(depths: np.ndarray, normals: np.ndarray,
                           Ps: Sequence[np.ndarray], params: FusionParams,
                           mesh: Mesh, axis: str = "view",
                           colors: np.ndarray | None = None,
                           f: float | None = None,
                           baseline: float = FAKE_BASELINE):
    """fuse_depthmaps with the view axis sharded over `mesh[axis]`.

    Returns (points [M,3], normals [M,3], colors [M,3]) numpy arrays,
    identical to the single-device result.
    """
    depths = np.asarray(depths, np.float32)
    normals = np.asarray(normals, np.float32)
    N, h, w = depths.shape
    k = mesh.shape[axis]
    NP_ = -(-N // k) * k
    pad = NP_ - N

    M_inv, p4, Pj = _cam_arrays(np.stack([np.asarray(p) for p in Ps]))
    if f is None:
        from ..geometry.camera import decompose_projection
        f = float(decompose_projection(np.asarray(Ps[0]))[0][0, 0])
    cos_thresh = float(np.cos(np.radians(params.normal_thresh)))
    fb = float(f) * float(baseline)

    depths_j = jnp.asarray(depths)
    normals_full = jnp.asarray(normals)
    X_all = jnp.stack([
        _back_project_grid(M_inv[i], p4[i], depths_j[i]) for i in range(N)])

    def pad0(a):
        if pad == 0:
            return jnp.asarray(a)
        return jnp.concatenate(
            [jnp.asarray(a), jnp.zeros((pad,) + a.shape[1:], a.dtype)])

    sh = NamedSharding(mesh, P(axis))
    depths_s = jax.device_put(pad0(depths_j), sh)
    normals_s = jax.device_put(pad0(normals_full), sh)
    X_s = jax.device_put(pad0(X_all), sh)
    P_s = jax.device_put(pad0(Pj), sh)
    idx_s = jax.device_put(jnp.arange(NP_, dtype=jnp.int32), sh)
    used = jax.device_put(jnp.zeros((NP_, h, w), jnp.bool_), sh)

    n_loc = NP_ // k
    rep = P()

    from jax import shard_map

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(rep, rep, rep, rep, P(axis), P(axis), P(axis), P(axis),
                  P(axis)),
        out_specs=(rep, rep, rep, P(axis)),
        check_vma=False)
    def step(i, Xi, ni, di, used_l, depths_l, normals_l, X_l, P_l):
        idx_l = jax.lax.axis_index(axis) * n_loc + jnp.arange(
            n_loc, dtype=jnp.int32)
        is_i = idx_l == i                                       # [n_loc]
        used_i = jax.lax.psum(
            jnp.sum(jnp.where(is_i[:, None, None], used_l, False)
                    .astype(jnp.int32), axis=0), axis) > 0
        valid_i = (di > 0) & ~used_i
        count = jnp.zeros((h, w), jnp.int32)
        acc_X = jnp.zeros((h, w, 3), jnp.float32)
        acc_n = jnp.zeros((h, w, 3), jnp.float32)
        hits = []
        for j in range(n_loc):
            xi_, yi_, d_proj, inside = _project(P_l[j], Xi, (h, w))
            d_j = depths_l[j][yi_, xi_]
            n_j = normals_l[j][yi_, xi_]
            X_j = X_l[j][yi_, xi_]
            u_j = used_l[j][yi_, xi_]
            ok = (inside & valid_i & ~u_j & (d_j > 0) & ~is_i[j]
                  & (jnp.abs(fb / d_j - fb / d_proj) < params.disp_thresh)
                  & (jnp.sum(ni * n_j, -1) > cos_thresh))
            count = count + ok.astype(jnp.int32)
            acc_X = acc_X + jnp.where(ok[..., None], X_j, 0.0)
            acc_n = acc_n + jnp.where(ok[..., None], n_j, 0.0)
            hits.append((yi_, xi_, ok))
        count = jax.lax.psum(count, axis)
        acc_X = jax.lax.psum(acc_X, axis)
        acc_n = jax.lax.psum(acc_n, axis)
        keep = valid_i & (count >= params.num_consistent)
        denom = (count + 1).astype(jnp.float32)[..., None]
        fused_X = (Xi + acc_X) / denom
        an = ni + acc_n
        fused_n = an / jnp.maximum(
            jnp.linalg.norm(an, axis=-1, keepdims=True), 1e-12)
        new_used = []
        for j in range(n_loc):
            yi_, xi_, ok = hits[j]
            marked = used_l[j].at[yi_, xi_].max(ok & keep)
            new_used.append(jnp.where(is_i[j], marked | keep, marked))
        return keep, fused_X, fused_n, jnp.stack(new_used)

    out_pts, out_nrm, out_col = [], [], []
    for i in range(N):
        keep, fx, fn, used = step(jnp.asarray(i, jnp.int32), X_all[i],
                                  normals_full[i], depths_j[i], used,
                                  depths_s, normals_s, X_s, P_s)
        keep_np = np.asarray(keep)
        out_pts.append(np.asarray(fx)[keep_np])
        out_nrm.append(np.asarray(fn)[keep_np])
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
