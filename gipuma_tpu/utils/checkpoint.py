"""Checkpoint / warm-start for PatchMatch state.

The reference parses an ``--initial_seed`` flag but never implemented it
(main.cpp:394-395, 819-823 — literally "// TODO").  Here it works:

* save/load the full PMState (planes + cost + PRNG key) as .npz — an exact
  resume point mid-run;
* warm-start from depth + normal maps (e.g. a previous run's disp.dmb /
  normals.dmb, or a downsampled/coarse pass): rebuilds the plane field and
  recomputes costs, so PatchMatch continues from the given geometry instead
  of random init.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AlgorithmParams
from ..geometry import transforms as T
from ..models.patchmatch import PMState
from ..ops import checkerboard as cb
from ..ops.cost import ScenePack, multiview_cost


def save_state(path: str | os.PathLike, state: PMState) -> None:
    np.savez_compressed(path, planes=np.asarray(state.planes),
                        cost=np.asarray(state.cost),
                        key=np.asarray(state.key))


def load_state(path: str | os.PathLike) -> PMState:
    z = np.load(path)
    return PMState(planes=jnp.asarray(z["planes"]),
                   cost=jnp.asarray(z["cost"]),
                   key=jnp.asarray(z["key"]))


import functools as _ft


@_ft.lru_cache(maxsize=None)
def _warm_start_jit(cost_fn):
    """Cached jit per cost_fn — eager execution dispatches every op (and
    two full multiview cost evaluations) one-by-one through the TPU relay,
    ~100x slower than the compiled path (CLAUDE.md)."""
    return jax.jit(_ft.partial(_warm_start_impl, cost_fn=cost_fn),
                   static_argnames=("params",))


def warm_start(scene: ScenePack, params: AlgorithmParams, key,
               depth: np.ndarray, normals_world: np.ndarray,
               cost_fn=multiview_cost) -> PMState:
    """Build a PMState from existing depth + world-frame normal maps.

    Inverse of models.patchmatch.finalize: rotates normals back into the
    rebased reference frame (R_orig_inv^-1 = R_orig), recomputes plane
    distances, flips normals onto the visible hemisphere, and evaluates the
    multiview cost of the given geometry.  Pixels with invalid depth
    (<= 0 / non-finite) get a fronto-parallel plane at the depth-range
    midpoint and will be repaired by subsequent propagation sweeps.
    """
    depth = jnp.asarray(np.asarray(depth, np.float32))
    normals_world = jnp.asarray(np.asarray(normals_world, np.float32))
    return _warm_start_jit(cost_fn)(scene, params, key, depth,
                                    normals_world)


def _warm_start_impl(scene: ScenePack, params: AlgorithmParams, key,
                     depth, normals_world, cost_fn=multiview_cost,
                     cost_init=None) -> PMState:
    h, w = scene.rays.shape[:2]
    x, y = T.pixel_grid(h, w)

    n_world = normals_world
    R_orig = jnp.linalg.inv(scene.R_orig_inv)
    n = jnp.einsum("ij,hwj->hwi", R_orig, n_world)
    n = T.normalize(n, eps=1e-20)
    n = T.flip_to_hemisphere(n, scene.view_vec)

    valid = jnp.isfinite(depth) & (depth > 0)
    mid = 0.5 * (scene.depth_min + scene.depth_max)
    depth = jnp.where(valid, depth, mid)
    fallback = T.flip_to_hemisphere(
        jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], n.dtype), n.shape),
        scene.view_vec)
    n = jnp.where(valid[..., None], n, fallback)

    d = T.plane_d_at_pixel(scene.M_inv, scene.P_col4, n, x, y, depth)
    planes = jnp.concatenate([n, d[..., None]], axis=-1)

    if cost_init is not None:
        # Carried-in approximate cost (e.g. the upsampled coarse level's,
        # models/pyramid.py): invalid pixels get MAXCOST so the first
        # sweep candidate repairs them.  The carried value is inflated 5%:
        # sweeps accept only strictly-better candidates, so a carried
        # UNDERestimate would permanently reject re-evaluation and leave
        # the reported cost stale/optimistic (it feeds fusion confidence);
        # with the inflation the first same-quality exact evaluation is
        # accepted and the state cost regains exact semantics.  Pixels the
        # first sweeps never repair keep an approximate (inflated) cost —
        # finalize's cost output is approximate to that extent under
        # pyramid_carry_cost.
        from ..config import MAXCOST
        cost = jnp.where(valid, 1.05 * cost_init.astype(planes.dtype),
                         MAXCOST)
        return PMState(planes=planes, cost=cost, key=key)
    cost = jnp.zeros((h, w), planes.dtype)
    for parity in (0, 1):
        c = cost_fn(scene, params, parity,
                    cb.extract(n, parity), cb.extract(d, parity))
        cost = cb.interleave(cost, c, parity)
    return PMState(planes=planes, cost=cost, key=key)
