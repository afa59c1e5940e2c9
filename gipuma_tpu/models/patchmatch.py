"""The PatchMatch multi-view stereo engine (flagship model).

TPU-native rebuild of the reference's GPU core (gipuma.cu:996-1960):

* random plane-field init            — gipuma_init_cu2        (gipuma.cu:996-1051)
* checkerboard close propagation ±1  — spatialPropClose       (gipuma.cu:1471-1588)
* checkerboard far propagation ±5    — spatialPropFar         (gipuma.cu:1353-1468)
* plane refinement (perturbation)    — planeRefinement_cu     (gipuma.cu:928-994)
* iteration schedule black/red x {close, far, refine}          (gipuma.cu:1911-1941)
* final world-normal / depth output  — gipuma_compute_disp    (gipuma.cu:1080-1103)

Design notes (deviations are deliberate TPU-first choices, documented):

* State is functional: {planes [H,W,4], cost [H,W], key}.  Each sub-sweep
  reads the arrays produced by the previous sub-sweep — exactly the
  semantics the reference gets from separate kernel launches with
  cudaDeviceSynchronize between them (gipuma.cu:1916-1936).  Within the far
  sweep the reference has a benign read/write race on same-color neighbors;
  we deterministically read pre-sweep values.
* RNG is jax.random with per-(iteration, phase) folded keys instead of
  curand seeded with clock64() (gipuma.cu:1019) — bitwise reproducible.
* Random unit normals use normalized Gaussians (equivalent distribution to
  the reference's Marsaglia rejection sampling, gipuma.cu:148-164, but
  rejection-free and branch-free).
* The iteration loop is a lax.scan — one compiled program regardless of
  iteration count.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MAXCOST, AlgorithmParams
from ..geometry import transforms as T
from ..ops import checkerboard as cb
from ..ops.cost import ScenePack, combine_view_costs, multiview_cost, per_view_costs


class PMState(NamedTuple):
    """Mutable algorithm state — the LineState analog (linestate.h:8-30):
    norm4 (nx, ny, nz, d) and per-pixel cost, plus the PRNG key."""

    planes: jnp.ndarray   # [H, W, 4] = (nx, ny, nz, d)
    cost: jnp.ndarray     # [H, W]
    key: jnp.ndarray      # PRNG key


# Propagation offsets as (dy, dx), in the reference's evaluation order
# (up, down, left, right — gipuma.cu:1450-1462, 1569-1582).
CLOSE_OFFSETS = ((-1, 0), (1, 0), (0, -1), (0, 1))
FAR_OFFSETS = ((-5, 0), (5, 0), (0, -5), (0, 5))
# Monolithic-kernel offsets (gipuma_checkerboard_cu, gipuma.cu:1236-1330):
# per axis ±1 (base), ±3 (EXTRAPOINT), ±5 (EXTRAPOINTFAR), plus the
# EXTRAPOINT2 diagonal-ish points, in the reference's evaluation order.
MONOLITHIC_OFFSETS = (
    (-1, 0), (-3, 0), (-5, 0),      # up, upup, upup-2
    (1, 0), (3, 0), (5, 0),         # down...
    (0, -1), (0, -3), (0, -5),      # left...
    (0, 1), (0, 3), (0, 5),         # right...
    # EXTRAPOINT2 (gipuma.cu:1294-1330)
    (-1, 2), (1, 2), (-1, -2), (1, -2),
    (-2, -1), (-2, 1), (2, -1), (2, 1),
)


def _active_coords(scene: ScenePack, parity: int):
    """Active-pixel coordinates in GLOBAL image space (row_offset shifts a
    tile shard's local rows; checkerboard parity is preserved because tile
    sharding uses even row offsets)."""
    h = scene.rays.shape[0]
    w2 = scene.rays.shape[1] // 2
    x = cb.active_x(h, w2, parity)
    y = cb.active_y(h, w2) + scene.row_offset.astype(jnp.float32)
    return x, y


def random_unit_hemisphere(key, view_vec: jnp.ndarray) -> jnp.ndarray:
    """Random unit normals facing the camera (rndUnitVectorOnHemisphere_cu,
    gipuma.cu:166-169); Gaussian-normalize instead of Marsaglia rejection."""
    g = jax.random.normal(key, view_vec.shape, dtype=view_vec.dtype)
    n = T.normalize(g, eps=1e-20)
    return T.flip_to_hemisphere(n, view_vec)


def init_state(scene: ScenePack, params: AlgorithmParams, key,
               cost_fn=multiview_cost) -> PMState:
    """Random init: uniform disparity -> depth, random hemisphere normal,
    plane distance, initial multiview cost (gipuma_init_cu2)."""
    h, w = scene.rays.shape[:2]
    x, y = T.pixel_grid(h, w)
    y = y + scene.row_offset.astype(y.dtype)
    k_disp, k_norm, key = jax.random.split(key, 3)

    disp = jax.random.uniform(
        k_disp, (h, w), minval=params.min_disparity, maxval=params.max_disparity)
    depth = T.disparity_depth(scene.f, scene.baseline, disp)
    n = random_unit_hemisphere(k_norm, scene.view_vec)
    d = T.plane_d_at_pixel(scene.M_inv, scene.P_col4, n, x, y, depth)
    planes = jnp.concatenate([n, d[..., None]], axis=-1)

    cost = jnp.zeros((h, w), planes.dtype)
    for parity in (0, 1):
        np_, dp_ = cb.extract(n, parity), cb.extract(d, parity)
        c = cost_fn(scene, params, parity, np_, dp_)
        cost = cb.interleave(cost, c, parity)
    return PMState(planes=planes, cost=cost, key=key)


def _fold_better(scene, params, parity, x, y,
                 cand_n, cand_d, cand_ok,
                 n_now, d_now, c_now, cost_fn=multiview_cost):
    """Sequentially accept strictly-better candidates (spatialPropagation_cu,
    gipuma.cu:832-874): compute each candidate's multiview cost, accept when
    cost < current AND the induced depth is inside [depthMin, depthMax].

    Costs are candidate-independent of the running best, so they are all
    evaluated up front and only the accept fold is sequential — same result
    as the reference's candidate-by-candidate loop, first-minimum
    tie-breaking included.  Cost functions exposing a `batch` attribute
    (the rect fast path) evaluate every candidate in ONE pass — one kernel
    launch per stage instead of per candidate; otherwise lax.map runs them
    sequentially (not vmap or a python loop: vmap-batching the Pallas
    sampling kernel hangs the TPU runtime, and python-loop unrolling
    duplicates the kernel executable per candidate, overflowing the
    executable serializer)."""
    batch = getattr(cost_fn, "batch", None)
    if batch is not None:
        # cand_ok rides along so the two-stage cull's sparse ranking can
        # exclude engine-invalid candidates (border propagation sources)
        # from its argmin — a mispicked invalid winner would mask every
        # valid runner-up to MAXCOST and lose the stage's acceptance.
        # cur: the current plane, so the two-stage cull's early
        # termination can skip full evaluation where no candidate beats
        # it in the sparse operator (config.cull_early_term).
        ck_all = batch(scene, params, parity, cand_n, cand_d,
                       cand_ok=cand_ok, cur=(n_now, d_now))
    else:
        ck_all = jax.lax.map(
            lambda nd: cost_fn(scene, params, parity, nd[0], nd[1]),
            (cand_n, cand_d))
    depth_all = T.depth_from_plane(cand_n, cand_d, x, y, scene.fx, scene.cx,
                                   scene.cy, scene.alpha_focal)
    for k in range(cand_n.shape[0]):
        nk, dk, okk, ck = cand_n[k], cand_d[k], cand_ok[k], ck_all[k]
        depth_k = depth_all[k]
        in_range = (depth_k >= scene.depth_min) & (depth_k <= scene.depth_max)
        accept = okk & in_range & (ck < c_now)
        n_now = jnp.where(accept[..., None], nk, n_now)
        d_now = jnp.where(accept, dk, d_now)
        c_now = jnp.where(accept, ck, c_now)
    return n_now, d_now, c_now


def propagation_sweep(state: PMState, scene: ScenePack, params: AlgorithmParams,
                      parity: int, offsets, cost_fn=multiview_cost,
                      halo_planes=None) -> PMState:
    """One checkerboard propagation sub-sweep over the given neighbor offsets.

    halo_planes: optional row-extended plane array [H + 2*pad, W, 4] whose
    first/last `pad` rows came from neighboring tile shards (see
    parallel/tiled.py); None = single-tile edge replication."""
    h, w = state.cost.shape
    w2 = w // 2
    x, y = _active_coords(scene, parity)

    pad = max(max(abs(dy), abs(dx)) for dy, dx in offsets)
    if halo_planes is not None:
        # Tile-sharded: neighbor rows come from the adjacent shards
        # (exchanged over ICI), not edge replication.
        planes_eo = cb.PaddedEO.build_row_padded(halo_planes, pad, pad + 2)
    else:
        planes_eo = cb.PaddedEO.build(state.planes, pad, pad + 2)

    g_h = scene.global_h.astype(y.dtype)
    cand_n, cand_d, cand_ok = [], [], []
    for dy, dx in offsets:
        cand = planes_eo.shifted(dy, dx, parity)             # [H, W2, 4]
        cand_n.append(cand[..., :3])
        cand_d.append(cand[..., 3])
        ok = ((y + dy >= 0) & (y + dy <= g_h - 1) &
              (x + dx >= 0) & (x + dx <= w - 1))
        cand_ok.append(ok)
    cand_n = jnp.stack(cand_n)
    cand_d = jnp.stack(cand_d)
    cand_ok = jnp.stack(cand_ok)

    n_now = cb.extract(state.planes[..., :3], parity)
    d_now = cb.extract(state.planes[..., 3], parity)
    c_now = cb.extract(state.cost, parity)

    n_old, d_old = n_now, d_now
    n_now, d_now, c_now = _fold_better(
        scene, params, parity, x, y, cand_n, cand_d, cand_ok,
        n_now, d_now, c_now, cost_fn=cost_fn)

    if params.no_texture_check:
        # Textureless pixels are frozen at MAXCOST (gipuma.cu:1209-1234).
        tex = cb.extract(scene.texture_ok, parity)
        n_now = jnp.where(tex[..., None], n_now, n_old)
        d_now = jnp.where(tex, d_now, d_old)
        c_now = jnp.where(tex, c_now, MAXCOST)

    planes = cb.interleave(
        state.planes, jnp.concatenate([n_now, d_now[..., None]], -1), parity)
    cost = cb.interleave(state.cost, c_now, parity)
    return PMState(planes=planes, cost=cost, key=state.key)


def axial_propagation_sweep(state: PMState, scene: ScenePack,
                            params: AlgorithmParams, parity: int, dist,
                            cost_fn=multiview_cost,
                            halo_planes=None) -> PMState:
    """propagation_sweep for the four axial offsets at TRACED distance
    `dist` — close (1) and far (5) sweeps share ONE compiled executable
    (each distinct executable embedding the fused cost kernel costs minutes
    of remote Mosaic compile per scene shape; offsets-as-data halves the
    propagation compile count).  `dist` must be odd (the reference's 1/5 —
    the even/odd column-plane selection is compile-time per candidate)."""
    h, w = state.cost.shape
    x, y = _active_coords(scene, parity)

    pad = 5   # static bound covering both close (1) and far (5)
    if halo_planes is not None:
        planes_eo = cb.PaddedEO.build_row_padded(halo_planes, pad, pad + 2)
    else:
        planes_eo = cb.PaddedEO.build(state.planes, pad, pad + 2)

    dist = jnp.asarray(dist, jnp.int32)
    g_h = scene.global_h.astype(y.dtype)
    cand_n, cand_d, cand_ok = [], [], []
    for sy, sx, dxp in ((-1, 0, 0), (1, 0, 0), (0, -1, 1), (0, 1, 1)):
        dy = sy * dist
        dx = sx * dist
        cand = planes_eo.shifted_dyn(dy, dx, parity, dx_parity=dxp)
        cand_n.append(cand[..., :3])
        cand_d.append(cand[..., 3])
        dyf = dy.astype(y.dtype)
        dxf = dx.astype(y.dtype)
        ok = ((y + dyf >= 0) & (y + dyf <= g_h - 1) &
              (x + dxf >= 0) & (x + dxf <= w - 1))
        cand_ok.append(ok)
    cand_n = jnp.stack(cand_n)
    cand_d = jnp.stack(cand_d)
    cand_ok = jnp.stack(cand_ok)

    n_now = cb.extract(state.planes[..., :3], parity)
    d_now = cb.extract(state.planes[..., 3], parity)
    c_now = cb.extract(state.cost, parity)

    n_old, d_old = n_now, d_now
    n_now, d_now, c_now = _fold_better(
        scene, params, parity, x, y, cand_n, cand_d, cand_ok,
        n_now, d_now, c_now, cost_fn=cost_fn)

    if params.no_texture_check:
        tex = cb.extract(scene.texture_ok, parity)
        n_now = jnp.where(tex[..., None], n_now, n_old)
        d_now = jnp.where(tex, d_now, d_old)
        c_now = jnp.where(tex, c_now, MAXCOST)

    planes = cb.interleave(
        state.planes, jnp.concatenate([n_now, d_now[..., None]], -1), parity)
    cost = cb.interleave(state.cost, c_now, parity)
    return PMState(planes=planes, cost=cost, key=state.key)


def refinement_sweep(state: PMState, scene: ScenePack, params: AlgorithmParams,
                     parity: int, cost_fn=multiview_cost) -> PMState:
    """Plane refinement: exponential perturbation schedule in disparity space
    (planeRefinement_cu + getRndDispAndUnitVector_cu, gipuma.cu:890-994)."""
    x, y = _active_coords(scene, parity)
    view_vec = cb.extract(scene.view_vec, parity)

    n_now = cb.extract(state.planes[..., :3], parity)
    d_now = cb.extract(state.planes[..., 3], parity)
    c_now = cb.extract(state.cost, parity)
    depth_now = T.depth_from_plane(n_now, d_now, x, y, scene.fx, scene.cx,
                                   scene.cy, scene.alpha_focal)

    schedule = params.refinement_schedule()
    batch = getattr(cost_fn, "batch", None)
    if batch is not None and params.refine_batched:
        # All rounds as ONE K-candidate batch around the sweep's starting
        # state (see config.refine_batched): one batched kernel dispatch
        # instead of one per round.
        R = len(schedule)
        key, kz, kn = jax.random.split(state.key, 3)
        deltas = jnp.asarray(np.asarray(schedule, dtype=np.float32))
        delta_z = deltas[:, 0][:, None, None]                 # [R, 1, 1]
        delta_n = deltas[:, 1][:, None, None, None]           # [R, 1, 1, 1]
        if params.no_texture_check:
            tex_ok = cb.extract(scene.texture_ok, parity)

        disp = T.disparity_depth(scene.f, scene.baseline, depth_now)
        min_delta = -jnp.minimum(delta_z, params.min_disparity + disp[None])
        max_delta = jnp.minimum(delta_z, params.max_disparity - disp[None])
        u = jax.random.uniform(kz, (R,) + disp.shape, dtype=disp.dtype)
        disp_new = disp[None] + min_delta + u * (max_delta - min_delta)
        disp_new = jnp.clip(disp_new, params.min_disparity,
                            params.max_disparity)
        depth_new = T.disparity_depth(scene.f, scene.baseline, disp_new)

        u_n = jax.random.uniform(kn, (R,) + n_now.shape, dtype=n_now.dtype)
        n_new = T.normalize(n_now[None] + (u_n * 2.0 - 1.0) * delta_n,
                            eps=1e-20)
        n_new = T.flip_to_hemisphere(n_new, view_vec[None])
        d_new = T.plane_d_at_pixel(scene.M_inv, scene.P_col4, n_new, x, y,
                                   depth_new)

        ck_all = batch(scene, params, parity, n_new, d_new,
                       cur=(n_now, d_now))                    # [R, H, W2]
        for k in range(R):
            accept = ck_all[k] < c_now
            if params.no_texture_check:
                accept = accept & tex_ok
            n_now = jnp.where(accept[..., None], n_new[k], n_now)
            d_now = jnp.where(accept, d_new[k], d_now)
            c_now = jnp.where(accept, ck_all[k], c_now)

        if params.no_texture_check:
            c_now = jnp.where(cb.extract(scene.texture_ok, parity), c_now,
                              MAXCOST)
        planes = cb.interleave(
            state.planes, jnp.concatenate([n_now, d_now[..., None]], -1),
            parity)
        cost = cb.interleave(state.cost, c_now, parity)
        return PMState(planes=planes, cost=cost, key=key)

    key = state.key
    # Rounds as a lax.scan over the stacked (delta_z, delta_n, key) schedule
    # so the compiled program holds ONE cost-kernel instance for all rounds.
    keys = jax.random.split(key, 2 * len(schedule) + 1)
    key = keys[0]
    round_keys = keys[1:].reshape(len(schedule), 2, *keys.shape[1:])
    deltas = jnp.asarray(np.asarray(schedule, dtype=np.float32))
    if params.no_texture_check:
        tex_ok = cb.extract(scene.texture_ok, parity)

    def round_body(carry, rin):
        n_now, d_now, c_now, depth_now = carry
        (delta_z, delta_n), ks = rin
        kz, kn = ks[0], ks[1]
        disp = T.disparity_depth(scene.f, scene.baseline, depth_now)
        # Perturbation interval limited by the disparity range
        # (gipuma.cu:906-916).
        min_delta = -jnp.minimum(delta_z, params.min_disparity + disp)
        max_delta = jnp.minimum(delta_z, params.max_disparity - disp)
        u = jax.random.uniform(kz, disp.shape, dtype=disp.dtype)
        disp_new = disp + min_delta + u * (max_delta - min_delta)
        disp_new = jnp.clip(disp_new, params.min_disparity, params.max_disparity)
        depth_new = T.disparity_depth(scene.f, scene.baseline, disp_new)

        u_n = jax.random.uniform(kn, n_now.shape, dtype=n_now.dtype)
        jitter = (u_n * 2.0 - 1.0) * delta_n
        n_new = T.normalize(n_now + jitter, eps=1e-20)
        n_new = T.flip_to_hemisphere(n_new, view_vec)
        d_new = T.plane_d_at_pixel(scene.M_inv, scene.P_col4, n_new, x, y,
                                   depth_new)

        c_new = cost_fn(scene, params, parity, n_new, d_new)
        accept = c_new < c_now
        if params.no_texture_check:
            accept = accept & tex_ok
        n_now = jnp.where(accept[..., None], n_new, n_now)
        d_now = jnp.where(accept, d_new, d_now)
        depth_now = jnp.where(accept, depth_new, depth_now)
        c_now = jnp.where(accept, c_new, c_now)
        return (n_now, d_now, c_now, depth_now), None

    (n_now, d_now, c_now, depth_now), _ = jax.lax.scan(
        round_body, (n_now, d_now, c_now, depth_now),
        ((deltas[:, 0], deltas[:, 1]), round_keys))

    if params.no_texture_check:
        c_now = jnp.where(cb.extract(scene.texture_ok, parity), c_now, MAXCOST)
    planes = cb.interleave(
        state.planes, jnp.concatenate([n_now, d_now[..., None]], -1), parity)
    cost = cb.interleave(state.cost, c_now, parity)
    return PMState(planes=planes, cost=cost, key=key)


def iteration(state: PMState, scene: ScenePack, params: AlgorithmParams,
              cost_fn=multiview_cost) -> PMState:
    """One full PatchMatch iteration: black {close, far, refine} then red
    {close, far, refine} (gipuma.cu:1911-1941, SMALLKERNEL schedule)."""
    for parity in (0, 1):  # 0 = black, 1 = red
        if params.propagation_variant == "monolithic":
            state = propagation_sweep(state, scene, params, parity,
                                      MONOLITHIC_OFFSETS, cost_fn=cost_fn)
        else:
            state = propagation_sweep(state, scene, params, parity,
                                      CLOSE_OFFSETS, cost_fn=cost_fn)
            if params.far_propagation:
                state = propagation_sweep(state, scene, params, parity,
                                          FAR_OFFSETS, cost_fn=cost_fn)
        if params.refine:
            state = refinement_sweep(state, scene, params, parity,
                                     cost_fn=cost_fn)
    return state


import functools as _ft


@_ft.lru_cache(maxsize=None)
def _host_loop_jits(cost_fn):
    """Module-level jit wrappers keyed by cost_fn: re-creating them per run
    would retrace + recompile every depth-map job of a batch (minutes per
    Pallas-bearing executable through the remote TPU compile helper).

    Close and far propagation share ONE executable (`jprop`): the axial
    distance is a traced argument (axial_propagation_sweep), so each scene
    shape compiles 3 big executables (init, prop, refine), not 4.
    jclose/jfar below are thin distance bindings of jprop."""
    jinit = jax.jit(_ft.partial(init_state, cost_fn=cost_fn),
                    static_argnames=("params",))
    jprop = jax.jit(_ft.partial(axial_propagation_sweep, cost_fn=cost_fn),
                    static_argnames=("params", "parity"))
    jclose = lambda s, sc, params, parity: jprop(s, sc, params=params,
                                                 parity=parity, dist=1)
    jfar = lambda s, sc, params, parity: jprop(s, sc, params=params,
                                               parity=parity, dist=5)
    return jinit, jclose, jfar, jrefine_of(cost_fn)


@_ft.lru_cache(maxsize=None)
def jrefine_of(cost_fn):
    return jax.jit(_ft.partial(refinement_sweep, cost_fn=cost_fn),
                   static_argnames=("params", "parity"))


def run_patchmatch_host_loop(scene: ScenePack, params: AlgorithmParams, key,
                             cost_fn=multiview_cost,
                             state: PMState | None = None) -> PMState:
    """run_patchmatch with host-side sub-sweep dispatch.

    Keeps each sub-sweep a separate (cached) jit executable instead of one
    fused program.  Needed on TPU with the Pallas sampler: fusing all six
    sub-sweeps into one executable trips a runtime kernel fault (the
    individual sweeps run fine); dispatch overhead is ~30 us per sweep,
    negligible against sweep compute.  Mirrors the reference's six separate
    kernel launches per iteration (gipuma.cu:1911-1941) — structurally the
    same schedule.

    state: optional warm-start state (utils/checkpoint.warm_start or a
    coarser pyramid level) — skips the random init.
    """
    jinit, jclose, jfar, jrefine = _host_loop_jits(cost_fn)

    if state is None:
        state = jinit(scene, params, key)
    if params.level_dispatch == "scan":
        return _scan_run_jit(cost_fn)(state, scene, params=params)
    for _ in range(params.iterations):
        for parity in (0, 1):
            state = jclose(state, scene, params=params, parity=parity)
            if params.far_propagation:
                state = jfar(state, scene, params=params, parity=parity)
            if params.refine:
                state = jrefine(state, scene, params=params, parity=parity)
    return state


@_ft.lru_cache(maxsize=None)
def _scan_run_jit(cost_fn):
    return jax.jit(_ft.partial(run_iterations_scan, cost_fn=cost_fn),
                   static_argnames=("params",))


def run_iterations_scan(state: PMState, scene: ScenePack,
                        params: AlgorithmParams,
                        cost_fn=multiview_cost) -> PMState:
    """All iterations as ONE device-side program: lax.scan over
    iterations x parity x axial distance, with parity and distance TRACED.

    Motivation (measured, tpu_sched_tune): every host dispatch of a sweep
    executable costs ~13-15 ms of wall overhead through the TPU relay —
    ~0.9 s of a 2.9 s dino run at 60 dispatches.  This runner issues ONE
    dispatch for all iterations of a level, and compiles only TWO
    Mosaic kernel instances (one propagation site, one refinement site)
    because parity rides the scan carry instead of specializing the
    executable.  The historic 'fused six sub-sweeps' kernel fault predates
    the fused window-cost kernel; equivalence with the host loop is
    asserted in tests and the A/B script."""
    dists = np.asarray([1, 5] if params.far_propagation else [1], np.int32)

    def parity_body(s, parity):
        def prop_body(s, dist):
            return axial_propagation_sweep(s, scene, params, parity, dist,
                                           cost_fn=cost_fn), None
        s, _ = jax.lax.scan(prop_body, s, jnp.asarray(dists))
        if params.refine:
            # refinement_sweep accepts a traced parity: every checkerboard
            # helper treats parity arithmetically ((y + parity) % 2).
            s = refinement_sweep(s, scene, params, parity, cost_fn=cost_fn)
        return s, None

    def iter_body(s, _):
        s, _ = jax.lax.scan(parity_body, s, jnp.arange(2, dtype=jnp.int32))
        return s, None

    state, _ = jax.lax.scan(iter_body, state, None, length=params.iterations)
    return state


def run_patchmatch(scene: ScenePack, params: AlgorithmParams, key,
                   cost_fn=multiview_cost) -> PMState:
    """Init + `params.iterations` iterations as a lax.scan (jit-friendly).

    `cost_fn` lets the parallel layer substitute a view-sharded multiview
    cost (per-view costs computed on each chip's local views, combined via
    an ICI all-gather) without touching the sweep logic."""
    state = init_state(scene, params, key, cost_fn=cost_fn)

    def step(s, _):
        return iteration(s, scene, params, cost_fn=cost_fn), None

    state, _ = jax.lax.scan(step, state, None, length=params.iterations)
    return state


def finalize(state: PMState, scene: ScenePack) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """World-frame normals + depth map (gipuma_compute_disp,
    gipuma.cu:1080-1103).  Returns (depth [H,W], normals_world [H,W,3],
    cost [H,W]); depth is 0 where the pixel never found a valid view."""
    h, w = state.cost.shape
    x, y = T.pixel_grid(h, w)
    y = y + scene.row_offset.astype(y.dtype)
    n = state.planes[..., :3]
    d = state.planes[..., 3]
    depth = T.depth_from_plane(n, d, x, y, scene.fx, scene.cx, scene.cy,
                               scene.alpha_focal)
    depth = jnp.where(state.cost != MAXCOST, depth, 0.0)
    n_world = jnp.einsum("ij,hwj->hwi", scene.R_orig_inv, n)
    return depth, n_world, state.cost
