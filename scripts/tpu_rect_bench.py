"""TPU validation + timing of the rectified fast cost path.

Runs on the real chip (JAX_PLATFORMS=axon default).  Measures per-sweep
steady-state times at dinoSparseRing scale (480x640, 6 source views,
middlebury preset), checks depth quality against the synthetic GT, and
reports the end-to-end MP/s.  Batched in one script: each distinct Pallas
compile costs 30-60 s through the remote compile helper.
"""
from __future__ import annotations

import functools as ft
import json
import time

import jax
import numpy as np

from gipuma_tpu.config import PRESETS
from gipuma_tpu.geometry.camera import FAKE_BASELINE
from gipuma_tpu.models.patchmatch import (CLOSE_OFFSETS, FAR_OFFSETS,
                                          finalize, init_state,
                                          propagation_sweep,
                                          refinement_sweep)
from gipuma_tpu.models.rect_scene import build_rect_scene
from gipuma_tpu.models.scene import build_scene
from gipuma_tpu.ops.rect_cost import rect_multiview_cost
from gipuma_tpu.utils.synthetic import plane_scene


def timeit(label, fn, *args, reps=3, **kw):
    # NOTE: block_until_ready through the axon relay returns before the
    # device finishes; np.asarray forces a real fetch (CLAUDE.md).
    t0 = time.perf_counter()
    out = fn(*args, **kw)
    np.asarray(jax.tree.leaves(out)[0])
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    np.asarray(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{label}: first={t_compile:.2f}s steady={dt*1e3:.1f}ms", flush=True)
    return out, dt


def main():
    print("devices:", jax.devices(), flush=True)
    h, w, n_views = 480, 640, 7
    images, rig, gt, _ = plane_scene(num_cams=n_views, h=h, w=w, focal=800.0,
                                     plane_depth=5.0, slant=(0.2, -0.1))
    depth_min, depth_max = 3.0, 8.0
    params = PRESETS["middlebury"].replace(seed=0, cost_path="rect")
    params = params.with_depth_range(depth_min, depth_max, rig.f,
                                     FAKE_BASELINE)

    t0 = time.perf_counter()
    base = build_scene(images, rig, list(range(1, n_views)), params,
                       depth_min, depth_max)
    scene, info = build_rect_scene(images, rig, list(range(1, n_views)),
                                   params, depth_min, depth_max, base=base)
    print(f"build: {time.perf_counter()-t0:.1f}s "
          f"rect_padded={info['rect_shape_padded']} "
          f"rot_k={[p['rot_k'] for p in info['pairs']]} "
          f"affected fwd={[round(p['fwd_affected_frac'],4) for p in info['pairs']]} "
          f"ret={[round(p['ret_affected_frac'],4) for p in info['pairs']]}",
          flush=True)

    key = jax.random.PRNGKey(0)
    jinit = jax.jit(ft.partial(init_state, cost_fn=rect_multiview_cost),
                    static_argnames=("params",))
    jclose = jax.jit(ft.partial(propagation_sweep, offsets=CLOSE_OFFSETS,
                                cost_fn=rect_multiview_cost),
                     static_argnames=("params", "parity"))
    jfar = jax.jit(ft.partial(propagation_sweep, offsets=FAR_OFFSETS,
                              cost_fn=rect_multiview_cost),
                   static_argnames=("params", "parity"))
    jrefine = jax.jit(ft.partial(refinement_sweep, cost_fn=rect_multiview_cost),
                      static_argnames=("params", "parity"))
    jfin = jax.jit(finalize)

    state, t_init = timeit("init", jinit, scene, params, key)
    state, t_close = timeit("close", jclose, state, scene, params=params,
                            parity=0)
    state, t_far = timeit("far", jfar, state, scene, params=params, parity=0)
    state, t_ref = timeit("refine", jrefine, state, scene, params=params,
                          parity=0)

    t_iter = 2 * (t_close + t_far + t_ref)
    print(f"per-iteration (6 sub-sweeps): {t_iter*1e3:.1f}ms", flush=True)

    # Warm the parity-1 variants so the steady run measures compute only.
    st = state
    for parity in (0, 1):
        st = jclose(st, scene, params=params, parity=parity)
        st = jfar(st, scene, params=params, parity=parity)
        st = jrefine(st, scene, params=params, parity=parity)
    np.asarray(st.cost)

    # Full run, end to end (all executables warm).
    t0 = time.perf_counter()
    st = jinit(scene, params, key)
    for _ in range(params.iterations):
        for parity in (0, 1):
            st = jclose(st, scene, params=params, parity=parity)
            st = jfar(st, scene, params=params, parity=parity)
            st = jrefine(st, scene, params=params, parity=parity)
    depth, normals, cost = jfin(st, scene)
    depth = np.asarray(depth)
    dt_run = time.perf_counter() - t0
    mp_s = h * w / 1e6 / dt_run

    interior = np.s_[16:-16, 16:-16]
    err = np.abs(depth[interior] - gt[interior]) / gt[interior]
    print(json.dumps({
        "run_s": round(dt_run, 3), "mp_per_s": round(mp_s, 4),
        "median_rel_err": float(np.median(err)),
        "frac_within_1pct": float(np.mean(err < 0.01)),
    }), flush=True)


if __name__ == "__main__":
    main()
