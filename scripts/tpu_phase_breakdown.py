"""Phase breakdown of the bench.py pyramid run on the real chip.

Times each sub-sweep executable at both pyramid levels, init/warm-start,
finalize, and the bare dispatch cost, to locate where the 6.5 s/run goes.
"""
from __future__ import annotations

import time

import jax
import numpy as np

from gipuma_tpu.config import PRESETS
from gipuma_tpu.geometry.camera import FAKE_BASELINE
from gipuma_tpu.models.patchmatch import _host_loop_jits
from gipuma_tpu.models.pyramid import prepare_pyramid, run_pyramid, _jfin
from gipuma_tpu.utils.synthetic import make_ring_P, plane_scene


def t(label, fn, *args, reps=10, **kw):
    out = fn(*args, **kw)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    np.asarray(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:28s} {dt*1e3:8.2f} ms", flush=True)
    return out, dt


def main():
    print("devices:", jax.devices(), flush=True)
    h, w, n_views = 480, 640, 7
    images, rig, gt, _ = plane_scene(num_cams=n_views, h=h, w=w, focal=800.0,
                                     plane_depth=5.0, slant=(0.2, -0.1))
    Ps = make_ring_P(n_views, h, w, 800.0, target_depth=5.0)
    names = [f"cam{i:03d}" for i in range(n_views)]
    params = PRESETS["middlebury"].replace(
        seed=0, cost_path="rect", pyramid_levels=2,
        pyramid_fine_iterations=2)
    params = params.with_depth_range(3.0, 8.0, rig.f, FAKE_BASELINE)
    subset = list(range(1, n_views))

    t0 = time.perf_counter()
    prep = prepare_pyramid(images, Ps, names, subset, params, 3.0, 8.0)
    print(f"prepare_pyramid: {time.perf_counter()-t0:.1f}s", flush=True)

    # End-to-end (compile + steady).
    t0 = time.perf_counter()
    d = run_pyramid(prep, jax.random.PRNGKey(0))[0]
    print(f"run_pyramid first: {time.perf_counter()-t0:.1f}s", flush=True)
    for i in range(2):
        t0 = time.perf_counter()
        d = run_pyramid(prep, jax.random.PRNGKey(i + 1))[0]
        print(f"run_pyramid steady: {time.perf_counter()-t0:.2f}s",
              flush=True)
    err = np.abs(d[16:-16, 16:-16] - gt[16:-16, 16:-16]) / gt[16:-16, 16:-16]
    print(f"median rel err {np.median(err):.2e}", flush=True)

    # Per-phase steady-state.
    for lvl, item in enumerate(prep):
        scene, cost_fn, params_l, shp = (item.result()
                                         if hasattr(item, "result") else item)
        jinit, jclose, jfar, jrefine = _host_loop_jits(cost_fn)
        key = jax.random.PRNGKey(0)
        state, _ = t(f"L{lvl} {shp} init", jinit, scene, params_l, key,
                     reps=3)
        state, dtc = t(f"L{lvl} close sweep", jclose, state, scene,
                       params=params_l, parity=0)
        state, dtf = t(f"L{lvl} far sweep", jfar, state, scene,
                       params=params_l, parity=0)
        state, dtr = t(f"L{lvl} refine sweep", jrefine, state, scene,
                       params=params_l, parity=0)
        iters = params_l.iterations
        print(f"L{lvl} => iter = {2*(dtc+dtf+dtr)*1e3:.0f} ms x {iters} "
              f"iters = {2*(dtc+dtf+dtr)*iters:.2f} s", flush=True)
        _, dfin = t(f"L{lvl} finalize", _jfin, state, scene)

    # Bare dispatch: trivial jit on the state pytree.
    f = jax.jit(lambda s: s.cost + 1.0)
    t("bare dispatch (state)", f, state, reps=20)


if __name__ == "__main__":
    main()
