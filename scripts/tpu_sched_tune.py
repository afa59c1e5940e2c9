"""Schedule tuning on the real chip:

1. host-dispatch granularity A/B — three executables per parity (current)
   vs ONE fused close+far+refine executable per parity (fusing all SIX
   sub-sweeps of an iteration is known to fault the TPU runtime; per-parity
   triples are the untested middle point);
2. pyramid schedule grid — levels x fine-iterations x coarse-iterations,
   wall time + quality at dino scale.
"""
from __future__ import annotations

import functools
import json
import sys
import time

import jax
import numpy as np

from gipuma_tpu.config import PRESETS
from gipuma_tpu.geometry.camera import FAKE_BASELINE
from gipuma_tpu.models import patchmatch as pm
from gipuma_tpu.models.pyramid import prepare_pyramid, run_pyramid
from gipuma_tpu.utils.synthetic import make_ring_P, plane_scene


def main():
    print("devices:", jax.devices(), flush=True)
    h, w, n_views = 480, 640, 7
    images, rig, gt, _ = plane_scene(num_cams=n_views, h=h, w=w, focal=800.0,
                                     plane_depth=5.0, slant=(0.2, -0.1))
    Ps = make_ring_P(n_views, h, w, 800.0, target_depth=5.0)
    names = [f"cam{i:03d}" for i in range(n_views)]
    subset = list(range(1, n_views))
    interior = np.s_[16:-16, 16:-16]

    # ---- 1. dispatch granularity at full resolution ----
    params = PRESETS["middlebury"].replace(seed=0, cost_path="rect",
                                           pyramid_levels=1)
    params = params.with_depth_range(3.0, 8.0, rig.f, FAKE_BASELINE)
    prep = prepare_pyramid(images, Ps, names, subset, params, 3.0, 8.0)
    scene, cost_fn, params_l, shp = prep[0]
    jinit, jclose, jfar, jrefine = pm._host_loop_jits(cost_fn)
    key = jax.random.PRNGKey(0)
    state0 = jinit(scene, params_l, key)

    def parity_step(state, scene, params, parity):
        state = pm.propagation_sweep(state, scene, params, parity,
                                     pm.CLOSE_OFFSETS, cost_fn=cost_fn)
        state = pm.propagation_sweep(state, scene, params, parity,
                                     pm.FAR_OFFSETS, cost_fn=cost_fn)
        return pm.refinement_sweep(state, scene, params, parity,
                                   cost_fn=cost_fn)

    jparity = jax.jit(parity_step, static_argnames=("params", "parity"))

    def time_it(label, fn, reps=6):
        s = fn(state0)
        np.asarray(s.cost)
        t0 = time.perf_counter()
        for _ in range(reps):
            s = fn(s)
        np.asarray(s.cost)
        print(f"{label:32s} {(time.perf_counter()-t0)/reps*1e3:8.1f} ms "
              "per parity-triple", flush=True)
        return s

    def three(s):
        s = jclose(s, scene, params=params_l, parity=0)
        s = jfar(s, scene, params=params_l, parity=0)
        return jrefine(s, scene, params=params_l, parity=0)

    # Dispatch-overhead probes: trivial executables taking the same args.
    f_state = jax.jit(lambda s: s._replace(cost=s.cost + 1.0))
    time_it("trivial jit (state args)", lambda s: f_state(s), reps=20)
    f_scene = jax.jit(
        lambda s, sc: s._replace(cost=s.cost + sc.disp_bounds[0, 0]))
    time_it("trivial jit (state+scene args)",
            lambda s: f_scene(s, scene), reps=20)

    s3 = time_it("3 dispatches (close/far/ref)", three)
    if "parity" in sys.argv:
        # Costs a fresh ~3-kernel-instance compile (~tens of minutes
        # through the remote helper) — opt-in.
        try:
            s1 = time_it("1 fused parity dispatch",
                         lambda s: jparity(s, scene, params=params_l,
                                           parity=0))
            d = np.abs(np.asarray(s1.cost) - np.asarray(s3.cost))
            print(f"   state agreement after 7 steps: "
                  f"max|dcost|={d.max():.2e}", flush=True)
        except Exception as e:
            print(f"   fused parity dispatch FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
    if "grid" not in sys.argv:
        return

    # ---- 2. pyramid schedule grid ----
    for levels, fine_iters, coarse_iters in [(2, 2, 8), (2, 1, 8),
                                             (3, 2, 8), (3, 1, 8),
                                             (3, 2, 6), (2, 2, 6)]:
        p = PRESETS["middlebury"].replace(
            seed=0, cost_path="rect", pyramid_levels=levels,
            pyramid_fine_iterations=fine_iters, iterations=coarse_iters)
        p = p.with_depth_range(3.0, 8.0, rig.f, FAKE_BASELINE)
        prep = prepare_pyramid(images, Ps, names, subset, p, 3.0, 8.0)
        depth, _, _ = run_pyramid(prep, jax.random.PRNGKey(0))  # warm
        t0 = time.perf_counter()
        depth, _, _ = run_pyramid(prep, jax.random.PRNGKey(1))
        dt = time.perf_counter() - t0
        err = np.abs(depth[interior] - gt[interior]) / gt[interior]
        print(json.dumps({
            "levels": levels, "fine_iters": fine_iters,
            "coarse_iters": coarse_iters, "wall_s": round(dt, 2),
            "mp_per_s": round(h * w / 1e6 / dt, 4),
            "median_rel_err": round(float(np.median(err)), 6),
            "frac_within_1pct": round(float(np.mean(err < 0.01)), 4),
        }), flush=True)


if __name__ == "__main__":
    main()
