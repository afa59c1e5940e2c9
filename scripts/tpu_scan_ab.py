"""A/B: host-dispatched sub-sweeps vs the single-dispatch scan runner.

Each host dispatch of a sweep executable costs ~13-15 ms of wall overhead
through the TPU relay (tpu_sched_tune); a bench run makes ~66 of them.
run_iterations_scan issues ONE dispatch per level.  This measures both on
the bench scene at the finest level only (pyramid_levels=1, iterations=N)
to bound the new executable's Mosaic compile time, and checks the results
agree in distribution (same schedule, different parity specialization —
PRNG streams are identical, so depth should match closely).
"""
from __future__ import annotations

import time

import jax
import numpy as np

from gipuma_tpu.config import PRESETS
from gipuma_tpu.geometry.camera import FAKE_BASELINE
from gipuma_tpu.models.patchmatch import run_patchmatch_host_loop
from gipuma_tpu.models.pyramid import _jfin, prepare_pyramid
from gipuma_tpu.utils.synthetic import make_ring_P, plane_scene


def main():
    print("devices:", jax.devices(), flush=True)
    h, w, n_views = 480, 640, 7
    images, rig, gt, _ = plane_scene(num_cams=n_views, h=h, w=w, focal=800.0,
                                     plane_depth=5.0, slant=(0.2, -0.1))
    Ps = make_ring_P(n_views, h, w, 800.0, target_depth=5.0)
    names = [f"cam{i:03d}" for i in range(n_views)]
    base = PRESETS["middlebury"].replace(
        seed=0, cost_path="rect", pyramid_levels=1, iterations=2)
    base = base.with_depth_range(3.0, 8.0, rig.f, FAKE_BASELINE)
    prep = prepare_pyramid(images, Ps, names, list(range(1, n_views)),
                           base, 3.0, 8.0)
    scene, cost_fn, params_l, shp = prep[0]
    interior = np.s_[16:-16, 16:-16]

    for mode in ("host", "scan"):
        p = params_l.replace(level_dispatch=mode)
        t0 = time.perf_counter()
        st = run_patchmatch_host_loop(scene, p, jax.random.PRNGKey(0),
                                      cost_fn=cost_fn)
        d = np.asarray(_jfin(st, scene)[0])
        t_compile = time.perf_counter() - t0
        reps = 3
        t0 = time.perf_counter()
        for i in range(reps):
            st = run_patchmatch_host_loop(scene, p, jax.random.PRNGKey(i),
                                          cost_fn=cost_fn)
            d = _jfin(st, scene)[0]
        d = np.asarray(d)
        dt = (time.perf_counter() - t0) / reps
        err = np.abs(d[interior] - gt[interior]) / gt[interior]
        print(f"{mode:5s}: warm {dt*1e3:8.1f} ms/level-run "
              f"(first incl compile {t_compile:.1f} s), "
              f"median rel err {np.median(err):.4g}, "
              f"frac<1% {(err < 0.01).mean():.4f}", flush=True)


if __name__ == "__main__":
    main()
