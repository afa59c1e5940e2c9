"""Pyramid fine-level tuning on the real chip: fine iterations x far-prop
on/off, measuring steady wall time and depth quality at dino scale."""
from __future__ import annotations

import json
import time

import jax
import numpy as np

from gipuma_tpu.config import PRESETS
from gipuma_tpu.geometry.camera import FAKE_BASELINE
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

    for fine_iters, fine_far, coarse_iters in [(2, True, 8), (2, False, 8),
                                               (1, True, 8), (1, False, 8),
                                               (2, True, 6)]:
        params = PRESETS["middlebury"].replace(
            seed=0, cost_path="rect", pyramid_levels=2,
            pyramid_fine_iterations=fine_iters, iterations=coarse_iters)
        params = params.with_depth_range(3.0, 8.0, rig.f, FAKE_BASELINE)
        prep = prepare_pyramid(images, Ps, names, subset, params,
                               3.0, 8.0)
        if not fine_far:
            scene, cost_fn, pl, hw = prep[-1]
            prep[-1] = (scene, cost_fn, pl.replace(far_propagation=False),
                        hw)
        depth, _, _ = run_pyramid(prep, jax.random.PRNGKey(0))  # warm
        t0 = time.perf_counter()
        depth, _, _ = run_pyramid(prep, jax.random.PRNGKey(1))
        dt = time.perf_counter() - t0
        err = np.abs(depth[interior] - gt[interior]) / gt[interior]
        print(json.dumps({
            "fine_iters": fine_iters, "fine_far": fine_far,
            "coarse_iters": coarse_iters,
            "wall_s": round(dt, 2),
            "mp_per_s": round(h * w / 1e6 / dt, 4),
            "median_rel_err": float(np.median(err)),
            "frac_within_1pct": float(np.mean(err < 0.01)),
        }), flush=True)


if __name__ == "__main__":
    main()
