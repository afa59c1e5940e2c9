"""TPU timing + quality of the coarse-to-fine rect path at dino scale.
Run twice (warm compile cache) — the steady run is the second job."""
from __future__ import annotations

import json
import time

import jax
import numpy as np

from gipuma_tpu.config import PRESETS
from gipuma_tpu.geometry.camera import FAKE_BASELINE
from gipuma_tpu.models.pyramid import run_patchmatch_pyramid
from gipuma_tpu.utils.synthetic import make_ring_P, plane_scene


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

    for run in range(2):
        t0 = time.perf_counter()
        depth, normals, cost = run_patchmatch_pyramid(
            images, Ps, names, subset, params, 3.0, 8.0,
            jax.random.PRNGKey(run))
        dt = time.perf_counter() - t0
        interior = np.s_[16:-16, 16:-16]
        err = np.abs(depth[interior] - gt[interior]) / gt[interior]
        print(json.dumps({
            "run": run, "wall_s": round(dt, 2),
            "mp_per_s": round(h * w / 1e6 / dt, 4),
            "median_rel_err": float(np.median(err)),
            "frac_within_1pct": float(np.mean(err < 0.01)),
        }), flush=True)


if __name__ == "__main__":
    main()
