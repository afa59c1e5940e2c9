"""DTU-scale throughput measurement on the real chip.

Synthetic 1600x1200 scene, 9 source views, dtu_fast preset (box 15,
6 iterations) on the production pyramid+rect configuration — the second
BASELINE.json workload class.  Prints steady-state MP/s and quality.
"""
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
    h, w, n_views = 1200, 1600, 10
    focal = 2200.0
    # DTU-like depth scale (mm): plane at 600, range [400, 1000].
    images, rig, gt, _ = plane_scene(num_cams=n_views, h=h, w=w, focal=focal,
                                     plane_depth=600.0, slant=(0.2, -0.1))
    Ps = make_ring_P(n_views, h, w, focal, target_depth=600.0)
    names = [f"cam{i:03d}" for i in range(n_views)]
    subset = list(range(1, n_views))
    dmin, dmax = 400.0, 1000.0

    params = PRESETS["dtu_fast"].replace(
        seed=0, cost_path="rect", pyramid_levels=3,
        pyramid_fine_iterations=2)
    params = params.with_depth_range(dmin, dmax, rig.f, FAKE_BASELINE)

    t0 = time.perf_counter()
    prep = prepare_pyramid(images, Ps, names, subset, params, dmin, dmax)
    print(f"prepare: {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    depth, _, _ = run_pyramid(prep, jax.random.PRNGKey(0))
    print(f"first run (compile): {time.perf_counter()-t0:.1f}s", flush=True)

    reps = 2
    t0 = time.perf_counter()
    for i in range(reps):
        depth, _, _ = run_pyramid(prep, jax.random.PRNGKey(i + 1))
    dt = (time.perf_counter() - t0) / reps
    interior = np.s_[32:-32, 32:-32]
    err = np.abs(depth[interior] - gt[interior]) / gt[interior]
    print(json.dumps({
        "workload": "dtu_fast-scale 1600x1200x9",
        "wall_s": round(dt, 2),
        "mp_per_s": round(h * w / 1e6 / dt, 4),
        "median_rel_err": round(float(np.median(err)), 6),
        "frac_within_1pct": round(float(np.mean(err < 0.01)), 4),
    }), flush=True)


if __name__ == "__main__":
    main()
