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
    # DTU-like geometry (mm): plane at 600, range [400, 1000], camera ring
    # radius 150 -> ~14 deg triangulation angles (inside the dtu_fast
    # 10-30 deg selection window; DTU's actual rig class).
    images, rig, gt, _ = plane_scene(num_cams=n_views, h=h, w=w, focal=focal,
                                     plane_depth=600.0, slant=(0.2, -0.1),
                                     radius=150.0)
    Ps = make_ring_P(n_views, h, w, focal, target_depth=600.0, radius=150.0)
    names = [f"cam{i:03d}" for i in range(n_views)]
    dmin, dmax = 400.0, 1000.0

    params = PRESETS["dtu_fast"].replace(
        seed=0, cost_path="rect", pyramid_levels=3,
        pyramid_fine_iterations=2)
    params = params.with_depth_range(dmin, dmax, rig.f, FAKE_BASELINE)
    # Angle-window view selection, as scripts/dtu_fast.sh runs the
    # reference (-view_selection, angles 10-30 deg): wide-angle pairs are
    # low-value for the cost AND may be unrectifiable.
    from gipuma_tpu.select import select_views
    subset, _, _ = select_views(rig, w, h, params)
    if not subset:
        subset = list(range(1, n_views))
    print(f"selected views: {subset}", flush=True)

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
