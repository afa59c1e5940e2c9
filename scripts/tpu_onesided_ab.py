"""A/B the sdg_onesided_edges flag at the bench.py workload on the chip.

Ring-free window gradients cut the fused kernel's gather count
(ncol*nrow vs (ncol+2)*(nrow+2) = -44% at box 11 / increment 2); this
measures the realized end-to-end speedup and the quality cost on the
synthetic-GT plane scene.  Run the modes in separate invocations if the
second compile set evicts VMEM-adjacent state (it shouldn't):
    python scripts/tpu_onesided_ab.py ring
    python scripts/tpu_onesided_ab.py onesided
No argument runs both.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def run_mode(onesided: bool):
    import jax

    from gipuma_tpu.config import PRESETS
    from gipuma_tpu.geometry.camera import FAKE_BASELINE
    from gipuma_tpu.models.pyramid import prepare_pyramid, run_pyramid
    from gipuma_tpu.utils.synthetic import make_ring_P, plane_scene

    h, w, n_views = 480, 640, 7
    images, rig, gt, _ = plane_scene(num_cams=n_views, h=h, w=w, focal=800.0,
                                     plane_depth=5.0, slant=(0.2, -0.1))
    Ps = make_ring_P(n_views, h, w, 800.0, target_depth=5.0)
    names = [f"cam{i:03d}" for i in range(n_views)]
    params = PRESETS["middlebury"].replace(
        seed=0, cost_path="rect", pyramid_levels=3,
        pyramid_fine_iterations=1, sdg_onesided_edges=onesided)
    params = params.with_depth_range(3.0, 8.0, rig.f, FAKE_BASELINE)
    subset = list(range(1, n_views))

    prep = prepare_pyramid(images, Ps, names, subset, params, 3.0, 8.0)

    t0 = time.perf_counter()
    d = np.asarray(run_pyramid(prep, jax.random.PRNGKey(0))[0])
    print(f"[{'onesided' if onesided else 'ring'}] first run "
          f"(compile): {time.perf_counter()-t0:.1f}s", flush=True)

    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        d = run_pyramid(prep, jax.random.PRNGKey(i + 1))[0]
    np.asarray(d)
    dt = (time.perf_counter() - t0) / reps

    interior = np.s_[16:-16, 16:-16]
    err = np.abs(d[interior] - gt[interior]) / gt[interior]
    print(json.dumps({
        "mode": "onesided" if onesided else "ring",
        "wall_s": round(dt, 3),
        "mp_per_s": round(h * w / 1e6 / dt, 4),
        "median_rel_err": round(float(np.median(err)), 6),
        "frac_within_1pct": round(float(np.mean(err < 0.01)), 4),
    }), flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("ring", "both"):
        run_mode(False)
    if which in ("onesided", "both"):
        run_mode(True)


if __name__ == "__main__":
    main()
