"""Benchmark: megapixel-depthmaps per second on one chip.

Workload: dinoSparseRing-scale synthetic scene (640x480, 6 source views,
box 11, 8 iterations — the Middlebury preset of scripts/dino.sh:8-24,
BASELINE.json config 1) run end-to-end (init + all iterations + finalize)
on the rectified row-aligned fast cost path (ops/rect_cost.py), the
production TPU path; falls back to the exact path if rectification is
unsupported for the rig.

Baseline: the reference publishes no in-tree numbers (BASELINE.md); the
ICCV'15 paper-era figure is ~2.7 s for a 0.3 MP view on a consumer GPU
=> ~0.114 MP-depthmaps/s, which `vs_baseline` is computed against.

Prints exactly one JSON line.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_MP_PER_S = 0.3072 / 2.7   # 640x480 / 2.7 s (paper-era reference GPU)


def main() -> int:
    import jax

    from gipuma_tpu.config import PRESETS
    from gipuma_tpu.geometry.camera import FAKE_BASELINE
    from gipuma_tpu.models.patchmatch import (finalize,
                                              run_patchmatch_host_loop)
    from gipuma_tpu.models.scene import build_scene
    from gipuma_tpu.utils.synthetic import plane_scene

    h, w, n_views = 480, 640, 7
    images, rig, gt, _ = plane_scene(num_cams=n_views, h=h, w=w, focal=800.0,
                                     plane_depth=5.0, slant=(0.2, -0.1))
    depth_min, depth_max = 3.0, 8.0
    params = PRESETS["middlebury"].replace(seed=0, cost_path="rect")
    params = params.with_depth_range(depth_min, depth_max, rig.f, FAKE_BASELINE)
    scene = build_scene(images, rig, list(range(1, n_views)), params,
                        depth_min, depth_max)

    from gipuma_tpu.ops.cost import multiview_cost
    cost_fn = multiview_cost
    try:
        from gipuma_tpu.models.rect_scene import (RectifyUnsupported,
                                                  build_rect_scene)
        from gipuma_tpu.ops.rect_cost import rect_multiview_cost
        scene, _ = build_rect_scene(images, rig, list(range(1, n_views)),
                                    params, depth_min, depth_max, base=scene)
        cost_fn = rect_multiview_cost
    except Exception as e:   # rect unsupported -> exact path
        print(f"# rect path unavailable ({e}); exact path", file=sys.stderr)
        params = params.replace(cost_path="exact")

    jfin = jax.jit(finalize)

    # Host loop over sub-sweep jits: mirrors the reference's six kernel
    # launches per iteration (gipuma.cu:1911-1941) and stays within the TPU
    # runtime's executable-size limits (CLAUDE.md).  Scene passed as an
    # argument (closures bake the image tables into the program as constants
    # and overflow the compile-request size at DTU resolutions).
    def job(k):
        st = run_patchmatch_host_loop(scene, params, k, cost_fn=cost_fn)
        return jfin(st, scene)[0]

    # Warmup / compile.  np.asarray forces a real device fetch (timings
    # through the remote TPU relay lie otherwise, CLAUDE.md).
    d = np.asarray(job(jax.random.PRNGKey(0)))
    assert np.isfinite(d).all()
    interior = np.s_[16:-16, 16:-16]
    err = np.abs(d[interior] - gt[interior]) / gt[interior]
    assert np.median(err) < 0.02, f"median rel err {np.median(err):.4f}"

    reps = 2
    t0 = time.perf_counter()
    for i in range(reps):
        d = job(jax.random.PRNGKey(i + 1))
    np.asarray(d)
    dt = (time.perf_counter() - t0) / reps

    mp_per_s = (h * w) / 1e6 / dt
    print(json.dumps({
        "metric": "megapixel-depthmaps/s/chip",
        "value": round(mp_per_s, 5),
        "unit": "MP/s",
        "vs_baseline": round(mp_per_s / BASELINE_MP_PER_S, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
