"""Profile host-side rect prep at the full DTU scale (1600x1200, real rig).

VERDICT r3 item 4: DTU_REAL_RIG.json recorded prep_s 85.1 per view vs
run_s 71.2 — prep must get under run_s.  This script isolates the numpy
table build (no TPU needed).

    JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python scripts/prof_prep_dtu.py
"""
from __future__ import annotations

import cProfile
import glob
import os
import pstats
import sys
import time

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

CALIB_DIR = "/root/reference/data/dtu/calib"
PATTERN = "rect_0??_3_r5000.png.P"


def main() -> int:
    from gipuma_tpu.config import PRESETS
    from gipuma_tpu.geometry.camera import FAKE_BASELINE, build_rig
    from gipuma_tpu.io.calib import read_P_file
    from gipuma_tpu.models.rect_scene import build_rect_scene
    from gipuma_tpu.models.scene import build_scene
    from gipuma_tpu.select import select_views
    from gipuma_tpu.utils.synthetic import plane_scene_for_rig

    files = sorted(glob.glob(os.path.join(CALIB_DIR, PATTERN)))
    Ps_all = [read_P_file(f) for f in files]
    h, w = 1200, 1600
    ref = 0
    order = [ref] + [i for i in range(len(Ps_all)) if i != ref]
    Ps = [Ps_all[i] for i in order]
    names = [os.path.basename(files[i]) for i in order]
    rig = build_rig(Ps, names)
    params0 = PRESETS["dtu_fast"].replace(cost_path="rect")
    subset, dmin, dmax = select_views(rig, w, h, params0)
    params = params0.with_depth_range(dmin, dmax, rig.f, FAKE_BASELINE)
    images, gt_depth, _ = plane_scene_for_rig(
        Ps, h, w, 550.0, slant=(0.15, -0.1))

    t0 = time.perf_counter()
    base = build_scene(images, rig, subset, params, dmin, dmax, lite=True)
    t1 = time.perf_counter()
    print(f"build_scene: {t1 - t0:.2f}s", flush=True)

    pr = cProfile.Profile()
    pr.enable()
    scene, info = build_rect_scene(images, rig, subset, params,
                                   dmin, dmax, base=base)
    pr.disable()
    t2 = time.perf_counter()
    print(f"build_rect_scene: {t2 - t1:.2f}s", flush=True)
    st = pstats.Stats(pr)
    st.sort_stats("cumulative").print_stats(30)
    return 0


if __name__ == "__main__":
    sys.exit(main())
