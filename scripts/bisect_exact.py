"""Bisect the exact-engine accuracy anomaly (VERDICT r2 item 3).

PARITY.md shows the exact oracle engine LOSING to the rect fast path on
the middlebury preset (worse median/p99 depth error and much worse normal
error).  This script reruns the parity scene at medium scale with ablations
of the exact engine to isolate the cause:

    JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python scripts/bisect_exact.py
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import numpy as np


def run_case(tag, params, images, rig, subset, depth_min, depth_max, gt,
             n_w, rect=False, border=12):
    import jax
    from gipuma_tpu.models.patchmatch import finalize, run_patchmatch_host_loop
    from gipuma_tpu.models.rect_scene import build_rect_scene
    from gipuma_tpu.models.scene import build_scene
    from gipuma_tpu.ops.rect_cost import rect_multiview_cost

    key = jax.random.PRNGKey(params.seed)
    scene = build_scene(images, rig, subset, params, depth_min, depth_max)
    if rect:
        rs, _ = build_rect_scene(images, rig, subset, params,
                                 depth_min, depth_max)
        st = run_patchmatch_host_loop(rs, params, key,
                                      cost_fn=rect_multiview_cost)
        d, n, _ = finalize(st, rs.base)
    else:
        st = run_patchmatch_host_loop(scene, params, key)
        d, n, _ = finalize(st, scene)
    s = np.s_[border:-border, border:-border]
    dd = np.asarray(d)[s]
    g = np.asarray(gt)[s]
    rel = np.abs(dd - g) / g
    nn = np.asarray(n)[s]
    ang = np.degrees(np.arccos(np.clip(
        np.abs(nn @ np.asarray(n_w, np.float64)), 0, 1)))
    bad = rel > 3 * np.median(rel)
    row = {
        "case": tag,
        "med": float(np.median(rel)), "p99": float(np.quantile(rel, 0.99)),
        "n_med_deg": float(np.median(ang)),
        "n_p99_deg": float(np.quantile(ang, 0.99)),
        "bad_frac": float(bad.mean()),
    }
    print(json.dumps(row))
    return row, rel, ang


def main():
    import argparse
    import os
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=192)
    ap.add_argument("--w", type=int, default=256)
    ap.add_argument("--cases", default="all",
                    help="comma list: rect,exact,seed1,no_refine,inc1,"
                         "alpha05,box19 (default all)")
    args = ap.parse_args()
    import jax
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from gipuma_tpu.config import PRESETS
    from gipuma_tpu.geometry.camera import FAKE_BASELINE
    from gipuma_tpu.utils.synthetic import plane_scene

    h, w, num_cams = args.h, args.w, 4
    base = PRESETS["middlebury"]
    depth_mid = 0.5 * (base.depth_min + base.depth_max)
    images, rig, gt, (n_w, _) = plane_scene(
        num_cams=num_cams, h=h, w=w, focal=1.25 * w,
        plane_depth=depth_mid, slant=(0.2, -0.1), radius=depth_mid / 4.0)
    params = base.replace(seed=0, view_selection=False, pyramid_levels=1)
    params = params.with_depth_range(base.depth_min, base.depth_max,
                                     rig.f, FAKE_BASELINE)
    subset = list(range(1, num_cams))
    run_args = (images, rig, subset, base.depth_min, base.depth_max, gt,
                n_w)

    cases = args.cases.split(",") if args.cases != "all" else [
        "rect", "exact", "seed1", "no_refine", "inc1", "alpha05", "box19"]
    if "rect" in cases:
        run_case("rect_baseline", params, *run_args, rect=True)
    rel_e = None
    if "exact" in cases:
        _, rel_e, ang_e = run_case("exact_baseline", params, *run_args)
    if "seed1" in cases:
        run_case("exact_seed1", params.replace(seed=1), *run_args)
    if "no_refine" in cases:
        run_case("exact_no_refine", params.replace(refine=False), *run_args)
    if "inc1" in cases:
        run_case("exact_inc1", params.replace(window_increment=1), *run_args)
    if "alpha05" in cases:
        run_case("exact_alpha05", params.replace(alpha=0.5), *run_args)
    if "box19" in cases:
        run_case("exact_box19",
                 params.replace(box_hsize=19, box_vsize=19), *run_args)
    if "iter16" in cases:
        run_case("exact_iter16", params.replace(iterations=16), *run_args)
    if "rect_iter16" in cases:
        run_case("rect_iter16", params.replace(iterations=16), *run_args,
                 rect=True)

    # Spatial signature of the exact engine's bad pixels: fraction per
    # image quadrant.
    if rel_e is not None:
        bad = rel_e > 10 * np.median(rel_e)
        H, W = bad.shape
        print(json.dumps({
            "exact_bad_quadrants": [
                float(bad[:H // 2, :W // 2].mean()),
                float(bad[:H // 2, W // 2:].mean()),
                float(bad[H // 2:, :W // 2].mean()),
                float(bad[H // 2:, W // 2:].mean())],
            "exact_bad_frac": float(bad.mean()),
        }))


if __name__ == "__main__":
    sys.exit(main())
