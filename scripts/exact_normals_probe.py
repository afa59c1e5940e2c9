"""Root-cause probe for the exact engine's full-scale normal error
(VERDICT r4 item 6: 11.4 deg median on a smooth plane at 480x640).

Round-3/4 evidence says the exact engine settles into depth-compensated
TILTED-plane local minima of the full-scale landscape (PARITY.md).  This
probe makes that mechanism FALSIFIABLE and tests the implied fix:

1. **Per-sweep acceptance instrumentation** (exact vs rect, identical
   scene/seeds): fraction of active pixels whose cost improves in each
   close/far/refine sub-sweep per iteration, plus the normal-error
   trajectory.  Prediction under the minima hypothesis: exact acceptance
   collapses early (converged — to the wrong basin) rather than staying
   noisy (under-convergence), and 'no refinement coverage gap' appears
   (refinement keeps accepting tiny cost wins that do not rotate
   normals).
2. **Pivot test**: for pixels with normal error > 8 deg, the accepted
   plane should pass near the GT surface AT THE PIXEL (tilt pivoted at
   the point => per-pixel depth error stays in the global class while
   the normal is off).  Prediction: median depth error of high-normal-
   error pixels ~= global median (not >> it).
3. **The fix the mechanism implies**: coarse-to-fine warm start.  At
   192x256 the same world texture has ~2.5x higher per-pixel frequency
   and the ambiguity is absent (PARITY.md), so a pyramid that converges
   coarse first should steer the fine level into the GT basin.
   Prediction: exact + pyramid_levels=3 at 480x640 yields normals < 6
   deg (the VERDICT 'fixed' bar).

Usage (TPU, serialize with other TPU jobs; ~20 min):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/exact_normals_probe.py
CPU smoke:  ... --scale medium --iters 4
Writes EXACT_NORMALS_PROBE.json.
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", choices=("medium", "full"), default="full")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--out", default=str(ROOT / "EXACT_NORMALS_PROBE.json"))
    args = ap.parse_args()

    import jax

    from gipuma_tpu.config import PRESETS
    from gipuma_tpu.geometry.camera import FAKE_BASELINE
    from gipuma_tpu.models.patchmatch import (finalize, init_state,
                                              iteration)
    from gipuma_tpu.ops.cost import multiview_cost
    from gipuma_tpu.models.pyramid import run_patchmatch_pyramid
    from gipuma_tpu.models.rect_scene import build_rect_scene
    from gipuma_tpu.models.scene import build_scene
    from gipuma_tpu.ops.rect_cost import rect_multiview_cost
    from gipuma_tpu.utils.synthetic import make_ring_P, plane_scene

    h, w = (480, 640) if args.scale == "full" else (192, 256)
    base = PRESETS["middlebury"]
    depth_mid = 0.5 * (base.depth_min + base.depth_max)
    num_cams = 4
    images, rig, gt, (n_w, _) = plane_scene(
        num_cams=num_cams, h=h, w=w, focal=1.25 * w, plane_depth=depth_mid,
        slant=(0.2, -0.1), radius=depth_mid / 4.0, texture="noise")
    params = base.replace(seed=0, view_selection=False,
                          iterations=args.iters, pyramid_levels=1)
    params = params.with_depth_range(base.depth_min, base.depth_max,
                                     rig.f, FAKE_BASELINE)
    subset = list(range(1, num_cams))
    border = 12
    s = np.s_[border:-border, border:-border]
    g = np.asarray(gt)[s]

    def n_err_deg(n):
        nn = np.asarray(n)[s]
        return np.degrees(np.arccos(np.clip(
            np.abs(nn @ np.asarray(n_w, np.float64)), 0, 1)))

    # ---- 1. per-sweep acceptance instrumentation ----------------------
    def instrumented_run(scene, cost_fn, tag):
        key = jax.random.PRNGKey(params.seed)
        state = init_state(scene, params, key, cost_fn=cost_fn)
        track = []
        for it in range(params.iterations):
            c_before = np.asarray(state.cost)
            state = iteration(state, scene, params, cost_fn=cost_fn)
            c_after = np.asarray(state.cost)
            acc = float(np.mean(c_after < c_before - 1e-7))
            base_s = scene.base if hasattr(scene, "base") else scene
            d_i, n_i, _ = finalize(state, base_s)
            ang = n_err_deg(n_i)
            dd = np.asarray(d_i)[s]
            rel = np.abs(dd - g) / g
            track.append({"iter": it, "accept_frac": acc,
                          "n_med_deg": float(np.median(ang)),
                          "depth_med": float(np.median(rel))})
            print(json.dumps({"tag": tag, **track[-1]}), flush=True)
        d_f, n_f, _ = finalize(state, scene.base
                               if hasattr(scene, "base") else scene)
        return track, np.asarray(d_f), np.asarray(n_f)

    exact_scene = build_scene(images, rig, subset, params,
                              base.depth_min, base.depth_max)
    tr_e, d_e, n_e = instrumented_run(exact_scene, multiview_cost, "exact")
    rect_scene, _ = build_rect_scene(images, rig, subset, params,
                                     base.depth_min, base.depth_max)
    tr_r, d_r, n_r = instrumented_run(rect_scene, rect_multiview_cost,
                                      "rect")

    # ---- 2. pivot test on the exact result ----------------------------
    ang_e = n_err_deg(n_e)
    rel_e = np.abs(d_e[s] - g) / g
    hi = ang_e > 8.0
    pivot = {
        "high_n_frac": float(hi.mean()),
        "depth_med_global": float(np.median(rel_e)),
        "depth_med_at_high_n": (float(np.median(rel_e[hi]))
                                if hi.any() else None),
        # Pivoted-tilt prediction: ratio ~ O(1), NOT >> 1.
        "pivot_ratio": (float(np.median(rel_e[hi])
                              / max(np.median(rel_e), 1e-9))
                        if hi.any() else None),
    }
    print(json.dumps({"pivot_test": pivot}), flush=True)

    # ---- 3. the implied fix: exact + coarse-to-fine -------------------
    Ps = make_ring_P(num_cams, h, w, 1.25 * w, target_depth=depth_mid,
                     radius=depth_mid / 4.0)
    names = [f"cam{i:03d}" for i in range(num_cams)]
    p_pyr = params.replace(cost_path="exact", pyramid_levels=3,
                           pyramid_fine_iterations=2)
    d_p, n_p, _ = run_patchmatch_pyramid(
        images, Ps, names, subset, p_pyr, base.depth_min, base.depth_max,
        jax.random.PRNGKey(0))
    ang_p = n_err_deg(n_p)
    rel_p = np.abs(np.asarray(d_p)[s] - g) / g
    fix = {"exact_pyramid_n_med_deg": float(np.median(ang_p)),
           "exact_pyramid_depth_med": float(np.median(rel_p)),
           "fixed_bar_6deg": bool(np.median(ang_p) < 6.0)}
    print(json.dumps({"pyramid_fix": fix}), flush=True)

    out = {
        "scale": [h, w], "iterations": params.iterations,
        "exact_track": tr_e, "rect_track": tr_r,
        "pivot_test": pivot, "pyramid_fix": fix,
        "exact_flat_n_med_deg": float(np.median(ang_e)),
        "rect_flat_n_med_deg": float(np.median(n_err_deg(n_r))),
    }
    Path(args.out).write_text(json.dumps(out, indent=2))
    print("wrote", args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
