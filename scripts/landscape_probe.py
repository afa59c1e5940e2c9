"""Cost-landscape probe for the exact-engine parity anomaly.

Instead of full engine runs, evaluate the multiview cost at the GROUND-
TRUTH plane and at normal/depth perturbations around it, at two scales.
If the exact engine's full-scale landscape is flat or non-monotonic where
the rect engine's is not, the anomaly is a cost-signal property (gradient
operators / sampling), not a search property (schedule/refinement).

    JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python -u scripts/landscape_probe.py
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import numpy as np


def probe(h, w):
    import jax
    import jax.numpy as jnp
    from gipuma_tpu.config import PRESETS
    from gipuma_tpu.geometry.camera import FAKE_BASELINE
    from gipuma_tpu.geometry import transforms as T
    from gipuma_tpu.models.rect_scene import build_rect_scene
    from gipuma_tpu.models.scene import build_scene
    from gipuma_tpu.ops import checkerboard as cb
    from gipuma_tpu.ops.cost import multiview_cost
    from gipuma_tpu.ops.rect_cost import rect_multiview_cost
    from gipuma_tpu.utils.synthetic import plane_scene

    base = PRESETS["middlebury"]
    depth_mid = 0.5 * (base.depth_min + base.depth_max)
    images, rig, gt, (n_w, d_w) = plane_scene(
        num_cams=4, h=h, w=w, focal=1.25 * w,
        plane_depth=depth_mid, slant=(0.2, -0.1), radius=depth_mid / 4.0)
    params = base.replace(seed=0, view_selection=False, pyramid_levels=1)
    params = params.with_depth_range(base.depth_min, base.depth_max,
                                     rig.f, FAKE_BASELINE)
    subset = [1, 2, 3]
    scene = build_scene(images, rig, subset, params,
                        base.depth_min, base.depth_max)
    rs, _ = build_rect_scene(images, rig, subset, params,
                             base.depth_min, base.depth_max)

    # GT normal in the ENGINE (reference-rebased camera) frame: finalize
    # maps engine normals to world via R_orig_inv, so the engine-frame GT
    # is R_orig @ n_world, hemisphere-flipped toward the camera.
    R_orig = np.linalg.inv(np.asarray(scene.R_orig_inv))
    n_cam = R_orig @ np.asarray(n_w, np.float64)
    n_cam /= np.linalg.norm(n_cam)
    vv = np.asarray(scene.view_vec)[scene.view_vec.shape[0] // 2,
                                    scene.view_vec.shape[1] // 2]
    if float(n_cam @ vv) > 0:
        n_cam = -n_cam
    n_w = n_cam
    parity = 0
    hh, ww = scene.rays.shape[:2]
    from gipuma_tpu.models.patchmatch import _active_coords
    x, y = _active_coords(scene, parity)
    interior = np.s_[20:-20, 10:-10]

    def field_for(n_vec):
        n = jnp.broadcast_to(jnp.asarray(n_vec, jnp.float32),
                             (hh, ww // 2, 3))
        gt_e = cb.extract(jnp.asarray(gt), parity)
        d = T.plane_d_at_pixel(scene.M_inv, scene.P_col4, n, x, y, gt_e)
        return n, d

    def cost_field(cost_fn, sc, n_vec):
        n, d = field_for(n_vec)
        return np.asarray(cost_fn(sc, params, parity, n, d))[interior]

    # Per-pixel normal discrimination: at each pixel the candidate plane
    # pivots around the pixel's own GT 3-D point (depth fixed, normal
    # tilted); a discriminative cost prefers the GT normal.  Report the
    # fraction of pixels where cost(GT) < cost(tilted) — the quantity the
    # engine's accept rule actually uses (means are confounded by
    # rendering-noise floors that vary with slant).
    out = {"shape": [h, w]}
    for tag, fn, sc in (("exact", multiview_cost, scene),
                        ("rect", rect_multiview_cost, rs)):
        c_gt = cost_field(fn, sc, n_w)
        res = {}
        for dslant in (0.15, 0.075, 0.0375):
            for sgn in (1, -1):
                nv = np.array([n_w[0] + sgn * dslant, n_w[1], n_w[2]])
                nv = nv / np.linalg.norm(nv)
                c_p = cost_field(fn, sc, nv)
                res[f"{sgn*dslant:+.4f}"] = round(
                    float(np.mean(c_gt < c_p)), 4)
        out[tag] = res
    print(json.dumps(out), flush=True)
    return out


def main():
    import jax
    import os
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    probe(192, 256)
    probe(480, 640)
    return 0


if __name__ == "__main__":
    sys.exit(main())
