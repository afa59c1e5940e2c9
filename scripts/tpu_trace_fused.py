"""Fused-path-only jax.profiler trace of the fine-level sweeps.

Re-split of device time after the extent-skip + one-sided-edge changes
(ROADMAP session 3): prints per-op device aggregation for the close and
refine sweeps with the fused window-cost kernel enabled.
"""
from __future__ import annotations

import jax

from gipuma_tpu.config import PRESETS
from gipuma_tpu.geometry.camera import FAKE_BASELINE
from gipuma_tpu.models.patchmatch import _host_loop_jits
from gipuma_tpu.models.pyramid import prepare_pyramid
from gipuma_tpu.utils.synthetic import make_ring_P, plane_scene
from tpu_trace_sweep import trace_op


def main():
    print("devices:", jax.devices(), flush=True)
    h, w, n_views = 480, 640, 7
    images, rig, gt, _ = plane_scene(num_cams=n_views, h=h, w=w, focal=800.0,
                                     plane_depth=5.0, slant=(0.2, -0.1))
    Ps = make_ring_P(n_views, h, w, 800.0, target_depth=5.0)
    names = [f"cam{i:03d}" for i in range(n_views)]
    base = PRESETS["middlebury"].replace(
        seed=0, cost_path="rect", pyramid_levels=1)
    base = base.with_depth_range(3.0, 8.0, rig.f, FAKE_BASELINE)
    prep = prepare_pyramid(images, Ps, names, list(range(1, n_views)),
                           base, 3.0, 8.0)
    scene, cost_fn, params_l, shp = prep[0]
    jinit, jclose, jfar, jrefine = _host_loop_jits(cost_fn)
    key = jax.random.PRNGKey(0)

    p = params_l.replace(fused_window_cost=True)
    state = jinit(scene, p, key)
    state = trace_op("close_fused", jclose, state, scene, p)
    trace_op("refine_fused", jrefine, state, scene, p)


if __name__ == "__main__":
    main()
