"""jax.profiler trace of fine-level sweeps: which device ops eat the time.

Traces the close and refine sweeps with the fused window-cost kernel on and
off, printing the per-op device-time aggregation for each configuration.
"""
from __future__ import annotations

import glob
import gzip
import json
import shutil
from collections import defaultdict

import jax
import numpy as np

from gipuma_tpu.config import PRESETS
from gipuma_tpu.geometry.camera import FAKE_BASELINE
from gipuma_tpu.models.patchmatch import _host_loop_jits
from gipuma_tpu.models.pyramid import prepare_pyramid
from gipuma_tpu.utils.synthetic import make_ring_P, plane_scene


def trace_op(tag, fn, state, scene, params_l, parity=0, reps=3):
    out_dir = f"/tmp/sweep_trace_{tag}"
    shutil.rmtree(out_dir, ignore_errors=True)
    state = fn(state, scene, params=params_l, parity=parity)
    np.asarray(state.cost)
    jax.profiler.start_trace(out_dir)
    for _ in range(reps):
        state = fn(state, scene, params=params_l, parity=parity)
    np.asarray(state.cost)
    jax.profiler.stop_trace()

    paths = glob.glob(out_dir + "/**/*.trace.json.gz", recursive=True)
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for p in paths:
        tr = json.load(gzip.open(p))
        pid_dev = {e["pid"] for e in tr["traceEvents"]
                   if e.get("ph") == "M" and e.get("name") == "process_name"
                   and "TPU" in str(e.get("args", {}).get("name", ""))
                   and "pid" in e}
        for e in tr["traceEvents"]:
            if e.get("ph") == "X" and e.get("pid") in pid_dev:
                name = e.get("name", "?")
                agg[name] += e.get("dur", 0)
                cnt[name] += 1
                total += e.get("dur", 0)
    print(f"== {tag}: total device {total/1e3/reps:.1f} ms per sweep",
          flush=True)
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:14]:
        print(f"{dur/1e3/reps:9.2f} ms  x{cnt[name]//reps:4d}  {name[:80]}")
    return state


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

    for fused in (False, True):
        p = params_l.replace(fused_window_cost=fused)
        state = jinit(scene, p, key)
        tag = "fused" if fused else "unfused"
        state = trace_op(f"close_{tag}", jclose, state, scene, p)
        trace_op(f"refine_{tag}", jrefine, state, scene, p)


if __name__ == "__main__":
    main()
