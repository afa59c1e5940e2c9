"""jax.profiler trace of one fine-level close sweep: which device ops eat
the ~290 ms."""
from __future__ import annotations

import glob
import gzip
import json
import time
from collections import defaultdict

import jax
import numpy as np

from gipuma_tpu.config import PRESETS
from gipuma_tpu.geometry.camera import FAKE_BASELINE
from gipuma_tpu.models.patchmatch import _host_loop_jits
from gipuma_tpu.models.pyramid import prepare_pyramid
from gipuma_tpu.utils.synthetic import make_ring_P, plane_scene


def main():
    print("devices:", jax.devices(), flush=True)
    h, w, n_views = 480, 640, 7
    images, rig, gt, _ = plane_scene(num_cams=n_views, h=h, w=w, focal=800.0,
                                     plane_depth=5.0, slant=(0.2, -0.1))
    Ps = make_ring_P(n_views, h, w, 800.0, target_depth=5.0)
    names = [f"cam{i:03d}" for i in range(n_views)]
    params = PRESETS["middlebury"].replace(
        seed=0, cost_path="rect", pyramid_levels=1)
    params = params.with_depth_range(3.0, 8.0, rig.f, FAKE_BASELINE)
    prep = prepare_pyramid(images, Ps, names, list(range(1, n_views)),
                           params, 3.0, 8.0)
    scene, cost_fn, params_l, shp = prep[0]
    jinit, jclose, jfar, jrefine = _host_loop_jits(cost_fn)
    key = jax.random.PRNGKey(0)
    state = jinit(scene, params_l, key)
    state = jclose(state, scene, params=params_l, parity=0)
    np.asarray(state.cost)

    out_dir = "/tmp/sweep_trace"
    jax.profiler.start_trace(out_dir)
    for _ in range(3):
        state = jclose(state, scene, params=params_l, parity=0)
    np.asarray(state.cost)
    jax.profiler.stop_trace()

    paths = glob.glob(out_dir + "/**/*.trace.json.gz", recursive=True)
    print("traces:", paths, flush=True)
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
    print(f"total device time: {total/1e3/3:.1f} ms per sweep", flush=True)
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{dur/1e3/3:9.2f} ms  x{cnt[name]:4d}  {name[:90]}")


if __name__ == "__main__":
    main()
