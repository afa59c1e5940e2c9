"""Device-busy vs wall-clock breakdown of one full bench pyramid run.

The sweep-level traces (tpu_trace_fused.py) show ~62 ms of device time per
fine sweep, yet bench.py measures ~1.35 s per run — if device busy is well
under wall, the next lever is dispatch/host overhead, not the kernel.

Prints: wall per run, device busy (interval union over the TPU pid),
number of top-level device executions, and the largest gaps.
"""
from __future__ import annotations

import glob
import gzip
import json
import shutil
import time

import jax
import numpy as np

from gipuma_tpu.config import PRESETS
from gipuma_tpu.geometry.camera import FAKE_BASELINE
from gipuma_tpu.models.pyramid import prepare_pyramid, run_pyramid
from gipuma_tpu.utils.synthetic import make_ring_P, plane_scene


def main():
    import sys
    print("devices:", jax.devices(), flush=True)
    h, w, n_views = 480, 640, 7
    images, rig, gt, _ = plane_scene(num_cams=n_views, h=h, w=w, focal=800.0,
                                     plane_depth=5.0, slant=(0.2, -0.1))
    Ps = make_ring_P(n_views, h, w, 800.0, target_depth=5.0)
    names = [f"cam{i:03d}" for i in range(n_views)]
    # Match bench.py's production configuration exactly (incl. the round-2
    # fine-level trims + round-3 coarse box) so the split explains the
    # bench number; --two_stage mirrors bench.py's flag.
    params = PRESETS["middlebury"].replace(
        seed=0, cost_path="rect", pyramid_levels=3,
        pyramid_fine_iterations=1, pyramid_fine_far=False,
        pyramid_fine_refine_rounds=2, pyramid_carry_cost=True,
        pyramid_coarse_box=7,
        rect_two_stage_cull="--two_stage" in sys.argv,
        cull_view_stride=2 if "--two_stage" in sys.argv else 1)
    params = params.with_depth_range(3.0, 8.0, rig.f, FAKE_BASELINE)
    prep = prepare_pyramid(images, Ps, names, list(range(1, n_views)),
                           params, 3.0, 8.0)

    def job(k):
        return run_pyramid(prep, k)[0]

    np.asarray(job(jax.random.PRNGKey(0)))  # warmup/compile

    out_dir = "/tmp/run_breakdown_trace"
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.perf_counter()
    d = job(jax.random.PRNGKey(1))
    np.asarray(d)
    wall_untraced = time.perf_counter() - t0

    jax.profiler.start_trace(out_dir)
    t0 = time.perf_counter()
    d = job(jax.random.PRNGKey(2))
    np.asarray(d)
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()

    paths = glob.glob(out_dir + "/**/*.trace.json.gz", recursive=True)
    spans = []
    names_at = []
    for p in paths:
        tr = json.load(gzip.open(p))
        pid_dev = {e["pid"] for e in tr["traceEvents"]
                   if e.get("ph") == "M" and e.get("name") == "process_name"
                   and "/device:TPU" in str(e.get("args", {}).get("name", ""))
                   and "pid" in e}
        for e in tr["traceEvents"]:
            if e.get("ph") == "X" and e.get("pid") in pid_dev:
                spans.append((e["ts"], e["ts"] + e.get("dur", 0)))
                names_at.append((e["ts"], e.get("dur", 0),
                                 e.get("name", "?")))
    spans.sort()
    busy = 0.0
    lo = hi = None
    merged = []
    for s, t in spans:
        if lo is None:
            lo, hi = s, t
        elif s <= hi:
            hi = max(hi, t)
        else:
            merged.append((lo, hi))
            lo, hi = s, t
    if lo is not None:
        merged.append((lo, hi))
    busy = sum(t - s for s, t in merged)
    span_total = merged[-1][1] - merged[0][0] if merged else 0.0
    print(f"wall per run (untraced): {wall_untraced*1e3:.1f} ms")
    print(f"wall per run (traced):   {wall*1e3:.1f} ms")
    print(f"device busy:             {busy/1e3:.1f} ms "
          f"({busy/1e3/(wall*1e3)*100:.0f}% of traced wall)")
    print(f"device active span:      {span_total/1e3:.1f} ms, "
          f"intervals: {len(merged)}")
    gaps = sorted(((merged[i + 1][0] - merged[i][1], merged[i][1])
                   for i in range(len(merged) - 1)), reverse=True)[:12]
    for g, at in gaps:
        # what ran right before the gap
        before = [n for ts, dur, n in names_at if abs(ts + dur - at) < 50]
        print(f"  gap {g/1e3:8.2f} ms after {before[:2]}")

    # Top device ops by total duration (aggregate over repeats).
    agg: dict = {}
    for _, dur, n in names_at:
        a = agg.setdefault(n, [0.0, 0])
        a[0] += dur
        a[1] += 1
    top = sorted(agg.items(), key=lambda kv: -kv[1][0])[:24]
    print("top device ops (total ms / calls):")
    for n, (tot, cnt) in top:
        print(f"  {tot/1e3:9.2f} ms {cnt:5d}x  {n[:100]}")


if __name__ == "__main__":
    main()
