"""Scaling-efficiency harness (VERDICT r1 #7): throughput of the `job`
axis (data-parallel depth-map jobs — the pod-scale scan distribution) at
1/2/4/... devices, reported as {n, mp_per_s, efficiency}.

On CPU it uses the virtual-device mesh (XLA_FLAGS=
--xla_force_host_platform_device_count=8) to validate the harness; on
real multi-chip hardware the same command measures true ICI/DCN scaling —
the >=80%-at-4-hosts BASELINE claim becomes one invocation when a pod is
available.  Prints one JSON line per device count plus a summary line.

Usage:
  CPU mesh:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
                 python bench_scaling.py --counts 1,2,4,8
  TPU:       PYTHONPATH=/root/repo:/root/.axon_site python bench_scaling.py
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--counts", default=None,
                    help="comma-separated device counts (default: 1,2,..,N)")
    ap.add_argument("--h", type=int, default=120)
    ap.add_argument("--w", type=int, default=160)
    ap.add_argument("--iterations", type=int, default=2)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="BENCH_SCALING.json")
    args = ap.parse_args()

    # The container's sitecustomize pins JAX_PLATFORMS=axon and OVERRIDES
    # the env var (CLAUDE.md): an explicit config update before any jax
    # call is the only reliable CPU opt-in.  Default to CPU whenever the
    # caller exported JAX_PLATFORMS=cpu; plain invocations use the TPU.
    import os
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    from jax.sharding import Mesh
    from gipuma_tpu.config import AlgorithmParams
    from gipuma_tpu.geometry.camera import FAKE_BASELINE
    from gipuma_tpu.models.scene import build_scene
    from gipuma_tpu.parallel.sharded import (run_patchmatch_batch_sharded,
                                             stack_scenes)
    from gipuma_tpu.utils.synthetic import plane_scene

    n_dev = len(jax.devices())
    counts = ([int(c) for c in args.counts.split(",")] if args.counts
              else [c for c in (1, 2, 4, 8, 16, 32) if c <= n_dev])

    h, w = args.h, args.w
    images, rig, _, _ = plane_scene(num_cams=4, h=h, w=w, focal=140.0,
                                    plane_depth=5.0, slant=(0.2, -0.1))
    params = AlgorithmParams(
        box_hsize=9, box_vsize=9, iterations=args.iterations,
    ).with_depth_range(3.0, 8.0, rig.f, FAKE_BASELINE)
    scene = build_scene(images, rig, [1, 2, 3], params, 3.0, 8.0)

    results = []
    base_tput = None
    for n in counts:
        if n > n_dev:
            break
        # Pure job-axis scaling: n independent depth-map jobs, one per
        # device (view axis unsharded — its scaling is a fixed-cost
        # all-gather measured separately in MULTICHIP runs).
        mesh = Mesh(np.asarray(jax.devices()[:n]).reshape(n, 1),
                    axis_names=("job", "view"))
        scenes = stack_scenes([scene] * n)
        keys = jax.random.split(jax.random.PRNGKey(0), n)
        out = run_patchmatch_batch_sharded(scenes, params, keys, mesh)
        jax.block_until_ready(out.cost)          # compile + warm
        t0 = time.perf_counter()
        for r in range(args.reps):
            keys = jax.random.split(jax.random.PRNGKey(r + 1), n)
            out = run_patchmatch_batch_sharded(scenes, params, keys, mesh)
        np.asarray(out.cost)                     # force a real fetch
        dt = (time.perf_counter() - t0) / args.reps
        tput = n * h * w / 1e6 / dt              # jobs are whole depth maps
        if base_tput is None:
            base_tput = tput
        eff = tput / (base_tput * n)
        rec = {"n": n, "mp_per_s": round(tput, 4),
               "per_device": round(tput / n, 4), "efficiency": round(eff, 4)}
        print(json.dumps(rec), flush=True)
        results.append(rec)

    summary = {"metric": "job-axis scaling efficiency",
               "backend": jax.default_backend(),
               "shape": [h, w], "results": results}
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    if len(results) > 1:
        print(json.dumps({"metric": "scaling-efficiency",
                          "value": results[-1]["efficiency"],
                          "unit": f"x{results[-1]['n']}-devices",
                          "vs_baseline": results[-1]["efficiency"] / 0.8}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
