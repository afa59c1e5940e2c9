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

import argparse
import json
import sys
import time

import numpy as np

BASELINE_MP_PER_S = 0.3072 / 2.7   # 640x480 / 2.7 s (paper-era reference GPU)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dispatch", choices=("host", "scan"), default=None,
                    help="override level_dispatch for A/B runs")
    ap.add_argument("--schedule", choices=("pyramid", "reference"),
                    default="pyramid",
                    help="reference = no pyramid, all 8 iterations at full "
                         "resolution (the reference's own schedule, "
                         "gipuma.cu:1911-1941)")
    # reps=4: at ~0.2 s/run the 2-rep measurement carried ±10% queue/relay
    # noise (measured 1.40/1.58/1.69 across 2-2-4-rep runs of one config).
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--no_footprint_skip", action="store_true",
                    help="A/B: disable the rect footprint tile skip "
                         "(config.rect_footprint_skip)")
    ap.add_argument("--coarse_box", type=int, default=None,
                    help="A/B: config.pyramid_coarse_box override")
    ap.add_argument("--no_two_stage", action="store_true",
                    help="A/B: disable config.rect_two_stage_cull (sparse-"
                         "window candidate screening, full window only for "
                         "the per-pixel winner).  Measured on v5e: 0.995 "
                         "-> 1.243 MP/s (+25%%) at the same 5e-3 gate — "
                         "adopted as the bench default (VERDICT r3 item 3)")
    ap.add_argument("--cull_view_stride", type=int, default=None,
                    help="A/B: config.cull_view_stride — screen candidates "
                         "on every Nth view only (ranking needs less view "
                         "support than the accepted cost)")
    ap.add_argument("--cull_box", type=int, default=None,
                    help="A/B: config.cull_box (sparse screening window "
                         "size; default 9 -> 3x3 samples at increment 4)")
    ap.add_argument("--cull_increment", type=int, default=None,
                    help="A/B: config.cull_increment (sparse screening "
                         "sample spacing)")
    ap.add_argument("--no_cull_pack", action="store_true",
                    help="A/B: disable config.cull_pack (f16 packing of "
                         "the sparse cull pass's permuted planes/costs)")
    ap.add_argument("--early_term", action="store_true",
                    help="A/B: config.cull_early_term (skip the full-"
                         "window pass where no candidate beats the "
                         "current plane in the sparse operator)")
    ap.add_argument("--early_slack", type=float, default=None,
                    help="A/B: config.cull_early_slack")
    ap.add_argument("--cull_downscale", type=int, default=None,
                    help="A/B: config.cull_downscale (half-res screening "
                         "scene on warm-started pyramid levels)")
    ap.add_argument("--fused_roll", action="store_true",
                    help="A/B: config.fused_roll (unaligned scratch base, "
                         "one fewer 128-lane take per gather)")
    ap.add_argument("--texture", choices=("noise", "sos"), default="noise",
                    help="gate-scene texture (utils/synthetic.TEXTURES). "
                         "Default: band-limited aperiodic noise — the "
                         "near-periodic 'sos' family produces warp-"
                         "ambiguous minima at full scale (PARITY.md) and "
                         "is kept only for A/B continuity with rounds 1-3. "
                         "Texture does not affect timing (identical "
                         "geometry/tables/executables), only the quality "
                         "gate.")
    ap.add_argument("--no_permute_skip", action="store_true",
                    help="A/B: disable config.rect_permute_skip (permute-"
                         "pass tile masks; default on since round 3)")
    args = ap.parse_args()

    import jax

    from gipuma_tpu.config import PRESETS
    from gipuma_tpu.geometry.camera import FAKE_BASELINE
    from gipuma_tpu.models.pyramid import prepare_pyramid, run_pyramid
    from gipuma_tpu.utils.synthetic import make_ring_P, plane_scene

    h, w, n_views = 480, 640, 7
    images, rig, gt, _ = plane_scene(num_cams=n_views, h=h, w=w, focal=800.0,
                                     plane_depth=5.0, slant=(0.2, -0.1),
                                     texture=args.texture)
    Ps = make_ring_P(n_views, h, w, 800.0, target_depth=5.0)
    names = [f"cam{i:03d}" for i in range(n_views)]
    depth_min, depth_max = 3.0, 8.0
    # Production configuration: rectified row-aligned cost path (falls back
    # to the exact path inside prepare when the rig can't be rectified),
    # bf16 tap packing, fused window-cost kernel, 3-level coarse-to-fine
    # with 1 warm-started iteration per finer level (best point of the
    # scripts/tpu_sched_tune.py grid: quality equal to 2-level/2-iter —
    # median rel err 1.5e-3, 99.97% within 1% — at 1.7x the throughput).
    # Fine-level trims (far-sweep drop, 2-round refinement, carried coarse
    # cost): CPU-A/B'd quality-neutral (models/pyramid.py docstrings), and
    # re-gated here at median rel err < 5e-3 before timing.
    # pyramid_coarse_box=7: the downsampled levels run a 7x7 window (16
    # samples vs box 11's 36) that still spans a LARGER full-resolution
    # footprint than the fine level's (config.py).  Measured on v5e:
    # 0.693 -> 1.012 MP/s (+46%) at the same sub-5e-3 quality gate;
    # CPU-gated against the untrimmed pyramid in tests/test_pyramid.py.
    # rect_two_stage_cull (round 4): sparse 3x3 screening of all K sweep
    # candidates, full window only for the per-pixel winner — the sample-
    # count lever of ROADMAP.md's SoL analysis.  Hardware A/B on v5e:
    # 0.995 -> 1.243 MP/s (+25%) at the same sub-5e-3 gate on the noise
    # texture; semantics deviation documented in config.py + PARITY.md.
    # cull_view_stride=2 (screen on every other view; stage 2 still
    # evaluates the winner over ALL views): 1.243 -> 1.580 MP/s (+27%)
    # at the same gate — the permute share the round-4 breakdown flagged.
    params = PRESETS["middlebury"].replace(
        seed=0, cost_path="rect", pyramid_levels=3,
        pyramid_fine_iterations=1, pyramid_fine_far=False,
        pyramid_fine_refine_rounds=2, pyramid_carry_cost=True,
        pyramid_coarse_box=7, rect_two_stage_cull=True,
        cull_view_stride=2)
    if args.schedule == "reference":
        params = params.replace(pyramid_levels=1)
    if args.dispatch is not None:
        params = params.replace(level_dispatch=args.dispatch)
    if args.no_footprint_skip:
        params = params.replace(rect_footprint_skip=False)
    if args.coarse_box is not None:
        params = params.replace(pyramid_coarse_box=args.coarse_box)
    if args.no_permute_skip:
        params = params.replace(rect_permute_skip=False)
    if args.no_two_stage:
        params = params.replace(rect_two_stage_cull=False)
    if args.cull_view_stride is not None:
        params = params.replace(cull_view_stride=args.cull_view_stride)
    if args.cull_box is not None:
        params = params.replace(cull_box=args.cull_box)
    if args.cull_increment is not None:
        params = params.replace(cull_increment=args.cull_increment)
    if args.no_cull_pack:
        params = params.replace(cull_pack=False)
    if args.early_term:
        params = params.replace(cull_early_term=True)
    if args.early_slack is not None:
        params = params.replace(cull_early_slack=args.early_slack)
    if args.cull_downscale is not None:
        params = params.replace(cull_downscale=args.cull_downscale)
    if args.fused_roll:
        params = params.replace(fused_roll=True)
    params = params.with_depth_range(depth_min, depth_max, rig.f,
                                     FAKE_BASELINE)
    subset = list(range(1, n_views))

    # Scene/table prep is one-time host work per reference view; in a batch
    # it overlaps the previous view's device compute (models/pyramid.py),
    # so the steady-state metric times the device runs.
    prep = prepare_pyramid(images, Ps, names, subset, params,
                           depth_min, depth_max)

    def job(k):
        # Device-array return: the metric times compute + the depth fetch,
        # not the normals/cost transfers a depth-only consumer never makes.
        return run_pyramid(prep, k, as_numpy=False)[0]

    # Warmup / compile.  np.asarray forces a real device fetch (timings
    # through the remote TPU relay lie otherwise, CLAUDE.md).
    d = np.asarray(job(jax.random.PRNGKey(0)))
    assert np.isfinite(d).all()
    interior = np.s_[16:-16, 16:-16]
    err = np.abs(d[interior] - gt[interior]) / gt[interior]
    # Quality gate BEFORE timing (tightened round 2, VERDICT item 1): the
    # metric must not reward schedule-shrinking below the reference-class
    # accuracy (measured 1.5e-3 at this config).
    assert np.median(err) < 5e-3, f"median rel err {np.median(err):.4f}"

    reps = args.reps
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
