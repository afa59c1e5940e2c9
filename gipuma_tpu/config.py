"""Algorithm configuration for the TPU-native Gipuma rebuild.

Capability parity with the reference's ``AlgorithmParameters``
(reference: algorithmparameters.h:19-85) plus the reference's compile-time
kernel variants (gipuma.cu:25-38) expressed as runtime booleans — JIT
specialization makes #ifdef-style variants unnecessary on TPU.

All defaults mirror the reference defaults exactly.
"""
from __future__ import annotations

import dataclasses
import enum
import math
from typing import Optional


class CostCombination(enum.IntEnum):
    """Multi-view cost combination mode (reference: algorithmparameters.h:17)."""

    ALL = 0
    BEST_N = 1
    ANGLE = 2  # parsed by the reference CLI but unimplemented on device
    GOOD = 3


class MatchingAlgorithm(enum.IntEnum):
    """Photometric cost family (reference: algorithmparameters.h:5-14).

    Only PM (bilaterally weighted color+gradient) and CENSUS exist on the
    reference device path; the remaining enum values are parsed but dead
    (SURVEY.md §2.2, "dead code" list).
    """

    PM = 0
    CENSUS = 1


# Reference: config.h:22 — per-view costs at or above this value are invalid.
MAXCOST = 1000.0


@dataclasses.dataclass(frozen=True)
class AlgorithmParams:
    """All runtime tunables. Frozen so instances hash as JIT static args."""

    # --- matching cost (reference defaults: algorithmparameters.h:21-51) ---
    algorithm: MatchingAlgorithm = MatchingAlgorithm.PM
    box_hsize: int = 19          # window width  (pixels)
    box_vsize: int = 19          # window height (pixels)
    tau_color: float = 10.0      # color difference truncation
    tau_gradient: float = 2.0    # gradient difference truncation
    alpha: float = 0.9           # color/gradient blend weight
    gamma: float = 10.0          # bilateral weight falloff
    window_increment: int = 2    # sample every k-th window pixel (gipuma.cu:28)
    census_epsilon: float = 2.5

    # --- cost aggregation over views ---
    cost_comb: CostCombination = CostCombination.BEST_N
    n_best: int = 2
    good_factor: float = 1.5

    # --- PatchMatch schedule ---
    iterations: int = 8
    # Propagation variants (reference compile-time EXTRAPOINT/EXTRAPOINTFAR,
    # gipuma.cu:36-38). The default reference build is SMALLKERNEL: a
    # close sweep (±1), a far sweep (±5), and a refinement sweep.
    far_propagation: bool = True       # ±5 "surface normal diffusion" sweep
    # "small": separate close (±1) / far (±5) sweeps — the reference's
    # default SMALLKERNEL + EXTRAPOINTFAR build (gipuma.cu:25-38).
    # "monolithic": one sweep with ±1/±3/±5 axial plus the EXTRAPOINT2
    # diagonal offsets (gipuma_checkerboard_cu, gipuma.cu:1122-1351).
    propagation_variant: str = "small"
    refine: bool = True                # disable for propagation-only ablations
    refine_delta_z_floor: float = 0.01  # gipuma.cu:959 loop lower bound
    refine_delta_z_div: float = 10.0    # gipuma.cu:959 deltaZ shrink factor
    refine_delta_n_init: float = 1.0    # gipuma.cu:945
    refine_delta_n_div: float = 4.0     # gipuma.cu:992

    # --- depth / disparity range ---
    depth_min: float = -1.0  # -1 → derive from view-selection baselines
    depth_max: float = -1.0
    min_disparity: float = 0.0
    max_disparity: float = 256.0

    # --- view selection (reference: main.cpp:430-499) ---
    view_selection: bool = True
    min_angle: float = 5.0   # degrees
    max_angle: float = 45.0  # degrees
    max_views: int = 9

    # --- misc ---
    color_processing: bool = False
    cam_scale: float = 1.0
    no_texture_check: bool = False  # reference NOTEXTURE_CHECK (gipuma.cu:34)
    no_texture_sim: float = 0.9
    no_texture_per: float = 0.6
    cost_thresh: float = 40.0  # validity threshold for outputs/fusion
    seed: int = 0              # replaces curand clock64() seeding — deterministic
    # Use the Pallas TPU sampling kernel for source-view gathers (the
    # XLA gather fallback is ~30x slower; Pallas path requires the whole
    # source image to fit in VMEM — gated automatically by build_scene).
    use_pallas_sampler: bool = False
    # Cost evaluation path: "exact" mirrors the reference formulas on the
    # original pixel grid; "rect" evaluates on per-pair epipolar-rectified
    # grids where source sampling is row-aligned (ops/rect_cost.py) —
    # ~2 orders of magnitude faster on TPU, small documented deviations
    # (window shape, rect-frame gradients).  Falls back to "exact" for
    # rigs that cannot be row-rectified (forward-motion baselines).
    cost_path: str = "exact"
    # Pack both bilinear taps of the rect-path source channels as bf16
    # pairs in one int32 word (ops/pallas_rowgather.pack_taps): halves the
    # dynamic_gather count — the measured bottleneck of the whole engine —
    # for <=0.4% tap quantization error.  f32 taps when False.
    pack_taps: bool = True
    # With pack_taps: ship only [img tap-pairs, gy tap-pairs] words and
    # derive the x-gradient in-kernel from the image taps (gx = 2*(v1-v0),
    # the derivative of the bilinear interpolant; the reference-side gx
    # switches to the matching 2*(I[x+1]-I[x]) operator) — 2 gathers per
    # sample instead of 3.  Default OFF: the in-cell gradient is piecewise
    # constant, i.e. up to half a source pixel out of phase with the
    # reference-side operator; at native rect sampling density (shear-based
    # routing, a_scale ~= 1) that phase error produces salt-noise depth
    # failures (~30% of pixels off a slanted synthetic plane) that the
    # earlier column supersampling (a_scale > 1) had masked.  Kept as an
    # option for supersampled configurations.
    grad_fwd_pack: bool = False
    # With pack_taps: ship ONLY the image tap words (no gradient channels)
    # and derive BOTH source gradients from neighboring window samples in
    # the cost evaluation (ops/rect_cost.py): window columns of one pixel's
    # cost window sample the source at uniform spacing (disparity is affine
    # on the rect grid), so central differences of already-gathered samples
    # — Jacobian-corrected by the plane's disparity slopes — give gradients
    # that are PHASE-EXACT at the sample positions, unlike grad_fwd_pack.
    # One dynamic_gather per sample (vs 3 for full channels, 2 for
    # grad_fwd_pack); the window is sampled with one extra row/column ring
    # for the differences.  The matching reference-side operator is the
    # step-`window_increment` central difference.  Takes precedence over
    # grad_fwd_pack.
    window_grads: bool = True
    # With window_grads: estimate gradients at the window's OUTERMOST
    # sample rows/columns by one-sided differences of the window samples
    # instead of gathering an extension ring — ncol*nrow gathers instead of
    # (ncol+2)*(nrow+2), a 44% gather cut at box 11 / increment 2 (the
    # fused cost kernel is gather-rate bound).  Edge estimators use an
    # inc-px baseline where the reference-side channel uses 2*inc — an
    # O(inc^2 * |I''|) operator mismatch at the 2 edge rows/columns only,
    # bounded by the tau_gradient truncation; interior columns are
    # unchanged.  Measured (scripts/tpu_onesided_ab.py, dino-scale v5e):
    # +7.7% end-to-end throughput at unchanged quality (median rel err
    # 0.00153 vs 0.0015, 99.95% of pixels within 1%); the engine-level
    # gate is tests/test_rect_engine.py::test_recovers_plane_onesided_edges.
    sdg_onesided_edges: bool = True
    # With window_grads on the packed (TPU) path: evaluate the whole window
    # cost — gathers AND the bilateral-weight/truncated-difference
    # arithmetic — in ONE fused Pallas kernel (ops/pallas_sdg_fused.py)
    # instead of per-window-row gather kernels with XLA arithmetic between
    # them.  The XLA glue round-trips sample arrays through HBM and was
    # measured at ~50 ms/sweep vs ~39 ms of gathers at dino scale.
    fused_window_cost: bool = True
    # With fused_window_cost: re-origin the scratch gather window at the
    # exact (unaligned) analytic base via a dynamic pltpu.roll, dropping
    # one 128-lane take per sample (span 3 -> 2 = 1/3 of the kernel's
    # dominant gather work).  Measured only +1.5% end-to-end on v5e — a
    # dynamic lane roll of the (8, span*128) scratch costs about as much
    # as the take it saves — so OFF by default; kept as a tested config
    # boolean (was the GIPUMA_FUSED_ROLL env var, round 2) for hardware
    # where the roll is cheaper.  Interpret-mode output is bitwise equal
    # either way (tests/test_sdg_fused.py).
    fused_roll: bool = False
    # Fused-kernel row-block height override (0 = auto).  The auto rule
    # picks the largest BR in {32, 16, 8} whose double-buffered blocks fit
    # ~6 MB of VMEM AND whose unrolled gather-body count stays under ~3500
    # (Mosaic compile time grows superlinearly with the unroll; measured
    # BR=32 586 s compile / 37.3 ms steady vs BR=16 133 s / 36.5 ms at
    # dino-L1 shapes — scripts/tpu_fused_br_ab.py).  Was the
    # GIPUMA_FUSED_BR env var (round 2); a config field keeps kernel
    # variants visible to results.txt provenance.
    fused_block_rows: int = 0
    # Skip fused-kernel work on [8, 128] rect tiles holding no read-back
    # target (models/rect_scene.py builds a per-view tile mask from the
    # return-permutation target set): the rect window is the BBOX of the
    # footprint quad, and for tilted (sheared/rotated) pairs the empty
    # bbox triangles + the source-footprint column margin are ~half the
    # grid (ring-rig tilted views measured 2.44x image pixels of bbox vs
    # ~1.21x of footprint).  Cost semantics are unchanged — skipped tiles'
    # outputs are unspecified and never addressed by the read-back tables
    # (the same contract as the per-view extent skip).
    rect_footprint_skip: bool = True
    # Extend the footprint skip to the two permutation gather passes that
    # touch non-target tiles: pass 2 of the state->rect forward permute
    # (skips delivering plane vectors to tiles the fused kernel never
    # evaluates) and pass 1 of the rect->state return permute (skips rect
    # rows no consumed state pixel reads back).  Masks are derived from
    # the same read-back-target set as the footprint skip at build time
    # (models/rect_scene.py) and are conservative supersets of the
    # consumed coordinates, so results are unchanged (gated by
    # tests/test_rect_cost.py + KERNEL_EQUIV).  Active only together with
    # rect_footprint_skip on the window_grads production path.  Hardware
    # A/B (v5e, bench rig): 1.012 -> 1.030 MP/s (+1.8%) at the same
    # sub-5e-3 quality gate — small on mildly-tilted rigs where the
    # fused kernel dominates, larger where permutes are a bigger share.
    rect_permute_skip: bool = True
    # Two-stage candidate culling (VERDICT r3 item 3 — the sample-count
    # lever): screen all K candidates of a sweep stage with a SPARSE
    # window (cull_box x cull_box at cull_increment spacing: 3x3 = 9
    # samples vs box 11's 36), then evaluate the FULL window only for the
    # per-pixel sparse winner.  Kernel work per stage drops from K full
    # windows to K sparse + 1 full.  SEMANTICS CHANGE vs the reference's
    # all-candidates-full evaluation (gipuma.cu:832-874): when the sparse
    # ranking mispicks, the losing candidate stays available in later
    # iterations (PatchMatch is iterative), so the effect is convergence
    # noise, not bias — quality-gated in tests/test_rect_engine.py and
    # PARITY.md rows; bench.py re-gates at 5e-3 before timing.  Off by
    # default until the hardware A/B adopts it.
    rect_two_stage_cull: bool = False
    cull_box: int = 9
    cull_increment: int = 4
    # Screen on a strided SUBSET of the source views (stride 2 = every
    # other view) — the sparse pass carries ~80% of the permute work and
    # half the kernel work after the cull (ROADMAP.md round-4 breakdown),
    # and candidate RANKING needs less view support than the accepted
    # cost (which stage 2 still evaluates over all views).  1 = all views.
    cull_view_stride: int = 1
    # Pack the sparse screening pass's permuted data at f16: plane words
    # 2K -> ceil(3K/2) forward-permute channels (all-f16 triples) and the
    # returned screening costs K -> ceil(K/2) (f16 pairs).  f16 carries
    # ~5e-4 relative error — ranking-only noise (near-tie flips); the
    # winner's accepted cost always comes from the f32 full pass.  The
    # permutes were co-dominant with the kernels after round 4
    # (ROADMAP.md) and the sparse pass carries most of their channels.
    cull_pack: bool = True
    # Evaluate the sparse screening pass on DOWNSCALED rect grids (2 =
    # half resolution in both rect axes): build_rect_scene attaches a
    # dedicated cull RectScene (strided views, cull_box/cull_increment
    # window, no supersampling, routing exactness not enforced — ranking
    # tolerates neighbor-cost reads) and the screening pass's permutes +
    # kernel work drop ~2-4x.  The winner's accepted cost still comes
    # from the exactly-routed full-resolution pass.  1 = off.
    cull_downscale: int = 1
    # Early termination via the screen (two-stage cull only): the current
    # plane joins the sparse pass as one extra candidate, and pixels
    # whose best candidate does not beat it (same sparse operator, plus
    # the slack below) skip the full-window pass entirely — the skip is
    # a DYNAMIC fused-kernel tile mask, so converged regions cost ~zero
    # full-pass work.  A mispredicted skip loses one acceptance (the
    # candidate stays available next iteration) — the sparse ranking's
    # documented noise class, gated at 5e-3 end to end.
    cull_early_term: bool = False
    cull_early_slack: float = 0.05
    # Rect-table slope target: the (rotated-)reference -> rect map must
    # keep slopes >= this in both table directions (at the 2% quantile)
    # for the nearest-neighbor 2-pass routing to be contention-free; the
    # build supersamples rows/columns (c_scale / a_scale) up to the
    # target.  Lower values supersample less — less kernel work per image
    # pixel — and lean on the routing-exactness budget below instead (the
    # build retries with inflated scales whenever the measured bad
    # fraction exceeds the budget, so quality is still gated per pair).
    # Default 1.0 (round 3): at the bench rig this is -4.4% evaluated
    # tiles vs the round-2 value 1.05 at ZERO measured routing error;
    # targets below 1.0 backfire (initial scales fail the routing check
    # and the 1.2x retry overshoots past the 1.05 sizes).
    rect_slope_req: float = 1.0
    # Max fraction of pixels allowed inexact plane routing (duplicate /
    # contended table slots -> those pixels read a NEIGHBOR pixel's
    # candidate cost during sweeps).  Verified at table build; exceeding
    # it retries with inflated supersampling, then drops the view
    # (rect_drop_unsupported_views) or falls back to the exact path.
    rect_routing_budget: float = 0.005
    # Rect-path disparity clamp margin (px) beyond the depth-range-induced
    # disparity interval; admits slanted-window extrapolation at window
    # edges (reach ~(hrad+inc) px x |disparity slope| <~ 0.75 => ~8 px
    # covers typical planes at box 11-15).  Feeds the static gather-span
    # bound (models/rect_scene.py) — smaller margin = fewer span blocks =
    # directly faster sampling kernels.
    disp_clamp_margin: float = 8.0
    # When a (reference, source) pair cannot use the rectified fast path
    # (epipole in the image, permutation tables too distorted, routing
    # inexact), DROP that source view from the rect scene — it becomes an
    # invalid view (cost MAXCOST, zero kernel work) exactly like a padded
    # view under view sharding — instead of failing the whole scene over
    # to the exact path.  Off: any unsupported pair falls the entire
    # reference view back to the exact engine (the pre-existing behavior).
    # Views a sane angle-window selection picks are virtually always
    # rectifiable; this matters for no-selection runs with wide rigs.
    rect_drop_unsupported_views: bool = True
    # Host-loop level dispatch granularity: "host" dispatches each sub-sweep
    # as its own executable (the reference's six-launch schedule); "scan"
    # "scan" runs all iterations of a level as ONE device program (lax.scan
    # over iterations x parity x axial distance, parity traced).  Measured
    # EQUAL to "host" on the bench (0.368 vs 0.365 MP/s, round 2): async
    # queueing already hides dispatch latency when only the final result is
    # fetched (largest device gap in the trace: 0.19 ms).  "host" stays the
    # default — same speed, cheaper compiles, per-sweep debuggability.
    level_dispatch: str = "host"
    # Evaluate all refinement rounds as ONE K-candidate batch generated
    # around the sweep's starting state instead of the reference's
    # sequential perturb-around-the-accepted-state loop (gipuma.cu:959-991).
    # One batched kernel dispatch instead of ~5 — the per-launch overhead
    # of the sampling kernels dominates K=1 evals on TPU.  The exploration
    # differs (all rounds jitter the same center); quality is validated on
    # the synthetic-GT suite.  Only takes effect for cost paths exposing a
    # batch evaluator (the rect fast path).
    refine_batched: bool = True
    # Coarse-to-fine (models/pyramid.py): >1 runs the random-init
    # iterations on 2x-downsampled levels and warm-starts each finer level
    # from the upsampled plane field — ~4x cheaper propagation per coarse
    # level; the reference always runs full resolution.  1 = off.
    pyramid_levels: int = 1
    pyramid_fine_iterations: int = 2
    # Fine-level (warm-started) schedule trims — the fine levels start
    # from an already-converged coarse field, so parts of the reference's
    # from-random schedule are redundant there.  Each trim is gated by the
    # bench/test quality gates (tests/test_pyramid.py, bench.py):
    # * pyramid_fine_far=False drops the far (±5) sweep at fine levels
    #   (long-range diffusion already happened at coarse scale);
    # * pyramid_fine_refine_rounds=N caps the fine-level refinement
    #   schedule to its FIRST N (largest-radius) rounds, 0 = full;
    # * pyramid_carry_cost=True upsamples the coarse cost field as the
    #   fine level's initial cost instead of re-evaluating it (the window
    #   cost is approximately scale-invariant; the first accepted sweep
    #   candidate replaces it with an exact value).
    pyramid_fine_far: bool = True
    pyramid_fine_refine_rounds: int = 0
    pyramid_carry_cost: bool = False
    # Cost-window size at DOWNSAMPLED pyramid levels (0 = same as
    # box_hsize/box_vsize).  A box of N coarse pixels spans 2^lvl * N
    # full-resolution pixels, so the coarse window can be smaller than the
    # reference's while still covering a LARGER physical footprint (box 7
    # at level 2 spans 28 full-res px vs the fine level's 11); the from-
    # random coarse level is ~half the pyramid's kernel work at the bench
    # shape (box 7 = 16 window samples vs box 11's 36).  Quality-gated by
    # bench.py's pre-timing gate and tests/test_pyramid.py.
    pyramid_coarse_box: int = 0
    # Cap on refinement_schedule length (first N rounds), 0 = full.
    refine_rounds_cap: int = 0
    # Executable-shape quantization (models/rect_scene.py): round every
    # static shape the rect executables specialize on up to coarse
    # buckets, so one compiled set serves a whole multi-view scan.  The
    # reference binary starts computing instantly on any shape
    # (main.cpp:973); the rect path instead pays ~2000 s of remote
    # compiles per DISTINCT (view-count, rect-shape, span) bucket at
    # 1600x1200 (DTU_REAL_RIG round 4) and the persistent jax cache does
    # not cover it.  Quantized axes: rect pad shape (rows/cols quanta
    # below), view count (padded to rect_pad_views_to with zero-work
    # dummy views), the disparity range feeding the gather-span bound,
    # and the permutation span (rounded up to even).  Padded rows/cols/
    # views cost ~nothing device-side (hw_valid + tile masks skip them);
    # the XLA glue at padded shapes measured ~2-3% (ROADMAP round 3).
    # A scan-level ledger (pipeline.run_batch) additionally ratchets the
    # buckets monotonically across reference views so later, smaller
    # views reuse the compiled set exactly.
    # Pack the plane vectors m = n/d into 2 int32 words per candidate for
    # the forward (state -> rect) permutation — (f16(m0) << 16 | f16(m1),
    # bitcast f32 m2) instead of 3 f32 channels (ops/rect_cost._pack_m).
    # The permute is pure nearest selection, so packing is a 1/3 cut of
    # the forward permute's gather work (permutes were co-dominant at
    # ~35% of device time after round 4) for ~5e-4 relative quantization
    # on the two packed components (~0.01 px of disparity — far below the
    # 1/32 px warp quantization).  Quality re-gated by bench.py at 5e-3.
    rect_pack_m: bool = True
    rect_quantize_shapes: bool = False
    rect_quantum_rows: int = 64     # hrp rounding; multiple of 8
    rect_quantum_cols: int = 256    # wrp rounding; multiple of 128
    rect_quantum_range: float = 64.0  # disparity-range quantum (px)
    rect_pad_views_to: int = 0      # 0 = max_views

    @property
    def box_hrad(self) -> int:
        return (self.box_hsize - 1) // 2

    @property
    def box_vrad(self) -> int:
        return (self.box_vsize - 1) // 2

    def window_offsets(self) -> list[tuple[int, int]]:
        """Static list of sampled (dx, dy) window offsets.

        Mirrors the reference double loop ``for i in [-hrad, hrad] step
        WIN_INCREMENT`` (gipuma.cu:494-495,633-634).
        """
        xs = range(-self.box_hrad, self.box_hrad + 1, self.window_increment)
        ys = range(-self.box_vrad, self.box_vrad + 1, self.window_increment)
        return [(dx, dy) for dx in xs for dy in ys]

    def refinement_schedule(self) -> list[tuple[float, float]]:
        """(delta_z, delta_n) perturbation radii per refinement round.

        Mirrors ``for deltaZ = max_disp/2; deltaZ >= 0.01; deltaZ /= 10``
        with deltaN starting at 1.0 and dividing by 4 (gipuma.cu:945-993).
        The schedule length is static given the disparity range.
        """
        out = []
        delta_z = self.max_disparity / 2.0
        delta_n = self.refine_delta_n_init
        while delta_z >= self.refine_delta_z_floor:
            out.append((delta_z, delta_n))
            delta_z /= self.refine_delta_z_div
            delta_n /= self.refine_delta_n_div
        if self.refine_rounds_cap > 0:
            out = out[:self.refine_rounds_cap]
        return out

    def with_depth_range(self, depth_min: float, depth_max: float,
                         f: float, baseline: float) -> "AlgorithmParams":
        """Return params with depth range and the induced disparity range set.

        Mirrors main.cpp:898-912: min_disparity = f*b/depthMax,
        max_disparity = f*b/depthMin.  Values are rounded to 6 significant
        digits: params are JIT-static, and sub-ulp focal-length jitter
        between reference views must not trigger recompilation.
        """
        def sig6(v: float) -> float:
            return float(f"{v:.6g}")

        return dataclasses.replace(
            self,
            depth_min=sig6(depth_min),
            depth_max=sig6(depth_max),
            min_disparity=sig6(f * baseline / depth_max),
            max_disparity=sig6(f * baseline / depth_min),
        )

    def replace(self, **kw) -> "AlgorithmParams":
        return dataclasses.replace(self, **kw)


# ---------------------------------------------------------------------------
# Dataset presets — mirrors scripts/*.sh parameter sets (SURVEY.md §2.6).
# ---------------------------------------------------------------------------

PRESETS: dict[str, AlgorithmParams] = {
    # scripts/dino.sh:8-24 (Middlebury dino/temple family)
    "middlebury": AlgorithmParams(
        box_hsize=11, box_vsize=11, iterations=8, n_best=2,
        depth_min=0.3, depth_max=0.8, view_selection=True,
        min_angle=5.0, max_angle=45.0,
    ),
    # scripts/dtu_fast.sh:10-21
    "dtu_fast": AlgorithmParams(
        box_hsize=15, box_vsize=15, iterations=6, n_best=3,
        depth_min=300.0, depth_max=800.0, view_selection=True,
        min_angle=10.0, max_angle=30.0, max_views=9,
    ),
    # scripts/dtu_accurate.sh:10-20
    "dtu_accurate": AlgorithmParams(
        box_hsize=25, box_vsize=25, iterations=8, n_best=3,
        depth_min=300.0, depth_max=800.0, view_selection=True,
        min_angle=10.0, max_angle=30.0, max_views=2**31 - 1,
    ),
    # High-resolution outdoor/indoor benchmarks (Tanks&Temples, ETH3D) —
    # a NEW workload class (the reference has no preset; BASELINE.json
    # config 5: "4K+ images, N-host distributed PatchMatch+fusion").
    # Depth range comes from SfM (bundler/colmap) per scene, so it is left
    # unset (-1 = infer); cam_scale 0.5 halves 4K-6K inputs toward the
    # rect path's table budget — pair with --distributed for multi-host
    # scans and fusion/sharded for the fused cloud.
    "highres": AlgorithmParams(
        box_hsize=15, box_vsize=15, iterations=6, n_best=3,
        depth_min=-1.0, depth_max=-1.0, view_selection=True,
        min_angle=5.0, max_angle=45.0, max_views=9, cam_scale=0.5,
        pyramid_levels=3, pyramid_fine_iterations=1,
    ),
}


@dataclasses.dataclass(frozen=True)
class FusionParams:
    """Consistency-fusion knobs; interface parity with out-of-tree fusibile
    (scripts/dtu_fast.sh:24-26, scripts/dino.sh:20-22)."""

    disp_thresh: float = 0.5
    normal_thresh: float = 30.0   # degrees
    num_consistent: int = 3
    min_angle_degrees: float = 10.0  # unused placeholder for interface parity
    # Greedy-loop output chunking (fusion/fuse.py): emit per-view outputs
    # in groups of this many reference views with a host fetch between
    # groups, bounding live device/host memory to ~chunk * H*W*28 bytes
    # instead of N * (at 49 views x 1200x1600 the all-views output is
    # >2 GB).  0 = auto-size to a ~256 MB output budget.
    chunk_views: int = 0
