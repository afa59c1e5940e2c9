"""End-to-end depth-map pipeline — the runGipuma analog (main.cpp:694-1199).

One call = one reference view: load images + calibration, select views,
derive ranges, run PatchMatch, write outputs (dmb/ply/png + results.txt).
Unlike the reference's process-per-view scripting (scripts/dino.sh:28-51),
`run_batch` keeps everything resident and loops reference views in-process;
the sharded scheduler in parallel/ distributes them across chips.
"""
from __future__ import annotations

import dataclasses
import json
import os
import time
from pathlib import Path
from typing import Sequence

import jax
import numpy as np

from .config import AlgorithmParams, PRESETS
from .geometry.camera import FAKE_BASELINE, build_rig
from .io import calib as calib_io
from .io import dmb as dmb_io
from .io import vis as vis_io
from .io.images import load_image
from .io.ply import write_ply
from .models.patchmatch import finalize, run_patchmatch
from .models.scene import build_scene, ensure_even_width
from .select import select_views


import functools


@functools.partial(jax.jit, static_argnums=(1,))
def _jitted_job_fused(scene, params, key):
    state = run_patchmatch(scene, params, key)
    return finalize(state, scene)


@functools.partial(jax.jit, static_argnums=(1,))
def _jitted_job_fused_rect(scene, params, key):
    from .ops.rect_cost import rect_multiview_cost
    state = run_patchmatch(scene, params, key, cost_fn=rect_multiview_cost)
    return finalize(state, scene)


_jitted_finalize = jax.jit(finalize)


def _jitted_job(scene, params, key):
    """One full depth-map job; executables cached per (shape, params).

    On TPU, Pallas-kernel cost paths dispatch the sub-sweeps from the host
    (fusing all six into one TPU executable trips a runtime kernel fault);
    otherwise the whole job is one fused jit."""
    rect = params.cost_path == "rect"
    if params.use_pallas_sampler or (rect and jax.default_backend() != "cpu"):
        from .models.patchmatch import run_patchmatch_host_loop
        if rect:
            from .ops.rect_cost import rect_multiview_cost
            state = run_patchmatch_host_loop(scene, params, key,
                                             cost_fn=rect_multiview_cost)
        else:
            state = run_patchmatch_host_loop(scene, params, key)
        return _jitted_finalize(state, scene)
    if rect:
        return _jitted_job_fused_rect(scene, params, key)
    return _jitted_job_fused(scene, params, key)


@dataclasses.dataclass
class RunResult:
    depth: np.ndarray        # [H, W]
    normals: np.ndarray      # [H, W, 3] world frame
    cost: np.ndarray         # [H, W]
    view_subset: list[int]
    depth_min: float
    depth_max: float
    runtime_s: float
    ref_name: str = ""


@dataclasses.dataclass
class PreparedJob:
    """Host-side plan + (possibly still-building) device scenes for one
    reference view.  `prepare_job` returns immediately with the heavy scene
    builds running on background threads (models/pyramid.py lazy futures);
    `run_prepared_job` resolves them — so a batch can overlap view i+1's
    host prep with view i's device compute (see run_batch)."""

    prep: object                 # pyramid prep futures, or a resolved scene
    params: AlgorithmParams
    view_subset: list[int]
    depth_min: float
    depth_max: float
    ref_name: str
    orig_w: int
    w: int
    pyramid: bool


def prepare_job(images: Sequence[np.ndarray],
                P_matrices: Sequence[np.ndarray],
                params: AlgorithmParams,
                image_names: Sequence[str] | None = None,
                ref_index: int = 0, ledger=None) -> PreparedJob:
    """Plan one reference view's job and start its scene builds.

    images/P_matrices are for all cameras; `ref_index` selects the reference
    (the reference binary requires the caller to put it first — we swap
    internally, like the --camera_idx pmvs path, main.cpp:409-421).
    ledger: optional rect_scene.ShapeBucketLedger shared across a scan so
    every reference view builds at the same quantized executable shapes
    (config.rect_quantize_shapes; run_batch threads one through).
    """
    order = [ref_index] + [i for i in range(len(images)) if i != ref_index]
    images = [np.asarray(images[i], dtype=np.float32) for i in order]
    Ps = [np.asarray(P_matrices[i]) for i in order]
    names = ([image_names[i] for i in order]
             if image_names else [f"cam{i:03d}" for i in order])

    orig_w = images[0].shape[1]
    images = [ensure_even_width(im) for im in images]
    h, w = images[0].shape[:2]

    rig = build_rig(Ps, names, cam_scale=params.cam_scale)
    subset, depth_min, depth_max = select_views(rig, orig_w, h, params,
                                                seed=params.seed)
    if not subset:
        raise ValueError("view selection produced an empty subset — "
                         "relax min/max angle or disable view_selection")
    params = params.with_depth_range(depth_min, depth_max, rig.f, FAKE_BASELINE)

    if params.pyramid_levels > 1:
        from .models.pyramid import prepare_pyramid
        prep = prepare_pyramid(images, Ps, names, subset, params,
                               depth_min, depth_max, lazy=True,
                               ledger=ledger)
        return PreparedJob(prep=prep, params=params, view_subset=subset,
                           depth_min=depth_min, depth_max=depth_max,
                           ref_name=names[0], orig_w=orig_w, w=w,
                           pyramid=True)

    if params.cost_path == "rect":
        from .models.rect_scene import RectifyUnsupported, build_rect_scene
        # Lite base: the rect path reads only its geometry fields (the
        # exact path's sampling tables dominate scene-build time).
        base = build_scene(images, rig, subset, params, depth_min,
                           depth_max, lite=True)
        try:
            scene, _ = build_rect_scene(images, rig, subset, params,
                                        depth_min, depth_max, base=base,
                                        ledger=ledger)
        except RectifyUnsupported as e:
            print(f"[gipuma_tpu] rect path unavailable ({e}); "
                  "falling back to the exact cost path")
            params = params.replace(cost_path="exact")
            scene = build_scene(images, rig, subset, params,
                                depth_min, depth_max)
    else:
        scene = build_scene(images, rig, subset, params,
                            depth_min, depth_max)
    return PreparedJob(prep=scene, params=params, view_subset=subset,
                       depth_min=depth_min, depth_max=depth_max,
                       ref_name=names[0], orig_w=orig_w, w=w, pyramid=False)


def run_prepared_job(job: PreparedJob) -> RunResult:
    """Execute a prepared job on the device and return its RunResult."""
    params = job.params
    if job.pyramid:
        from .models.pyramid import run_pyramid
        t0 = time.perf_counter()
        depth, normals, cost = run_pyramid(job.prep,
                                           jax.random.PRNGKey(params.seed))
        runtime = time.perf_counter() - t0
    else:
        key = jax.random.PRNGKey(params.seed)
        t0 = time.perf_counter()
        depth, normals, cost = _jitted_job(job.prep, params, key)
        depth = np.asarray(jax.block_until_ready(depth))
        runtime = time.perf_counter() - t0
        normals = np.asarray(normals)
        cost = np.asarray(cost)

    if job.w != job.orig_w:  # crop the even-width padding
        depth = depth[:, :job.orig_w]
        normals = normals[:, :job.orig_w]
        cost = cost[:, :job.orig_w]
    return RunResult(depth=depth, normals=normals, cost=cost,
                     view_subset=job.view_subset, depth_min=job.depth_min,
                     depth_max=job.depth_max, runtime_s=runtime,
                     ref_name=job.ref_name)


def compute_depthmap(images: Sequence[np.ndarray],
                     P_matrices: Sequence[np.ndarray],
                     params: AlgorithmParams,
                     image_names: Sequence[str] | None = None,
                     ref_index: int = 0) -> RunResult:
    """Compute the depth map for one reference view (prepare + run)."""
    return run_prepared_job(prepare_job(images, P_matrices, params,
                                        image_names, ref_index))


def write_outputs(result: RunResult, out_dir: str | os.PathLike,
                  params: AlgorithmParams,
                  ref_image: np.ndarray | None = None,
                  P_ref: np.ndarray | None = None) -> None:
    """disp.dmb + normals.dmb + PNGs + PLY + results.txt — the reference's
    output set (main.cpp:987-1031, fileIoUtils.h:183-245)."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    dmb_io.write_dmb(out / "disp.dmb", result.depth)
    dmb_io.write_dmb(out / "normals.dmb", result.normals)

    vis_io.save_png(out / "disp.png",
                    vis_io.depth_to_jet(result.depth, result.depth_min,
                                        result.depth_max))
    vis_io.save_png(out / "normals.png", vis_io.normals_png(result.normals))
    vis_io.save_png(out / "cost.png", vis_io.cost_to_gray(result.cost, 100.0))

    if ref_image is not None and P_ref is not None:
        write_ply(out / f"3d_model_{result.ref_name}.ply", result.depth,
                  result.normals, ref_image, P_ref)

    # results.txt provenance log (fileIoUtils.h:183-245 capability).
    n_px = result.depth.size
    lines = {
        "ref_name": result.ref_name,
        "runtime_s": round(result.runtime_s, 4),
        "runtime_us_per_pixel": round(result.runtime_s * 1e6 / n_px, 4),
        "selected_views": result.view_subset,
        "depth_min": result.depth_min,
        "depth_max": result.depth_max,
        "params": {k: (v.name if hasattr(v, "name") else v)
                   for k, v in dataclasses.asdict(params).items()},
    }
    with open(out / "results.txt", "a") as f:
        f.write(json.dumps(lines, indent=2) + "\n")


def run_batch(image_paths: Sequence[str], params: AlgorithmParams,
              results_root: str | os.PathLike,
              p_folder: str | None = None, krt_file: str | None = None,
              calib_file: str | None = None, pmvs_folder: str | None = None,
              ref_indices: Sequence[int] | None = None,
              color: bool = False,
              skip_existing: bool = False) -> list[RunResult]:
    """Loop reference views in-process (replaces scripts/*.sh shell loops).

    skip_existing: resume a partially-finished batch — views whose output
    directory already holds a disp.dmb are skipped (the coarse restart
    property the reference gets from its process-per-view scripting,
    SURVEY.md §5 "failure detection").
    """
    names = [Path(p).name for p in image_paths]
    Ps = calib_io.load_projection_matrices(
        names, p_folder=p_folder, krt_file=krt_file,
        calib_file=calib_file, pmvs_folder=pmvs_folder)
    images = [load_image(p, color=color) for p in image_paths]
    if ref_indices is None:
        ref_indices = range(len(images))

    if pmvs_folder and params.depth_min == -1:
        # Bundler point cloud drives the depth range (main.cpp:873-876).
        bundle = Path(pmvs_folder) / "bundle.rd.out"
        if bundle.exists():
            from .geometry.camera import camera_center_from_P
            dmin, dmax = calib_io.bundler_depth_range(
                bundle, camera_center_from_P(np.asarray(Ps[0])))
            params = params.replace(depth_min=dmin, depth_max=dmax)

    results = []
    root = Path(results_root)
    todo = [ref for ref in ref_indices
            if not (skip_existing
                    and (root / f"{Path(names[ref]).stem}"
                         / "disp.dmb").exists())]
    # Pipeline host prep with device compute: view i+1's scene build (host
    # numpy + table construction, the dominant per-view cost) runs while
    # view i's PatchMatch occupies the chip.  prepare_job itself returns
    # immediately (pyramid scene builds are background futures), so one
    # planner thread ahead of the runner suffices.
    from concurrent.futures import ThreadPoolExecutor

    # Scan-level executable-shape ratchet (config.rect_quantize_shapes):
    # one ledger across all reference views so they share compiled sets.
    ledger = None
    if params.cost_path == "rect" and getattr(params, "rect_quantize_shapes",
                                              False):
        from .models.rect_scene import ShapeBucketLedger
        ledger = ShapeBucketLedger()
    with ThreadPoolExecutor(max_workers=1) as planner:
        nxt = (planner.submit(prepare_job, images, Ps, params, names,
                              ref_index=todo[0], ledger=ledger)
               if todo else None)
        for i, ref in enumerate(todo):
            job = nxt.result()
            if i + 1 < len(todo):
                nxt = planner.submit(prepare_job, images, Ps, params, names,
                                     ref_index=todo[i + 1], ledger=ledger)
            res = run_prepared_job(job)
            out_dir = root / f"{Path(names[ref]).stem}"
            write_outputs(res, out_dir, params, ref_image=images[ref],
                          P_ref=build_rig(
                              [Ps[ref]] + [Ps[i] for i in range(len(Ps))
                                           if i != ref],
                              rebase=True).cameras[0].P)
            results.append(res)
    return results
