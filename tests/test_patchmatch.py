"""End-to-end PatchMatch on synthetic scenes with analytic ground truth."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gipuma_tpu.config import AlgorithmParams, PRESETS
from gipuma_tpu.geometry.camera import FAKE_BASELINE
from gipuma_tpu.models.patchmatch import finalize, init_state, run_patchmatch
from gipuma_tpu.models.scene import build_scene
from gipuma_tpu.utils.synthetic import plane_scene


def make_setup(slant=(0.0, 0.0), h=48, w=64, iterations=3):
    images, rig, gt_depth, _ = plane_scene(
        num_cams=4, h=h, w=w, focal=100.0, plane_depth=5.0, slant=slant)
    depth_min, depth_max = 3.0, 8.0
    params = AlgorithmParams(
        box_hsize=9, box_vsize=9, iterations=iterations, n_best=2,
        seed=0).with_depth_range(depth_min, depth_max, rig.f, FAKE_BASELINE)
    scene = build_scene(images, rig, [1, 2, 3], params, depth_min, depth_max)
    return images, rig, gt_depth, params, scene


def test_recovers_frontoparallel_plane():
    images, rig, gt_depth, params, scene = make_setup()
    key = jax.random.PRNGKey(params.seed)
    state = jax.jit(
        lambda k: run_patchmatch(scene, params, k))(key)
    depth, normals, cost = map(np.asarray, finalize(state, scene))

    interior = np.s_[10:-10, 10:-10]
    err = np.abs(depth[interior] - gt_depth[interior]) / gt_depth[interior]
    frac_good = np.mean(err < 0.01)
    assert frac_good > 0.9, f"only {frac_good:.2%} pixels within 1% depth"
    # Normals should be close to the true plane normal (0, 0, ±1) in world.
    nz = np.abs(normals[interior][..., 2])
    assert np.median(nz) > 0.97


def test_recovers_slanted_plane():
    images, rig, gt_depth, params, scene = make_setup(slant=(0.35, -0.25))
    key = jax.random.PRNGKey(1)
    state = run_patchmatch(scene, params, key)
    depth, normals, cost = map(np.asarray, finalize(state, scene))

    interior = np.s_[10:-10, 10:-10]
    err = np.abs(depth[interior] - gt_depth[interior]) / gt_depth[interior]
    assert np.mean(err < 0.02) > 0.85, f"median rel err {np.median(err):.4f}"


def test_determinism():
    images, rig, gt_depth, params, scene = make_setup(h=32, w=40, iterations=1)
    key = jax.random.PRNGKey(7)
    s1 = run_patchmatch(scene, params, key)
    s2 = run_patchmatch(scene, params, key)
    np.testing.assert_array_equal(np.asarray(s1.planes), np.asarray(s2.planes))
    np.testing.assert_array_equal(np.asarray(s1.cost), np.asarray(s2.cost))


def test_iterations_reduce_cost():
    images, rig, gt_depth, params, scene = make_setup(h=32, w=40, iterations=2)
    key = jax.random.PRNGKey(3)
    s0 = init_state(scene, params, key)
    s2 = run_patchmatch(scene, params, key)
    m0 = float(jnp.mean(s0.cost))
    m2 = float(jnp.mean(s2.cost))
    assert m2 < 0.5 * m0, f"mean cost {m0:.3f} -> {m2:.3f}"


def test_two_plane_scene_discontinuity():
    """Depth discontinuities: both planes recovered, boundary stays sharp."""
    from gipuma_tpu.utils.synthetic import two_plane_scene
    images, rig, gt_depth, near_mask = two_plane_scene(
        num_cams=5, h=48, w=64, focal=100.0)
    params = AlgorithmParams(
        box_hsize=9, box_vsize=9, iterations=4, n_best=2,
    ).with_depth_range(3.0, 8.0, rig.f, FAKE_BASELINE)
    scene = build_scene(images, rig, [1, 2, 3, 4], params, 3.0, 8.0)
    state = run_patchmatch(scene, params, jax.random.PRNGKey(0))
    depth, normals, cost = map(np.asarray, finalize(state, scene))

    interior = np.zeros_like(near_mask)
    interior[8:-8, 8:-8] = True
    # Exclude a 3px band at the discontinuity (windows straddle it).
    edge = np.abs(np.diff(near_mask.astype(int), axis=1)).sum(0).nonzero()[0]
    band = np.zeros_like(near_mask)
    if len(edge):
        x0 = int(edge[0])
        band[:, max(0, x0 - 3):x0 + 4] = True
    ok = interior & ~band
    err = np.abs(depth[ok] - gt_depth[ok]) / gt_depth[ok]
    assert np.median(err) < 0.01
    # Each side individually accurate.
    for mask in (near_mask & ok, (~near_mask) & ok):
        e = np.abs(depth[mask] - gt_depth[mask]) / gt_depth[mask]
        assert np.median(e) < 0.01, f"side failed: median {np.median(e)}"


def test_axial_propagation_matches_static_offsets():
    # axial_propagation_sweep (traced distance, one executable for both
    # close and far) must reproduce propagation_sweep's static-offset
    # results exactly.
    from gipuma_tpu.models.patchmatch import (CLOSE_OFFSETS, FAR_OFFSETS,
                                              axial_propagation_sweep,
                                              propagation_sweep)
    images, rig, gt_depth, params, scene = make_setup(h=32, w=40, iterations=1)
    key = jax.random.PRNGKey(3)
    state = init_state(scene, params, key)
    for dist, offs in ((1, CLOSE_OFFSETS), (5, FAR_OFFSETS)):
        for parity in (0, 1):
            want = propagation_sweep(state, scene, params, parity, offs)
            got = axial_propagation_sweep(state, scene, params, parity, dist)
            np.testing.assert_array_equal(np.asarray(got.planes),
                                          np.asarray(want.planes))
            np.testing.assert_array_equal(np.asarray(got.cost),
                                          np.asarray(want.cost))


def test_host_loop_honors_refine_flag():
    # Regression (round 3): run_patchmatch_host_loop dispatched the
    # refinement sweep unconditionally, ignoring params.refine — the
    # scan runner and iteration() both honor it.  refine=False must match
    # the scan runner's refine=False exactly and differ from refine=True.
    from gipuma_tpu.models.patchmatch import run_patchmatch_host_loop
    images, rig, gt_depth, params, scene = make_setup(h=32, w=40,
                                                      iterations=1)
    key = jax.random.PRNGKey(7)
    off = run_patchmatch_host_loop(scene, params.replace(refine=False), key)
    off_scan = run_patchmatch_host_loop(
        scene, params.replace(refine=False, level_dispatch="scan"), key)
    on = run_patchmatch_host_loop(scene, params, key)
    np.testing.assert_array_equal(np.asarray(off.planes),
                                  np.asarray(off_scan.planes))
    assert not np.array_equal(np.asarray(off.planes), np.asarray(on.planes))


def test_scan_runner_matches_host_loop():
    # run_iterations_scan (one device program, traced parity/distance) must
    # reproduce the host-dispatched sub-sweep loop exactly.
    from gipuma_tpu.models.patchmatch import run_patchmatch_host_loop
    images, rig, gt_depth, params, scene = make_setup(h=32, w=40,
                                                      iterations=2)
    key = jax.random.PRNGKey(5)
    want = run_patchmatch_host_loop(scene, params, key)
    got = run_patchmatch_host_loop(scene,
                                   params.replace(level_dispatch="scan"),
                                   key)
    np.testing.assert_allclose(np.asarray(got.planes),
                               np.asarray(want.planes), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(got.cost),
                               np.asarray(want.cost), rtol=0, atol=0)


def test_scan_runner_matches_host_loop_rect():
    from gipuma_tpu.models.patchmatch import run_patchmatch_host_loop
    from gipuma_tpu.models.rect_scene import build_rect_scene
    from gipuma_tpu.ops.rect_cost import rect_multiview_cost
    images, rig, gt_depth, params, scene = make_setup(h=32, w=40,
                                                      iterations=1)
    params = params.replace(cost_path="rect")
    rscene, _ = build_rect_scene(images, rig, [1, 2, 3], params,
                                 params.depth_min, params.depth_max,
                                 base=scene)
    key = jax.random.PRNGKey(6)
    want = run_patchmatch_host_loop(rscene, params, key,
                                    cost_fn=rect_multiview_cost)
    got = run_patchmatch_host_loop(rscene,
                                   params.replace(level_dispatch="scan"),
                                   key, cost_fn=rect_multiview_cost)
    np.testing.assert_allclose(np.asarray(got.planes),
                               np.asarray(want.planes), rtol=0, atol=0)
