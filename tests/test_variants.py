"""Algorithm-variant tests: census cost, color processing, no-texture check,
cost-combination modes inside the engine."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gipuma_tpu.config import AlgorithmParams, MatchingAlgorithm
from gipuma_tpu.geometry.camera import FAKE_BASELINE
from gipuma_tpu.models.patchmatch import finalize, run_patchmatch
from gipuma_tpu.models.scene import build_scene
from gipuma_tpu.ops import checkerboard as cb
from gipuma_tpu.ops.cost import per_view_costs
from gipuma_tpu.utils.synthetic import plane_scene, texture_fn, intersect_plane, make_ring_P


def setup(**kw):
    images, rig, gt, plane = plane_scene(num_cams=4, h=40, w=48, focal=80.0,
                                         plane_depth=5.0)
    base = dict(box_hsize=7, box_vsize=7, iterations=2)
    base.update(kw)
    params = AlgorithmParams(**base).with_depth_range(3.0, 8.0, rig.f,
                                                      FAKE_BASELINE)
    scene = build_scene(images, rig, [1, 2, 3], params, 3.0, 8.0)
    return images, rig, gt, params, scene


def test_census_cost_ordering():
    """Census cost: true plane scores lower than a wrong plane."""
    images, rig, gt, params, scene = setup(
        algorithm=MatchingAlgorithm.CENSUS, census_epsilon=2.5)
    h, w = images[0].shape
    w2 = w // 2
    n_true = np.broadcast_to(np.array([0, 0, -1.0], np.float32), (h, w2, 3))
    d_true = np.full((h, w2), 5.0, np.float32)   # plane z=5: n.X + d = 0 -> d=5 with n=(0,0,-1)
    c_true = np.asarray(per_view_costs(scene, params, 0,
                                       jnp.asarray(n_true), jnp.asarray(d_true)))
    d_wrong = np.full((h, w2), 3.4, np.float32)
    c_wrong = np.asarray(per_view_costs(scene, params, 0,
                                        jnp.asarray(n_true), jnp.asarray(d_wrong)))
    interior = np.s_[:, 10:-10, 6:-6]
    assert np.median(c_true[interior]) < np.median(c_wrong[interior])
    # census costs are bit counts: bounded by window size - 1
    assert c_true.max() <= 7 * 7 - 1 + 1e-6


def test_census_end_to_end():
    images, rig, gt, params, scene = setup(
        algorithm=MatchingAlgorithm.CENSUS, iterations=3)
    state = run_patchmatch(scene, params, jax.random.PRNGKey(0))
    depth, normals, cost = map(np.asarray, finalize(state, scene))
    interior = np.s_[8:-8, 8:-8]
    err = np.abs(depth[interior] - gt[interior]) / gt[interior]
    assert np.median(err) < 0.02


def test_color_processing_runs():
    """C=3 channel path: engine runs and recovers the plane."""
    images, rig, gt, plane = plane_scene(num_cams=4, h=40, w=48, focal=80.0,
                                         plane_depth=5.0)
    # fake RGB: stack shifted copies
    images_rgb = [np.stack([im, im * 0.9 + 5, im * 1.1 - 3], axis=-1)
                  for im in images]
    params = AlgorithmParams(box_hsize=7, box_vsize=7, iterations=2,
                             color_processing=True,
                             ).with_depth_range(3.0, 8.0, rig.f, FAKE_BASELINE)
    scene = build_scene(images_rgb, rig, [1, 2, 3], params, 3.0, 8.0)
    assert scene.channels == 3
    state = run_patchmatch(scene, params, jax.random.PRNGKey(0))
    depth, normals, cost = map(np.asarray, finalize(state, scene))
    interior = np.s_[8:-8, 8:-8]
    err = np.abs(depth[interior] - gt[interior]) / gt[interior]
    assert np.median(err) < 0.02


def test_no_texture_check_freezes_flat_regions():
    images, rig, gt, plane = plane_scene(num_cams=4, h=40, w=48, focal=80.0)
    # Make a flat (textureless) block in all views
    images = [im.copy() for im in images]
    for im in images:
        im[:16, :24] = 100.0
    params = AlgorithmParams(box_hsize=7, box_vsize=7, iterations=1,
                             no_texture_check=True,
                             ).with_depth_range(3.0, 8.0, rig.f, FAKE_BASELINE)
    scene = build_scene(images, rig, [1, 2, 3], params, 3.0, 8.0)
    tex = np.asarray(scene.texture_ok)
    assert not tex[8, 8]          # inside the flat block
    assert tex[30, 30]            # textured area
    state = run_patchmatch(scene, params, jax.random.PRNGKey(0))
    from gipuma_tpu.config import MAXCOST
    cost = np.asarray(state.cost)
    assert (cost[6:10, 6:10] == MAXCOST).all()
    depth, _, _ = map(np.asarray, finalize(state, scene))
    assert (depth[6:10, 6:10] == 0).all()   # invalid pixels emit depth 0


def test_checkpoint_roundtrip(tmp_path):
    import jax
    from gipuma_tpu.models.patchmatch import init_state
    from gipuma_tpu.utils.checkpoint import load_state, save_state
    images, rig, gt, params, scene = setup()
    st = init_state(scene, params, jax.random.PRNGKey(0))
    p = tmp_path / "state.npz"
    save_state(p, st)
    st2 = load_state(p)
    np.testing.assert_array_equal(np.asarray(st.planes), np.asarray(st2.planes))
    np.testing.assert_array_equal(np.asarray(st.cost), np.asarray(st2.cost))


def test_warm_start_beats_random_init():
    """Warm-starting from the GT depth map must give a much lower initial
    cost than random init, and keep improving."""
    import jax
    from gipuma_tpu.models.patchmatch import finalize, init_state, iteration
    from gipuma_tpu.utils.checkpoint import warm_start
    images, rig, gt, params, scene = setup()
    key = jax.random.PRNGKey(0)
    h, w = gt.shape
    n_world = np.broadcast_to(np.array([0, 0, -1.0], np.float32), (h, w, 3))
    st_warm = warm_start(scene, params, key, gt, n_world)
    st_rand = init_state(scene, params, key)
    assert float(st_warm.cost.mean()) < 0.3 * float(st_rand.cost.mean())
    st_next = iteration(st_warm, scene, params)
    assert float(st_next.cost.mean()) <= float(st_warm.cost.mean())
    depth, _, _ = map(np.asarray, finalize(st_warm, scene))
    interior = np.s_[8:-8, 8:-8]
    err = np.abs(depth[interior] - gt[interior]) / gt[interior]
    assert np.median(err) < 1e-3


def test_monolithic_propagation_variant():
    """EXTRAPOINT/EXTRAPOINT2 monolithic-offset variant converges too."""
    import jax
    images, rig, gt, params, scene = setup(propagation_variant="monolithic",
                                           iterations=2)
    state = run_patchmatch(scene, params, jax.random.PRNGKey(0))
    depth, _, _ = map(np.asarray, finalize(state, scene))
    interior = np.s_[8:-8, 8:-8]
    err = np.abs(depth[interior] - gt[interior]) / gt[interior]
    assert np.median(err) < 0.02
