"""End-to-end PatchMatch with the rectified fast cost path.

Quality gate for the rect-path deviations (window shape, rect-frame
gradients, nearest-pixel centering): the engine must recover synthetic
scenes as well as the exact path does (tests/test_patchmatch.py)."""
import numpy as np
import jax
import pytest

from gipuma_tpu.config import AlgorithmParams
from gipuma_tpu.geometry.camera import FAKE_BASELINE
from gipuma_tpu.models.patchmatch import finalize, run_patchmatch
from gipuma_tpu.models.rect_scene import build_rect_scene
from gipuma_tpu.ops.rect_cost import rect_multiview_cost
from gipuma_tpu.utils.synthetic import plane_scene, two_plane_scene


def make_setup(slant=(0.0, 0.0), h=48, w=64, iterations=3, **overrides):
    images, rig, gt_depth, _ = plane_scene(
        num_cams=4, h=h, w=w, focal=100.0, plane_depth=5.0, slant=slant)
    depth_min, depth_max = 3.0, 8.0
    overrides.setdefault("box_hsize", 9)
    overrides.setdefault("box_vsize", 9)
    params = AlgorithmParams(
        iterations=iterations, n_best=2,
        seed=0, **overrides).with_depth_range(depth_min, depth_max, rig.f,
                                              FAKE_BASELINE)
    scene, info = build_rect_scene(images, rig, [1, 2, 3], params,
                                   depth_min, depth_max)
    return images, rig, gt_depth, params, scene, info


def test_tables_are_clean():
    """Plane routing must be (near-)exact: every reference pixel reads back
    the cost of its OWN candidate plane.  build_rect_scene enforces
    routing_bad_frac <= 0.5% (supersampled contention-free tables) — a
    regression here silently costs ~100x depth accuracy."""
    _, _, _, _, _, info = make_setup()
    for pair in info["pairs"]:
        assert pair["routing_bad_frac"] <= 0.005, pair
        assert pair["fwd_affected_frac"] <= 0.005, pair
        assert pair["ret_affected_frac"] <= 0.005, pair


@pytest.mark.parametrize("slant", [(0.0, 0.0), (0.35, -0.25)])
def test_recovers_plane(slant):
    images, rig, gt_depth, params, scene, _ = make_setup(slant=slant)
    key = jax.random.PRNGKey(params.seed)
    state = run_patchmatch(scene, params, key, cost_fn=rect_multiview_cost)
    depth, normals, cost = map(np.asarray, finalize(state, scene))

    interior = np.s_[10:-10, 10:-10]
    err = np.abs(depth[interior] - gt_depth[interior]) / gt_depth[interior]
    frac_good = np.mean(err < 0.02)
    assert frac_good > 0.85, (f"only {frac_good:.2%} pixels within 2% depth; "
                              f"median {np.median(err):.4f}")


def test_recovers_plane_onesided_edges():
    """Quality gate for sdg_onesided_edges (ring-free window gradients):
    slanted-plane recovery must match the ring mode's bar."""
    images, rig, gt_depth, params, scene, _ = make_setup(
        slant=(0.35, -0.25), sdg_onesided_edges=True)
    key = jax.random.PRNGKey(params.seed)
    state = run_patchmatch(scene, params, key, cost_fn=rect_multiview_cost)
    depth, _, _ = map(np.asarray, finalize(state, scene))

    interior = np.s_[10:-10, 10:-10]
    err = np.abs(depth[interior] - gt_depth[interior]) / gt_depth[interior]
    frac_good = np.mean(err < 0.02)
    assert frac_good > 0.85, (f"only {frac_good:.2%} pixels within 2% depth; "
                              f"median {np.median(err):.4f}")


def test_census_cost_discriminates():
    """The rect-path census cost (-a ct, _rect_pair_cost_batch_census) must
    separate the true plane from a perturbed one — census is exposed on
    the production TPU path, not just the exact engine."""
    from gipuma_tpu.config import MatchingAlgorithm
    from gipuma_tpu.geometry import transforms as T
    from gipuma_tpu.ops import checkerboard as cb
    from gipuma_tpu.ops.rect_cost import rect_multiview_cost_batch

    # Cost-level gate (a full engine run at census's increment-1 window is
    # ~5 min in interpret mode): the census rect cost must strongly favor
    # the true plane over a perturbed one — the discrimination PatchMatch
    # needs to converge.  End-to-end census coverage is the CLI test
    # (tests/test_cli.py::test_cli_census_end_to_end).
    import jax.numpy as jnp

    images, rig, gt_depth, params, scene, _ = make_setup(
        slant=(0.1, 0.0), h=40, w=56,
        box_hsize=7, box_vsize=7, algorithm=MatchingAlgorithm.CENSUS)
    h, w = images[0].shape
    w2 = w // 2
    parity = 0
    x = cb.active_x(h, w2, parity)
    y = cb.active_y(h, w2)
    # True plane in camera frame: n_cam from the slant, d via GT depth.
    n_cam = np.array([0.1, 0.0, 1.0]) / np.linalg.norm([0.1, 0.0, 1.0])
    n_true = jnp.broadcast_to(jnp.asarray(-n_cam, jnp.float32), (h, w2, 3))
    gt_act = jnp.asarray(gt_depth)[cb.active_y(h, w2).astype(int),
                                   x.astype(int)]
    d_true = T.plane_d_at_pixel(scene.M_inv, scene.P_col4, n_true, x, y,
                                gt_act)
    d_wrong = T.plane_d_at_pixel(scene.M_inv, scene.P_col4, n_true, x, y,
                                 gt_act * 1.12)
    costs = np.asarray(rect_multiview_cost_batch(
        scene, params, parity,
        jnp.stack([n_true, n_true]), jnp.stack([d_true, d_wrong])))
    interior = np.s_[8:-8, 8:-8]
    c_true, c_wrong = costs[0][interior], costs[1][interior]
    assert np.median(c_true) < 0.5 * np.median(c_wrong)
    assert np.mean(c_true < c_wrong) > 0.9


def test_drop_unsupported_view():
    """A forward-motion source (baseline along the optical axis cannot be
    row-rectified) is DROPPED as an invalid view instead of failing the
    whole scene to the exact path; quality holds on the remaining views."""
    import jax.numpy as jnp

    from gipuma_tpu.geometry.camera import build_rig
    from gipuma_tpu.models.rect_scene import RectifyUnsupported
    from gipuma_tpu.utils.synthetic import make_ring_P

    images, rig, gt_depth, _ = plane_scene(
        num_cams=4, h=48, w=64, focal=100.0, plane_depth=5.0,
        slant=(0.2, -0.1))
    Ps = make_ring_P(4, 48, 64, 100.0, target_depth=5.0)
    K = np.array([[100.0, 0.0, 32.0], [0.0, 100.0, 24.0], [0.0, 0.0, 1.0]])
    # 5th camera: pure forward translation — unrectifiable with the ref.
    P_fwd = K @ np.hstack([np.eye(3), [[0.0], [0.0], [-0.5]]])
    Ps = list(Ps) + [P_fwd]
    images = list(images) + [images[0]]
    names = [f"c{i}" for i in range(5)]
    rig5 = build_rig(Ps, names)

    params = AlgorithmParams(
        box_hsize=9, box_vsize=9, iterations=3, n_best=2,
        seed=0).with_depth_range(3.0, 8.0, rig5.f, FAKE_BASELINE)
    scene, info = build_rect_scene(images, rig5, [1, 2, 3, 4], params,
                                   3.0, 8.0)
    assert info["dropped_views"] == [4]
    assert float(scene.view_valid[3]) == 0.0     # position of view 4
    assert int(scene.hw_valid[3, 0]) == 0        # zero-extent = no work

    state = run_patchmatch(scene, params, jax.random.PRNGKey(0),
                           cost_fn=rect_multiview_cost)
    depth, _, _ = map(np.asarray, finalize(state, scene))
    interior = np.s_[10:-10, 10:-10]
    err = np.abs(depth[interior] - gt_depth[interior]) / gt_depth[interior]
    assert np.mean(err < 0.02) > 0.85, f"median {np.median(err):.4f}"

    # Flag off: the same rig must fall back whole-scene (old behavior).
    with pytest.raises(RectifyUnsupported):
        build_rect_scene(images, rig5, [1, 2, 3, 4],
                         params.replace(rect_drop_unsupported_views=False),
                         3.0, 8.0)


def test_two_plane_discontinuity():
    images, rig, gt_depth, near_mask = two_plane_scene(
        num_cams=5, h=48, w=64, focal=100.0)
    params = AlgorithmParams(
        box_hsize=9, box_vsize=9, iterations=4, n_best=2,
    ).with_depth_range(3.0, 8.0, rig.f, FAKE_BASELINE)
    scene, _ = build_rect_scene(images, rig, [1, 2, 3, 4], params, 3.0, 8.0)
    state = run_patchmatch(scene, params, jax.random.PRNGKey(0),
                           cost_fn=rect_multiview_cost)
    depth, _, _ = map(np.asarray, finalize(state, scene))

    interior = np.zeros_like(near_mask)
    interior[8:-8, 8:-8] = True
    edge = np.abs(np.diff(near_mask.astype(int), axis=1)).sum(0).nonzero()[0]
    band = np.zeros_like(near_mask)
    if len(edge):
        x0 = int(edge[0])
        band[:, max(0, x0 - 3):x0 + 4] = True
    ok = interior & ~band
    for mask in (ok, near_mask & ok, (~near_mask) & ok):
        e = np.abs(depth[mask] - gt_depth[mask]) / gt_depth[mask]
        assert np.median(e) < 0.015, f"median rel err {np.median(e):.4f}"


def test_permute_skip_is_exact():
    """rect_permute_skip (config.py): masking the forward-permute pass-2 /
    return-permute pass-1 tiles that hold no consumed coordinate must not
    change any per-view cost the engine consumes — the masks are built as
    conservative supersets of the read-back-target set
    (models/rect_scene.build_rect_scene).

    Caveat (advisor r3): in interpret mode skipped output tiles read as
    ZEROS, so this CPU test cannot detect a consumed coordinate reading
    stale VMEM on real hardware — the device lowering of the masked
    kernel is qualified by scripts/tpu_kernel_equiv.py (the
    `permute2d_mask2` entry, kept in the routine device set so the masked
    path is re-checked after Pallas/jax upgrades)."""
    import jax.numpy as jnp

    from gipuma_tpu.ops.rect_cost import rect_per_view_costs_batch

    # 96x128: large enough that the ring rig's tilted pairs leave whole
    # [8, 128] tiles without targets (at 48x64 every tile holds one).
    images, rig, gt_depth, params, scene, _ = make_setup(
        slant=(0.35, -0.25), h=96, w=128)
    assert scene.fwd2_ok is not None and scene.ret1_ok is not None
    # The masks must actually skip something on a ring rig (tilted pairs).
    assert float(scene.fwd2_ok.mean()) < 0.999
    assert float(scene.ret1_ok.mean()) < 0.999

    h, w = images[0].shape[:2]
    w2 = w // 2
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.uniform(4.0, 7.0, (2, h, w2)), jnp.float32)
    n = rng.normal(size=(2, h, w2, 3))
    n[..., 2] = -np.abs(n[..., 2]) - 1.0
    n = jnp.asarray(n / np.linalg.norm(n, axis=-1, keepdims=True),
                    jnp.float32)

    for parity in (0, 1):
        on = np.asarray(rect_per_view_costs_batch(
            scene, params, parity, n, d))
        off = np.asarray(rect_per_view_costs_batch(
            scene, params.replace(rect_permute_skip=False), parity, n, d))
        np.testing.assert_allclose(on, off, rtol=2e-6, atol=1e-5)


def test_pack_m_cost_error_is_small():
    """rect_pack_m (config.py): f16-packing the two smaller plane-vector
    components for the forward permute must perturb per-view costs only at
    the quantization-noise level (~5e-4 relative on m => ~0.01 px of
    sample position), far below the photometric noise the cost tolerates.
    Engine-level quality is covered by every rect engine test (the flag
    defaults on)."""
    import jax.numpy as jnp

    from gipuma_tpu.ops.rect_cost import rect_per_view_costs_batch

    images, rig, gt_depth, params, scene, _ = make_setup(
        slant=(0.35, -0.25), h=96, w=128)
    h, w = images[0].shape[:2]
    w2 = w // 2
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.uniform(4.0, 7.0, (2, h, w2)), jnp.float32)
    n = rng.normal(size=(2, h, w2, 3))
    n[..., 2] = -np.abs(n[..., 2]) - 1.0
    n = jnp.asarray(n / np.linalg.norm(n, axis=-1, keepdims=True),
                    jnp.float32)

    on = np.asarray(rect_per_view_costs_batch(
        scene, params.replace(rect_pack_m=True), 0, n, d))
    off = np.asarray(rect_per_view_costs_batch(
        scene, params.replace(rect_pack_m=False), 0, n, d))
    valid = (on < 1000.0) & (off < 1000.0)
    diff = np.abs(on - off)[valid]
    base = np.abs(off)[valid]
    # Median relative perturbation well under a percent; no wild outliers
    # beyond what a 0.01-px sample shift can do at a texture edge.
    assert np.median(diff / np.maximum(base, 1e-3)) < 2e-3
    assert np.quantile(diff, 0.99) < 0.3, np.quantile(diff, 0.99)


def test_all_four_permute_pass_masks_skip():
    """Every permutation pass is masked (round 5: fwd pass 1 and ret
    pass 2 joined the round-3 fwd2/ret1 masks): each mask must actually
    skip tiles on a ring rig, and ret2_ok's rectangle is the un-rotated
    image extent inside the S x S square pad."""
    images, rig, gt_depth, params, scene, _ = make_setup(
        slant=(0.35, -0.25), h=96, w=128)
    for name in ("fwd1_ok", "fwd2_ok", "ret1_ok", "ret2_ok"):
        mask = getattr(scene, name)
        assert mask is not None, name
        assert float(mask.mean()) < 0.999, name
        # Each view must keep at least one tile enabled.
        assert (np.asarray(mask).reshape(mask.shape[0], -1).max(1)
                > 0).all(), name


def test_two_stage_cull_degenerate_equals_full():
    """rect_two_stage_cull with the cull window == the full window must
    return exactly the full path's winner cost (and MAXCOST for losers):
    the sparse screening then ranks with the same evaluator, so the
    selected candidate and its cost match the plain batch evaluation."""
    import jax
    import jax.numpy as jnp

    from gipuma_tpu.config import MAXCOST
    from gipuma_tpu.geometry import transforms as T
    from gipuma_tpu.ops import checkerboard as cb
    from gipuma_tpu.ops.rect_cost import rect_multiview_cost_batch

    images, rig, gt_depth, params, scene, _ = make_setup(
        slant=(0.2, -0.15), h=48, w=64)
    h, w2 = 48, 32
    key = jax.random.PRNGKey(3)
    kn, kd = jax.random.split(key)
    # K=3 random candidate plane stacks on parity 0.
    from gipuma_tpu.models.patchmatch import random_unit_hemisphere
    n = jax.vmap(lambda k: random_unit_hemisphere(
        jax.random.fold_in(kn, k), scene.view_vec))(jnp.arange(3))
    n = jax.vmap(lambda a: cb.extract(a, 0))(n)
    depth = jax.random.uniform(kd, (3, h, w2), minval=4.0, maxval=6.0)
    x = cb.active_x(h, w2, 0)
    y = cb.active_y(h, w2)
    d = jax.vmap(lambda nn, dd: T.plane_d_at_pixel(
        scene.M_inv, scene.P_col4, nn, x, y, dd))(n, depth)

    c_full = rect_multiview_cost_batch(scene, params, 0, n, d)
    p2 = params.replace(rect_two_stage_cull=True,
                        cull_box=params.box_hsize,
                        cull_increment=params.window_increment)
    c_2s = rect_multiview_cost_batch(scene, p2, 0, n, d)

    import numpy as np
    cf = np.asarray(c_full)
    c2 = np.asarray(c_2s)
    # Depth-validity mask used by the 2-stage ranking.
    dep = np.asarray(T.depth_from_plane(n, d, x, y, scene.fx, scene.cx,
                                        scene.cy, scene.alpha_focal))
    valid = (dep >= float(scene.depth_min)) & (dep <= float(scene.depth_max))
    kb = np.argmin(np.where(valid, cf, MAXCOST + 1.0), axis=0)
    expect = np.where(np.arange(3)[:, None, None] == kb[None], np.take_along_axis(cf, kb[None], 0), MAXCOST)
    assert np.allclose(c2, expect, atol=1e-4), np.abs(c2 - expect).max()


def test_recovers_plane_two_stage_cull():
    """Quality gate for rect_two_stage_cull: slanted-plane recovery with
    sparse-winner-only full evaluation must match the plain path's bar
    (the mispick cost is convergence noise, not bias — config.py)."""
    images, rig, gt_depth, params, scene, _ = make_setup(
        slant=(0.35, -0.25), rect_two_stage_cull=True)
    key = jax.random.PRNGKey(params.seed)
    state = run_patchmatch(scene, params, key, cost_fn=rect_multiview_cost)
    depth, _, _ = map(np.asarray, finalize(state, scene))

    interior = np.s_[10:-10, 10:-10]
    err = np.abs(depth[interior] - gt_depth[interior]) / gt_depth[interior]
    frac_good = np.mean(err < 0.02)
    assert frac_good > 0.85, (f"only {frac_good:.2%} pixels within 2% depth; "
                              f"median {np.median(err):.4f}")


def test_recovers_plane_cull_view_stride():
    """cull_view_stride=2: candidate ranking from every other view only
    (stage-2 still evaluates the winner over ALL views) must hold the
    plane-recovery bar."""
    images, rig, gt_depth, params, scene, _ = make_setup(
        slant=(0.35, -0.25), rect_two_stage_cull=True, cull_view_stride=2)
    key = jax.random.PRNGKey(params.seed)
    state = run_patchmatch(scene, params, key, cost_fn=rect_multiview_cost)
    depth, _, _ = map(np.asarray, finalize(state, scene))

    interior = np.s_[10:-10, 10:-10]
    err = np.abs(depth[interior] - gt_depth[interior]) / gt_depth[interior]
    frac_good = np.mean(err < 0.02)
    assert frac_good > 0.85, (f"only {frac_good:.2%} pixels within 2% depth; "
                              f"median {np.median(err):.4f}")


def test_recovers_plane_cull_early_term():
    """config.cull_early_term: pixels whose best candidate does not beat
    the current plane in the sparse operator skip the full pass via the
    dynamic tile mask.  Quality-neutral by construction (a skip only
    forgoes an acceptance that the sparse operator says would fail);
    must hold the plane-recovery bar."""
    images, rig, gt_depth, params, scene, _ = make_setup(
        slant=(0.35, -0.25), rect_two_stage_cull=True, cull_view_stride=2,
        cull_early_term=True)
    key = jax.random.PRNGKey(params.seed)
    state = run_patchmatch(scene, params, key, cost_fn=rect_multiview_cost)
    depth, _, _ = map(np.asarray, finalize(state, scene))

    interior = np.s_[10:-10, 10:-10]
    err = np.abs(depth[interior] - gt_depth[interior]) / gt_depth[interior]
    frac_good = np.mean(err < 0.02)
    assert frac_good > 0.85, (f"only {frac_good:.2%} pixels within 2% depth; "
                              f"median {np.median(err):.4f}")
