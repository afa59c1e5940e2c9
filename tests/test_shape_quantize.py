"""Executable-shape quantization (config.rect_quantize_shapes +
models/rect_scene.ShapeBucketLedger): one compiled executable set must be
able to serve a whole multi-view scan — the rect analog of the reference
binary computing instantly on any shape (main.cpp:973) instead of paying
a per-(view-count, rect-shape) remote compile."""
import jax
import jax.numpy as jnp
import numpy as np

from gipuma_tpu.config import AlgorithmParams
from gipuma_tpu.geometry.camera import FAKE_BASELINE
from gipuma_tpu.models.rect_scene import ShapeBucketLedger, build_rect_scene
from gipuma_tpu.ops import checkerboard as cb
from gipuma_tpu.ops.rect_cost import rect_multiview_cost
from gipuma_tpu.utils.synthetic import plane_scene


def _setup(h=48, w=64, **overrides):
    images, rig, gt_depth, _ = plane_scene(
        num_cams=5, h=h, w=w, focal=100.0, plane_depth=5.0,
        slant=(0.2, -0.1))
    overrides.setdefault("box_hsize", 9)
    overrides.setdefault("box_vsize", 9)
    params = AlgorithmParams(
        iterations=2, n_best=2, seed=0, max_views=6,
        **overrides).with_depth_range(3.0, 8.0, rig.f, FAKE_BASELINE)
    return images, rig, gt_depth, params


def _plane_cands(scene, h, w2, parity=0):
    x = cb.active_x(h, w2, parity)
    y = cb.active_y(h, w2)
    n = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, -1.0], jnp.float32), (h, w2, 3))
    d = jnp.full((h, w2), 5.0, jnp.float32)
    return x, y, n, d


def test_quantized_shapes_and_cost_equality():
    """Quantized scenes pad shapes/views but must produce BITWISE the same
    multiview cost at every active pixel (padding is skipped work, not
    changed work)."""
    images, rig, gt, params = _setup()
    h, w = images[0].shape
    pq = params.replace(rect_quantize_shapes=True, rect_quantum_rows=64,
                        rect_quantum_cols=256, rect_quantum_range=64.0)

    scene0, info0 = build_rect_scene(images, rig, [1, 2, 3, 4], params,
                                     3.0, 8.0)
    scene1, info1 = build_rect_scene(images, rig, [1, 2, 3, 4], pq,
                                     3.0, 8.0)

    hrp, wrp = info1["rect_shape_padded"]
    assert hrp % 64 == 0 and wrp % 256 == 0, (hrp, wrp)
    # View axis padded to max_views with zero-work dummies.
    assert scene1.ref_rect.shape[0] == 6
    assert scene1.view_valid.shape[0] == 6
    assert float(scene1.view_valid[4]) == 0.0
    assert float(scene1.view_valid[3]) == 1.0
    b1 = info1["shape_bucket"]
    assert b1["views"] == 6 and b1["span_perm"] % 2 == 0

    _, _, n, d = _plane_cands(scene0, h, w // 2)
    c0 = np.asarray(rect_multiview_cost(scene0, params, 0, n, d))
    c1 = np.asarray(rect_multiview_cost(scene1, pq, 0, n, d))
    np.testing.assert_array_equal(c0, c1)


def test_ledger_unifies_buckets_across_views():
    """Two reference views of a scan (different subset sizes, different
    rect footprints) must land on IDENTICAL static scene shapes once built
    through one ledger — shape equality is executable-cache equality."""
    images, rig, gt, params = _setup()
    pq = params.replace(rect_quantize_shapes=True)
    ledger = ShapeBucketLedger()

    # Simulate a scan: same image shape, different selection sizes.
    sA, iA = build_rect_scene(images, rig, [1, 2, 3, 4], pq, 3.0, 8.0,
                              ledger=ledger)
    sB, iB = build_rect_scene(images, rig, [2, 3], pq, 3.0, 8.0,
                              ledger=ledger)

    shapes_a = [jnp.shape(x) for x in jax.tree.leaves(sA)]
    shapes_b = [jnp.shape(x) for x in jax.tree.leaves(sB)]
    assert shapes_a == shapes_b, "scenes would compile separate executables"
    assert iA["shape_bucket"] == iB["shape_bucket"]


def test_quantized_engine_quality():
    """End-to-end: the quantized scene must recover the plane exactly as
    well as the engine's normal quality bar."""
    from gipuma_tpu.models.patchmatch import finalize, run_patchmatch

    images, rig, gt, params = _setup()
    pq = params.replace(rect_quantize_shapes=True, iterations=3)
    scene, _ = build_rect_scene(images, rig, [1, 2, 3, 4], pq, 3.0, 8.0)
    state = run_patchmatch(scene, pq, jax.random.PRNGKey(0),
                           cost_fn=rect_multiview_cost)
    depth, _, _ = map(np.asarray, finalize(state, scene))
    interior = np.s_[10:-10, 10:-10]
    err = np.abs(depth[interior] - gt[interior]) / gt[interior]
    frac_good = np.mean(err < 0.02)
    assert frac_good > 0.85, (f"only {frac_good:.2%} within 2%; "
                              f"median {np.median(err):.4f}")
