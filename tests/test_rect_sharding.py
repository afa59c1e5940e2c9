"""View-sharded rect fast path on the 8-device virtual CPU mesh: must match
the single-device rect engine exactly (the all-gather combination is
mathematically identical to the stacked view scan)."""
import numpy as np
import jax
import pytest

from gipuma_tpu.config import AlgorithmParams
from gipuma_tpu.geometry.camera import FAKE_BASELINE
from gipuma_tpu.models.patchmatch import run_patchmatch
from gipuma_tpu.models.rect_scene import build_rect_scene
from gipuma_tpu.ops.rect_cost import rect_multiview_cost
from gipuma_tpu.parallel.mesh import make_mesh
from gipuma_tpu.parallel.sharded import run_patchmatch_view_sharded
from gipuma_tpu.utils.synthetic import plane_scene


@pytest.fixture(scope="module")
def setup():
    images, rig, gt_depth, _ = plane_scene(num_cams=6, h=32, w=40, focal=70.0)
    params = AlgorithmParams(
        box_hsize=7, box_vsize=7, iterations=1, cost_path="rect",
    ).with_depth_range(3.0, 8.0, rig.f, FAKE_BASELINE)
    scene, _ = build_rect_scene(images, rig, [1, 2, 3, 4, 5], params,
                                3.0, 8.0)
    return params, scene


def test_rect_view_sharded_matches_single(setup):
    params, scene = setup
    key = jax.random.PRNGKey(0)
    ref = run_patchmatch(scene, params, key, cost_fn=rect_multiview_cost)

    mesh = make_mesh(8, view_shards=4)   # pads 5 views -> 8
    sharded = run_patchmatch_view_sharded(scene, params, key, mesh)

    np.testing.assert_allclose(np.asarray(sharded.cost), np.asarray(ref.cost),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sharded.planes),
                               np.asarray(ref.planes), rtol=1e-4, atol=1e-5)
