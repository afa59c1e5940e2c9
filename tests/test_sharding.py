"""Multi-device sharding tests on the 8-device virtual CPU mesh.

Checks that the view-sharded and job+view-sharded runners produce exactly
the same results as the single-device engine (the all-gather combination is
mathematically identical to the serial view loop).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gipuma_tpu.config import AlgorithmParams
from gipuma_tpu.geometry.camera import FAKE_BASELINE
from gipuma_tpu.models.patchmatch import run_patchmatch
from gipuma_tpu.models.scene import build_scene
from gipuma_tpu.parallel.mesh import make_mesh
from gipuma_tpu.parallel.sharded import (run_patchmatch_batch_sharded,
                                         run_patchmatch_view_sharded,
                                         stack_scenes)
from gipuma_tpu.utils.synthetic import plane_scene


@pytest.fixture(scope="module")
def setup():
    images, rig, gt_depth, _ = plane_scene(num_cams=6, h=32, w=40, focal=70.0)
    params = AlgorithmParams(
        box_hsize=7, box_vsize=7, iterations=1,
    ).with_depth_range(3.0, 8.0, rig.f, FAKE_BASELINE)
    scene = build_scene(images, rig, [1, 2, 3, 4, 5], params, 3.0, 8.0)
    return images, rig, params, scene


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_view_sharded_matches_single(setup):
    images, rig, params, scene = setup
    key = jax.random.PRNGKey(0)
    ref = run_patchmatch(scene, params, key)

    mesh = make_mesh(8, view_shards=4)
    assert mesh.shape == {"job": 2, "tile": 1, "view": 4}
    sharded = run_patchmatch_view_sharded(scene, params, key, mesh)

    np.testing.assert_allclose(np.asarray(sharded.cost), np.asarray(ref.cost),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sharded.planes),
                               np.asarray(ref.planes), rtol=1e-4, atol=1e-5)


def test_batch_sharded_matches_single(setup):
    images, rig, params, scene = setup
    keys = jax.random.split(jax.random.PRNGKey(5), 2)

    refs = [run_patchmatch(scene, params, k) for k in keys]

    mesh = make_mesh(8, view_shards=4)
    scenes = stack_scenes([scene, scene])
    out = run_patchmatch_batch_sharded(scenes, params, keys, mesh)

    assert out.cost.shape[0] == 2
    for i, ref in enumerate(refs):
        np.testing.assert_allclose(np.asarray(out.cost[i]),
                                   np.asarray(ref.cost), rtol=1e-5, atol=1e-5)


def test_view_padding_is_neutral(setup):
    """Padded (invalid) views must not change results: 5 views on a 4-way
    view mesh pads to 8."""
    images, rig, params, scene = setup
    key = jax.random.PRNGKey(2)
    ref = run_patchmatch(scene, params, key)
    mesh = make_mesh(8, view_shards=2)   # pads 5 -> 6
    sharded = run_patchmatch_view_sharded(scene, params, key, mesh)
    np.testing.assert_allclose(np.asarray(sharded.cost), np.asarray(ref.cost),
                               rtol=1e-5, atol=1e-5)
