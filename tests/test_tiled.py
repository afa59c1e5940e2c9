"""Spatial tile sharding: row bands + halo exchange vs single device."""
import numpy as np
import jax
import pytest

from gipuma_tpu.config import AlgorithmParams
from gipuma_tpu.geometry.camera import FAKE_BASELINE
from gipuma_tpu.models.patchmatch import run_patchmatch
from gipuma_tpu.models.scene import build_scene
from gipuma_tpu.parallel.tiled import run_patchmatch_tile_sharded
from gipuma_tpu.utils.synthetic import plane_scene
from jax.sharding import Mesh


@pytest.fixture(scope="module")
def setup():
    images, rig, gt, _ = plane_scene(num_cams=3, h=24, w=32, focal=60.0)
    params = AlgorithmParams(box_hsize=5, box_vsize=5, iterations=1,
                             refine=False,    # propagation is deterministic
                             ).with_depth_range(3.0, 8.0, rig.f, FAKE_BASELINE)
    scene = build_scene(images, rig, [1, 2], params, 3.0, 8.0)
    return params, scene, gt


def tile_mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), axis_names=("tile",))


@pytest.mark.parametrize("n", [2])
def test_tiled_propagation_matches_single(setup, n):
    """With refinement off, the tile-sharded run is bitwise-equivalent to
    single-device (same global init, halo exchange == in-core neighbor
    reads)."""
    params, scene, gt = setup
    key = jax.random.PRNGKey(0)
    ref = run_patchmatch(scene, params, key)
    out = run_patchmatch_tile_sharded(scene, params, key, tile_mesh(n))
    np.testing.assert_allclose(np.asarray(out.cost), np.asarray(ref.cost),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.planes), np.asarray(ref.planes),
                               rtol=1e-6, atol=1e-6)


def test_tiled_with_refinement_converges(setup):
    params, scene, gt = setup
    params = params.replace(refine=True)
    key = jax.random.PRNGKey(1)
    out = run_patchmatch_tile_sharded(scene, params, key, tile_mesh(2))
    from gipuma_tpu.models.patchmatch import finalize
    depth, _, cost = map(np.asarray, finalize(out, scene))
    assert np.isfinite(depth).all()
    interior = np.s_[6:-6, 6:-6]
    err = np.abs(depth[interior] - gt[interior]) / gt[interior]
    assert np.median(err) < 0.05
