"""View-sharded fusion must reproduce the single-device fusion exactly."""
import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from gipuma_tpu.config import FusionParams
from gipuma_tpu.fusion.fuse import fuse_depthmaps
from gipuma_tpu.fusion.sharded import fuse_depthmaps_sharded
from tests.test_fusion import make_gt_depthmaps


def _mesh(k):
    return Mesh(np.asarray(jax.devices()[:k]), axis_names=("view",))


@pytest.mark.parametrize("k", [2, 4])
def test_sharded_matches_single(k):
    depths, normals, Ps, (n, d) = make_gt_depthmaps(num_cams=4)
    params = FusionParams(disp_thresh=0.5, normal_thresh=30.0,
                          num_consistent=2)
    pts, nrm, col = fuse_depthmaps(depths, normals, Ps, params, f=80.0)
    pts_s, nrm_s, col_s = fuse_depthmaps_sharded(
        depths, normals, Ps, params, _mesh(k), f=80.0)
    assert pts_s.shape == pts.shape
    np.testing.assert_allclose(pts_s, pts, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(nrm_s, nrm, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(col_s, col)


def test_sharded_view_padding():
    """View count not divisible by the shard count (padded views must be
    inert)."""
    depths, normals, Ps, (n, d) = make_gt_depthmaps(num_cams=5)
    params = FusionParams(disp_thresh=0.5, normal_thresh=30.0,
                          num_consistent=2)
    pts, _, _ = fuse_depthmaps(depths, normals, Ps, params, f=80.0)
    pts_s, _, _ = fuse_depthmaps_sharded(depths, normals, Ps, params,
                                         _mesh(4), f=80.0)
    np.testing.assert_allclose(pts_s, pts, rtol=1e-5, atol=1e-5)
