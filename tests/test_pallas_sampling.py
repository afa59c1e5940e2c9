"""Pallas sampler vs the XLA reference sampler (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from gipuma_tpu.ops.pallas_sampling import bilinear_sample_chw
from gipuma_tpu.ops.sampling import bilinear_sample


@pytest.mark.parametrize("C", [1, 3])
def test_matches_xla_sampler(rng, C):
    H, W = 48, 128
    src = rng.random((H, W, C)).astype(np.float32)
    src_chw = jnp.asarray(np.moveaxis(src, -1, 0))
    Hs, Ws = 40, 200   # non-multiple-of-128 sample width exercises padding
    x = jnp.asarray((rng.random((Hs, Ws)) * (W + 20) - 10).astype(np.float32))
    y = jnp.asarray((rng.random((Hs, Ws)) * (H + 20) - 10).astype(np.float32))

    ref = bilinear_sample(jnp.asarray(src), x, y)
    got = bilinear_sample_chw(src_chw, x, y, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_coherent_coords(rng):
    """Typical warp-like coherent coordinates (small row span)."""
    H, W = 64, 256
    src = rng.random((H, W, 1)).astype(np.float32)
    src_chw = jnp.asarray(np.moveaxis(src, -1, 0))
    ys, xs = np.meshgrid(np.arange(32), np.arange(130), indexing="ij")
    x = jnp.asarray((xs * 1.7 + 3.2).astype(np.float32))
    y = jnp.asarray((ys * 1.3 + 5.1 + 0.01 * xs).astype(np.float32))
    ref = bilinear_sample(jnp.asarray(src), x, y)
    got = bilinear_sample_chw(src_chw, x, y, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_engine_with_pallas_sampler_matches():
    """Full PatchMatch run: pallas-sampler path == XLA path (interpret)."""
    import jax
    from gipuma_tpu.config import AlgorithmParams
    from gipuma_tpu.geometry.camera import FAKE_BASELINE
    from gipuma_tpu.models.patchmatch import run_patchmatch
    from gipuma_tpu.models.scene import build_scene
    from gipuma_tpu.utils.synthetic import plane_scene

    images, rig, _, _ = plane_scene(num_cams=3, h=24, w=32, focal=50.0)
    params = AlgorithmParams(box_hsize=5, box_vsize=5, iterations=1,
                             ).with_depth_range(3.0, 8.0, rig.f, FAKE_BASELINE)
    scene = build_scene(images, rig, [1, 2], params, 3.0, 8.0)
    key = jax.random.PRNGKey(0)
    s_xla = run_patchmatch(scene, params, key)
    s_pal = run_patchmatch(scene, params.replace(use_pallas_sampler=True), key)
    np.testing.assert_allclose(np.asarray(s_pal.cost), np.asarray(s_xla.cost),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_pal.planes),
                               np.asarray(s_xla.planes), rtol=1e-5, atol=1e-5)
