"""End-to-end pipeline tests: run_batch with prep/compute pipelining,
prepare_job/run_prepared_job split, and output artifacts."""
import json

import numpy as np

from gipuma_tpu.config import AlgorithmParams
from gipuma_tpu.io.vis import save_png
from gipuma_tpu.pipeline import prepare_job, run_batch, run_prepared_job
from gipuma_tpu.utils.synthetic import make_ring_P, plane_scene


def _write_scene(tmp_path, images, Ps):
    paths = []
    pdir = tmp_path / "cams"
    pdir.mkdir()
    for i, (im, P) in enumerate(zip(images, Ps)):
        name = f"cam{i:03d}.png"
        save_png(tmp_path / name, np.clip(im, 0, 255).astype(np.uint8))
        (pdir / f"{name}.P").write_text(
            "\n".join(" ".join(f"{v:.10g}" for v in row) for row in P))
        paths.append(str(tmp_path / name))
    return paths, str(pdir)


def test_run_batch_pipelined(tmp_path):
    images, rig, gt, _ = plane_scene(num_cams=4, h=48, w=64, focal=90.0,
                                     plane_depth=5.0)
    Ps = make_ring_P(4, 48, 64, 90.0, target_depth=5.0)
    paths, p_folder = _write_scene(tmp_path, images, Ps)
    params = AlgorithmParams(box_hsize=7, box_vsize=7, iterations=2,
                             depth_min=3.0, depth_max=8.0,
                             min_angle=0.01, max_angle=60.0)
    results = run_batch(paths, params, tmp_path / "results",
                        p_folder=p_folder, ref_indices=[0, 1])
    assert len(results) == 2
    for r, ref in zip(results, (0, 1)):
        out = tmp_path / "results" / f"cam{ref:03d}"
        assert (out / "disp.dmb").exists()
        assert (out / "results.txt").exists()
        rec = json.loads((out / "results.txt").read_text())
        assert rec["ref_name"] == f"cam{ref:03d}.png"
        assert np.isfinite(r.depth).all()
    # Resume semantics: skip_existing must skip both finished views.
    again = run_batch(paths, params, tmp_path / "results",
                      p_folder=p_folder, ref_indices=[0, 1],
                      skip_existing=True)
    assert again == []


def test_prepare_then_run_matches_compute(tmp_path):
    from gipuma_tpu.pipeline import compute_depthmap
    images, rig, gt, _ = plane_scene(num_cams=4, h=48, w=64, focal=90.0,
                                     plane_depth=5.0)
    Ps = make_ring_P(4, 48, 64, 90.0, target_depth=5.0)
    params = AlgorithmParams(box_hsize=7, box_vsize=7, iterations=1,
                             depth_min=3.0, depth_max=8.0,
                             min_angle=0.01, max_angle=60.0)
    job = prepare_job(images, Ps, params)
    r1 = run_prepared_job(job)
    r2 = compute_depthmap(images, Ps, params)
    np.testing.assert_array_equal(r1.depth, r2.depth)
