"""Multi-host scan distribution (parallel/distributed.py): partition
properties and the filesystem-resume cooperation of simulated hosts.

True multi-process jax.distributed runs need a pod; these tests exercise
the partition math and the all-hosts-together completion semantics in one
process (process_index passed explicitly), which is exactly the code path
a real pod runs — jax.distributed only changes where the indices come
from."""
import numpy as np

from gipuma_tpu.config import AlgorithmParams
from gipuma_tpu.io.vis import save_png
from gipuma_tpu.parallel.distributed import owned_jobs, run_batch_distributed
from gipuma_tpu.utils.synthetic import make_ring_P, plane_scene


def test_owned_jobs_partition():
    for n_jobs in (1, 5, 8, 17):
        for P in (1, 2, 3, 8):
            blocks = [owned_jobs(n_jobs, p, P) for p in range(P)]
            flat = [j for b in blocks for j in b]
            assert flat == list(range(n_jobs))          # disjoint + complete
            sizes = [len(b) for b in blocks]
            assert max(sizes) - min(sizes) <= 1          # balanced


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


def test_two_simulated_hosts_complete_a_scan(tmp_path):
    images, _, _, _ = plane_scene(num_cams=4, h=48, w=64, focal=90.0,
                                  plane_depth=5.0)
    Ps = make_ring_P(4, 48, 64, 90.0, target_depth=5.0)
    paths, p_folder = _write_scene(tmp_path, images, Ps)
    params = AlgorithmParams(box_hsize=7, box_vsize=7, iterations=1,
                             depth_min=3.0, depth_max=8.0,
                             min_angle=0.01, max_angle=60.0)
    root = tmp_path / "results"
    for p in range(2):   # each "host" runs its block against shared storage
        run_batch_distributed(paths, params, root, p_folder=p_folder,
                              ref_indices=[0, 1, 2],
                              process_index=p, process_count=2)
    for ref in range(3):
        assert (root / f"cam{ref:03d}" / "disp.dmb").exists()
    # Elastic restart: any host re-running finds everything done.
    again = run_batch_distributed(paths, params, root, p_folder=p_folder,
                                  ref_indices=[0, 1, 2],
                                  process_index=0, process_count=1)
    assert again == []
