"""Quick fusion timing probe at reduced N (iteration harness for
fusion/fuse.py optimizations).  JAX_PLATFORMS=cpu python scripts/fusion_probe.py [N]"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from gipuma_tpu.config import FusionParams
from gipuma_tpu.fusion.fuse import fuse_depthmaps
from gipuma_tpu.utils.synthetic import intersect_plane, make_ring_P


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    h, w = 600, 800
    focal, depth_mid = 1000.0, 550.0
    n_pl = np.array([0.15, -0.1, 1.0])
    n_pl /= np.linalg.norm(n_pl)
    d_pl = -n_pl @ np.array([0.0, 0.0, depth_mid])
    rng = np.random.default_rng(0)
    Ps = make_ring_P(N, h, w, focal, target_depth=depth_mid,
                     radius=depth_mid / 4.0)
    depths, normals = [], []
    for P in Ps:
        X, dep = intersect_plane(P, h, w, n_pl, d_pl)
        dep = dep * (1.0 + rng.normal(scale=1e-3, size=dep.shape))
        depths.append(dep.astype(np.float32))
        normals.append(np.broadcast_to(n_pl, (h, w, 3)).astype(np.float32))
    depths = np.stack(depths)
    normals = np.stack(normals)
    params = FusionParams(disp_thresh=0.25, normal_thresh=30.0,
                          num_consistent=3)
    t0 = time.perf_counter()
    pts, nrm, col = fuse_depthmaps(depths, normals, Ps, params, f=focal)
    t = time.perf_counter() - t0
    print(f"N={N}: fuse {t:.2f}s, {len(pts)} pts")


if __name__ == "__main__":
    main()
