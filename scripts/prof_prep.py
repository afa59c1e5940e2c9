"""Profile host-side rect scene build (prep) at dino scale."""
import cProfile
import pstats
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

from gipuma_tpu.config import PRESETS
from gipuma_tpu.geometry.camera import FAKE_BASELINE
from gipuma_tpu.models.rect_scene import build_rect_scene
from gipuma_tpu.models.scene import build_scene
from gipuma_tpu.utils.synthetic import plane_scene


def main():
    h, w, n_views = 480, 640, 7
    images, rig, gt, _ = plane_scene(num_cams=n_views, h=h, w=w, focal=800.0,
                                     plane_depth=5.0, slant=(0.2, -0.1))
    depth_min, depth_max = 3.0, 8.0
    params = PRESETS["middlebury"].replace(seed=0, cost_path="rect")
    params = params.with_depth_range(depth_min, depth_max, rig.f,
                                     FAKE_BASELINE)
    subset = list(range(1, n_views))

    t0 = time.perf_counter()
    base = build_scene(images, rig, subset, params, depth_min, depth_max,
                       lite=True)
    t1 = time.perf_counter()
    print(f"build_scene: {t1 - t0:.2f}s", flush=True)

    pr = cProfile.Profile()
    pr.enable()
    scene, info = build_rect_scene(images, rig, subset, params,
                                   depth_min, depth_max, base=base)
    pr.disable()
    t2 = time.perf_counter()
    print(f"build_rect_scene: {t2 - t1:.2f}s", flush=True)
    st = pstats.Stats(pr)
    st.sort_stats("cumulative").print_stats(25)


if __name__ == "__main__":
    sys.exit(main())
