"""gipuma_tpu — a TPU-native massively-parallel multi-view stereo framework.

A from-scratch JAX/Pallas/pjit rebuild of the capabilities of Gipuma
(Galliani, Lasinger, Schindler — "Massively Parallel Multiview Stereopsis
by Surface Normal Diffusion", ICCV 2015; reference CUDA implementation
kysucix/gipuma), redesigned for TPU hardware: dense checkerboard
half-grid sweeps, gather-free reference-window access, rank-1 homography
warps, deterministic threaded PRNG, and pjit sharding over views and
depth-map jobs.
"""
__version__ = "0.1.0"

import os as _os


def _init_compile_cache() -> None:
    """Enable JAX's persistent compilation cache (off by default in jax).

    TPU compiles for the fused Pallas sweep executables take minutes
    through the remote compile service; the cache makes them one-time per
    scene shape across processes.  Override the location with
    JAX_COMPILATION_CACHE_DIR, or set GIPUMA_TPU_NO_CACHE=1 to disable.
    """
    if _os.environ.get("GIPUMA_TPU_NO_CACHE"):
        return
    cache_dir = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.path.dirname(_os.path.dirname(__file__)),
                      ".jax_cache"))
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


_init_compile_cache()

from .config import AlgorithmParams, FusionParams, CostCombination, MAXCOST, PRESETS
