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

from .config import AlgorithmParams, FusionParams, CostCombination, MAXCOST, PRESETS
