"""Device-mesh construction for the MVS workload.

Mesh axes (the reference's parallelism dimensions mapped to chips,
SURVEY.md §2.7):

* ``job``  — data parallelism over depth-map jobs (reference views /
  scans); replaces the reference's one-process-per-view shell loops
  (scripts/dino.sh:28-51).  Communication-free; scales over DCN.
* ``view`` — the source-view axis of the multiview cost; replaces the
  serial per-pixel view loop (gipuma.cu:742-778).  Needs one small
  all-gather of per-view costs per candidate batch; rides ICI.
"""
from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, view_shards: int | None = None,
              max_view_shards: int = 4, tile_shards: int = 1) -> Mesh:
    """Factor available devices into a (job, tile, view) mesh.

    By default the view axis gets the largest divisor of n that is at most
    `max_view_shards` (the cost all-gather is cheap but the view axis is
    short — usually <= 9 real views), the tile axis (image row bands,
    parallel/tiled_rect.py — for images too large for one chip) defaults
    to 1, and the job axis gets the rest.
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    assert n % tile_shards == 0
    nv_budget = n // tile_shards
    if view_shards is None:
        view_shards = max(d for d in
                          range(1, min(max_view_shards, nv_budget) + 1)
                          if nv_budget % d == 0)
    assert nv_budget % view_shards == 0
    job = nv_budget // view_shards
    arr = np.asarray(devices).reshape(job, tile_shards, view_shards)
    return Mesh(arr, axis_names=("job", "tile", "view"))
