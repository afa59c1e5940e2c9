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
              max_view_shards: int = 4) -> Mesh:
    """Factor available devices into a (job, view) mesh.

    By default the view axis gets the largest divisor of n that is at most
    `max_view_shards` (the cost all-gather is cheap but the view axis is
    short — usually <= 9 real views), and the job axis gets the rest.
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if view_shards is None:
        view_shards = max(d for d in range(1, min(max_view_shards, n) + 1)
                          if n % d == 0)
    assert n % view_shards == 0
    job = n // view_shards
    arr = np.asarray(devices).reshape(job, view_shards)
    return Mesh(arr, axis_names=("job", "view"))
