"""Multi-host orchestration: jax.distributed init + scan distribution.

The reference is a single-process, single-GPU program; its dataset scripts
distribute work by shell loop + filesystem (SURVEY.md §2.7: "Multi-scan /
multi-reference-view" parallelism, scripts/dino.sh:28-51), and its only
restart property is that finished views persist on disk (§5 "failure
detection").  The pod-scale TPU equivalents here:

* :func:`init_distributed` — `jax.distributed.initialize` from standard
  env vars or explicit args; afterwards ``jax.devices()`` is the GLOBAL
  device set and per-host compute uses ``jax.local_devices()``.
* :func:`owned_jobs` — deterministic contiguous-block partition of
  reference views across processes: the DCN "job" axis.  Blocks (not
  round-robin) keep each host's image working set small when scans are
  ordered.
* :func:`run_batch_distributed` — each host runs its partition through
  :func:`gipuma_tpu.pipeline.run_batch` (pipelined host-prep/device
  overlap) with ``skip_existing=True`` on a shared results directory:
  outputs are idempotent per view, so a restarted or re-scheduled host
  resumes exactly where the filesystem says the scan stopped — elastic
  recovery without a coordinator.

Within each host, device-level parallelism stays the (job, view) mesh of
:mod:`gipuma_tpu.parallel.mesh` / :mod:`gipuma_tpu.parallel.sharded`
(ICI); this module only adds the across-hosts axis (DCN), which is
communication-free by construction — matching how the reference's shell
scripts scale, but in-process and fault-tolerant.
"""
from __future__ import annotations

import os
from typing import Sequence


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> tuple[int, int]:
    """Initialize jax.distributed when running multi-process.

    Arguments default to the standard env vars (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID, falling back to jax's own
    auto-detection on TPU pods where none are needed).  No-op for
    single-process runs.  Returns (process_index, process_count).
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address or (num_processes or 1) > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    return jax.process_index(), jax.process_count()


def owned_jobs(n_jobs: int, process_index: int | None = None,
               process_count: int | None = None) -> list[int]:
    """The contiguous block of job indices this process owns.

    Deterministic and balanced to within one job: process p of P owns
    jobs [p*ceil .. ) of the first (n_jobs % P) oversized blocks, the
    rest get the base size.  Disjoint and complete over all processes.
    """
    if process_index is None or process_count is None:
        import jax
        process_index = jax.process_index() if process_index is None \
            else process_index
        process_count = jax.process_count() if process_count is None \
            else process_count
    base, extra = divmod(n_jobs, process_count)
    start = process_index * base + min(process_index, extra)
    size = base + (1 if process_index < extra else 0)
    return list(range(start, start + size))


def run_batch_distributed(image_paths: Sequence[str], params,
                          results_root, *,
                          ref_indices: Sequence[int] | None = None,
                          process_index: int | None = None,
                          process_count: int | None = None,
                          **run_batch_kwargs):
    """Run this host's partition of a multi-view scan.

    All hosts call this with identical arguments; each computes only its
    :func:`owned_jobs` block and writes to the shared ``results_root``.
    ``skip_existing`` is forced on, so re-running after any failure (or
    with a different host count) completes exactly the missing views.
    Returns this host's list of RunResults.
    """
    from ..pipeline import run_batch

    all_refs = list(ref_indices if ref_indices is not None
                    else range(len(image_paths)))
    mine = [all_refs[i] for i in owned_jobs(
        len(all_refs), process_index, process_count)]
    run_batch_kwargs["skip_existing"] = True
    return run_batch(image_paths, params, results_root,
                     ref_indices=mine, **run_batch_kwargs)
