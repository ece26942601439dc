"""Multi-host (DCN-spanning) training support.

The reference is single-worker by construction (MirroredStrategy,
sbatch_train.sh:7 — one node). The TPU-native extension (SURVEY.md §2.3):
each host in a pod slice calls :func:`initialize_distributed`, after which
``jax.devices()`` spans the slice and the existing mesh/sharding code works
unchanged — GSPMD routes gradient psums over ICI within a slice and DCN
across slices when the mesh is laid out with :func:`make_hybrid_mesh`.

Wiring (used by tpuseg.train.trainer when ``jax.process_count() > 1``):

- the trainer builds its mesh with :func:`make_hybrid_mesh` so each host's
  device block is contiguous on the 'data' axis;
- each host's readers produce only ``global_batch // process_count``
  samples (:func:`process_local_batch_size`); reader worker counts scale
  with *local* device count;
- the prefetcher assembles the global sharded batch from per-host data with
  :func:`global_batch_from_local` (``jax.make_array_from_process_local_data``)
  — no host ever materializes the full global batch.

Failure semantics: a host that dies (reader crash, preemption) surfaces on
its peers as a collective/communicator timeout at their next step, which
unwinds through the trainer's reader-shutdown ``finally`` — the surviving
processes exit rather than hang, and the run resumes from the best
checkpoint with ``--resume_checkpoint`` (each process restores
host-locally).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with TPU-pod auto-detection when args are
    omitted (the common TPU VM case; Slurm and JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars are also auto-detected).

    On the CPU platform, cross-process collectives need an explicit
    implementation (Gloo); TPU ICI needs nothing. Selecting it here makes
    ``JAX_PLATFORMS=cpu tpuseg-train --multihost 1`` work for laptop/CI
    dry-runs of the multi-host path."""
    import os

    platforms = ""
    try:
        platforms = jax.config.jax_platforms or ""
    except Exception:
        pass
    platforms = platforms or os.environ.get("JAX_PLATFORMS", "")
    if platforms.split(",")[0] == "cpu":
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass  # older jax: no CPU cross-process collectives
    # jax auto-detects JAX_COORDINATOR_ADDRESS but has no env spelling for
    # the process count/id outside managed clusters (TPU metadata, Slurm,
    # OMPI); honor the conventional names so plain multi-process runs —
    # e.g. two laptop/CI processes — need no code changes
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_hybrid_mesh(ici_spatial: int = 1) -> Mesh:
    """(data, spatial) mesh over all global devices with hosts contiguous on
    the data axis: the per-host device block stays adjacent so data-parallel
    psums ride ICI first and cross DCN only at the slice boundary."""
    devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n = len(devices)
    if n % ici_spatial:
        raise ValueError(f"{n} devices not divisible by spatial={ici_spatial}")
    # each spatial group must live inside one host: a group straddling hosts
    # would both put conv halo exchanges on DCN and break the data axis's
    # process-contiguity, which global_batch_from_local's per-host slicing
    # (and make_array_from_process_local_data's replica contract) relies on
    local = jax.local_device_count()
    if local % ici_spatial:
        raise ValueError(
            f"{local} local devices per host not divisible by "
            f"spatial={ici_spatial}: spatial groups would straddle hosts")
    arr = np.asarray(devices).reshape(n // ici_spatial, ici_spatial)
    return Mesh(arr, ("data", "spatial"))


def process_local_batch_size(global_batch: int,
                              data_shards: Optional[int] = None) -> int:
    """How many samples this host's readers must produce per step.

    ``data_shards`` is the mesh's global data-axis size (defaults to all
    devices — the trainer's pure-DP hybrid mesh); under spatial partitioning
    pass ``mesh.shape["data"]``.
    """
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by {n} hosts")
    local = global_batch // n
    # fail here, with the numbers named, rather than deep inside the prefetch
    # thread: a batch-sharded global array needs one whole sample per data
    # shard, so the local slice must split across this host's data shards
    # (hosts are contiguous on the data axis per make_hybrid_mesh)
    shards_per_host = max((data_shards or jax.device_count()) // n, 1)
    if local % shards_per_host:
        raise ValueError(
            f"per-host batch {local} (global {global_batch} / {n} hosts) not "
            f"divisible by {shards_per_host} data shards per host")
    return local


def process_local_batch_slice(global_batch: int) -> slice:
    """Which slice of the global batch this host feeds — hosts are laid out
    contiguously on the 'data' axis by :func:`make_hybrid_mesh`, so host k
    owns rows [k*per, (k+1)*per)."""
    per = process_local_batch_size(global_batch)
    start = jax.process_index() * per
    return slice(start, start + per)


def global_batch_from_local(local: np.ndarray, sharding: NamedSharding) -> jax.Array:
    """Assemble the global sharded batch from this host's slice. Single-host
    degenerates to a device_put; multi-host uses
    ``jax.make_array_from_process_local_data`` so only local shards are ever
    materialized on each host."""
    if jax.process_count() == 1:
        return jax.device_put(local, sharding)
    return jax.make_array_from_process_local_data(sharding, local)
