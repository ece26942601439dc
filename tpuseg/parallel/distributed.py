"""Multi-host (DCN-spanning) initialization.

The reference is single-worker by construction (MirroredStrategy,
sbatch_train.sh:7 — one node). The TPU-native extension (SURVEY.md §2.3) is
straightforward: each host in a pod slice calls
:func:`initialize_distributed`, after which ``jax.devices()`` spans the
slice and the existing mesh/sharding code works unchanged — GSPMD routes
gradient psums over ICI within a slice and DCN across slices when the mesh
is laid out with :func:`make_hybrid_mesh`.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with TPU-pod auto-detection when args are
    omitted (the common TPU VM case)."""
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
    arr = np.asarray(devices).reshape(n // ici_spatial, ici_spatial)
    return Mesh(arr, ("data", "spatial"))


def process_local_batch_slice(global_batch: int) -> slice:
    """Which slice of the global batch this host should feed — reader
    processes are per-host, so each host loads only its shard."""
    per_host = global_batch // jax.process_count()
    start = jax.process_index() * per_host
    return slice(start, start + per_host)
