"""Checkpoint save/restore via orbax.

The reference saves ``tf.train.Checkpoint(optimizer, model)`` only when the
test loss improves (train.py:96, 181-184) and restores with
``expect_partial()`` for inference (model.py:81-83).  Orbax gives the same
best-only policy plus free train-resume (optimizer state is saved in both).

Multi-host: the train state may hold non-fully-addressable arrays (ZeRO-1
shards the Adam moments over the global 'data' axis), which
``jax.device_get`` cannot fetch.  ``save_checkpoint`` gathers those to host
collectively (every process must call it) and only process 0 writes — all
hosts writing the same directory on shared storage would corrupt the
checkpoint (orbax ``force=True`` deletes the dir a peer is mid-write in).
"""

from __future__ import annotations

import os
import threading
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_save_tree(state) -> dict:
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "lr": state.lr,
        "rng": state.rng,
    }


def _fully_addressable(tree) -> bool:
    return all(getattr(x, "is_fully_addressable", True)
               for x in jax.tree.leaves(tree))


def _gather_to_host(tree):
    """Gather of a (possibly cross-host-sharded) state tree to host numpy on
    every process. Collective only when sharded leaves exist — then all
    processes must call it.

    Leaves are split three ways: fully-addressable -> device_get;
    replicated-but-global -> local shard read (every process already holds
    the value; ``process_allgather(tiled=False)`` would reject it and an
    allgather would be pure DCN waste); genuinely cross-host-sharded
    (ZeRO-1 moments) -> ONE ``process_allgather(tiled=True)`` over the
    sharded subtree. Never pass the MIXED tree to ``process_allgather``:
    fully-addressable leaves get STACKED along a new [num_processes] axis
    (documented host-local behavior) — e.g. the scalar ``lr`` became shape
    (P,) and the checkpoint failed to restore (review r3)."""
    from jax.experimental import multihost_utils

    def local(x):
        if getattr(x, "is_fully_addressable", True):
            return jax.device_get(x)
        # replicated: every process already holds the full value — read the
        # local copy. An allgather here is pure DCN waste, and
        # process_allgather(tiled=False) rejects global arrays outright
        # (ValueError), so replicated multi-host state could never save.
        return np.asarray(x.addressable_data(0))

    def is_sharded(x):
        return (not getattr(x, "is_fully_addressable", True)
                and not x.sharding.is_fully_replicated)

    # genuinely cross-host-sharded leaves (ZeRO-1 moments): ONE collective
    # assembly for the whole subtree — per-leaf calls would dispatch (and
    # first-compile) dozens of separate tiny cross-DCN programs per save
    leaves, treedef = jax.tree.flatten(tree)
    sharded = [x for x in leaves if is_sharded(x)]
    if sharded:
        gathered = iter(multihost_utils.process_allgather(sharded, tiled=True))
        leaves = [next(gathered) if is_sharded(x) else local(x) for x in leaves]
    else:
        leaves = [local(x) for x in leaves]
    return jax.tree.unflatten(treedef, leaves)


def _writer():
    """An orbax checkpointer that writes host-local trees from process 0
    alone. ``Checkpointer.save`` opens with a barrier over its
    ``active_processes`` — the default (all processes) DEADLOCKS when only
    process 0 calls it (review r3), so on multi-host the barrier set is
    scoped to {0}."""
    if jax.process_count() > 1:
        return ocp.StandardCheckpointer(
            multiprocessing_options=ocp.options.MultiprocessingOptions(
                primary_host=0, active_processes={0}))
    return ocp.StandardCheckpointer()


def save_checkpoint(path: str, state) -> None:
    """Overwrite-save the train state at ``path`` (a directory).

    Collective on multi-host when the state is not fully addressable: all
    processes participate in the gather, process 0 writes."""
    path = os.path.abspath(path)
    tree = _to_save_tree(state)
    if not _fully_addressable(tree):
        tree = _gather_to_host(tree)  # collective — all processes reach this
        if jax.process_index() != 0:
            return
    elif jax.process_count() > 1 and jax.process_index() != 0:
        return
    else:
        tree = jax.device_get(tree)
    with _writer() as ckptr:
        ckptr.save(path, tree, force=True)


class AsyncCheckpointWriter:
    """Background-thread checkpoint writer.

    ``device_get`` of the full train state is the expensive part on this
    environment (minutes through the tunneled device); overlapping it with
    the next epoch keeps the chips busy. Only one save is in flight — a new
    request waits for the previous one, preserving best-checkpoint ordering.

    A failed background write re-raises at the next :meth:`save` or
    :meth:`wait` — a swallowed exception would let training finish
    "successfully" with a missing or stale checkpoint.

    Multi-host: the collective host-gather runs synchronously on the caller
    thread (collectives must not race the main thread's step stream); only
    the orbax write itself moves to the background thread.
    """

    def __init__(self):
        self._thread: Optional[threading.Thread] = None
        self._error: Optional[BaseException] = None

    def _run(self, fn, *args) -> None:
        try:
            fn(*args)
        except BaseException as e:
            self._error = e

    def save(self, path: str, state) -> None:
        self.wait()
        import jax.numpy as jnp

        tree = _to_save_tree(state)
        addressable = _fully_addressable(tree)
        if not addressable or jax.process_count() > 1:
            if not addressable:
                # collective gather on the caller thread (collectives must
                # not race the step stream); result is host numpy
                tree = _gather_to_host(tree)
            else:
                # snapshot on device: the train loop donates state buffers
                # to the next step, which would race the background
                # device_get (review r3 — the single-process branch always
                # snapshotted, this one handed the thread live buffers)
                tree = jax.tree.map(jnp.copy, tree)
            if jax.process_index() != 0:
                return
            target, args = self._write_host_tree, (path, tree)
        else:
            snapshot = jax.tree.map(jnp.copy, state)
            target, args = save_checkpoint, (path, snapshot)
        self._thread = threading.Thread(
            target=self._run, args=(target,) + args, daemon=True)
        self._thread.start()

    @staticmethod
    def _write_host_tree(path: str, tree) -> None:
        path = os.path.abspath(path)
        with _writer() as ckptr:
            ckptr.save(path, jax.device_get(tree), force=True)

    def wait(self) -> None:
        """Join any in-flight write; re-raises its failure."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            error, self._error = self._error, None
            raise RuntimeError("background checkpoint write failed") from error


def _reader():
    """An orbax checkpointer for host-local restores. The default
    checkpointer syncs ALL processes (``sync_global_devices`` inside
    restore), which hangs any caller pattern where processes restore at
    different times or not at all (e.g. process 0 validating a checkpoint
    alone). Restores read host trees from shared storage, so each process
    restores independently as its own single-member group."""
    if jax.process_count() > 1:
        me = jax.process_index()
        return ocp.StandardCheckpointer(
            multiprocessing_options=ocp.options.MultiprocessingOptions(
                primary_host=me, active_processes={me},
                barrier_sync_key_prefix=f"restore_p{me}"))
    return ocp.StandardCheckpointer()


def restore_train_state(path: str, template_state):
    """Restore a full train state (shapes/dtypes from ``template_state``).

    Host-local: safe for any subset of processes to call, at any time."""
    path = os.path.abspath(path)
    with _reader() as ckptr:
        restored = ckptr.restore(path, _to_save_tree(template_state))
    return template_state.replace(**restored)


def restore_model_variables(path: str, template_state) -> dict:
    """Inference-style restore (model.py:81-83): just params + batch_stats."""
    state = restore_train_state(path, template_state)
    return {"params": state.params, "batch_stats": state.batch_stats}
