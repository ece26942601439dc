"""Checkpoint save/restore via orbax.

The reference saves ``tf.train.Checkpoint(optimizer, model)`` only when the
test loss improves (train.py:96, 181-184) and restores with
``expect_partial()`` for inference (model.py:81-83).  Orbax gives the same
best-only policy plus free train-resume (optimizer state is saved in both).
"""

from __future__ import annotations

import os
import threading
from typing import Optional

import jax
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


def save_checkpoint(path: str, state) -> None:
    """Overwrite-save the train state at ``path`` (a directory)."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, _to_save_tree(jax.device_get(state)), force=True)


class AsyncCheckpointWriter:
    """Background-thread checkpoint writer.

    ``device_get`` of the full train state is the expensive part on this
    environment (minutes through the tunneled device); overlapping it with
    the next epoch keeps the chips busy. Only one save is in flight — a new
    request waits for the previous one, preserving best-checkpoint ordering.
    """

    def __init__(self):
        self._thread: Optional[threading.Thread] = None

    def save(self, path: str, state) -> None:
        self.wait()
        # snapshot on device first: the train loop donates state buffers to
        # the next step, which would race with the thread's device_get
        import jax.numpy as jnp

        snapshot = jax.tree.map(jnp.copy, state)
        self._thread = threading.Thread(
            target=save_checkpoint, args=(path, snapshot), daemon=True)
        self._thread.start()

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None


def restore_train_state(path: str, template_state):
    """Restore a full train state (shapes/dtypes from ``template_state``)."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, _to_save_tree(template_state))
    return template_state.replace(**restored)


def restore_model_variables(path: str, template_state) -> dict:
    """Inference-style restore (model.py:81-83): just params + batch_stats."""
    state = restore_train_state(path, template_state)
    return {"params": state.params, "batch_stats": state.batch_stats}
