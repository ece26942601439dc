"""Host->device input pipeline: double-buffered asynchronous prefetch.

Replaces the reference's ``tf.data .prefetch() +
experimental_distribute_dataset`` stage (train.py:85-90): a background
thread stacks host batches and issues ``jax.device_put`` with the target
sharding, so the DMA of batch N+1 overlaps the compute of batch N and each
device receives only its shard. Under multi-host training the host batch
is this process's slice of the global batch and the global sharded array
is assembled via ``jax.make_array_from_process_local_data``
(tpuseg.parallel.distributed.global_batch_from_local).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Tuple

import jax
import numpy as np


def device_prefetch(
    host_iter: Iterator[Tuple[np.ndarray, np.ndarray]],
    sharding=None,
    depth: int = 2,
) -> Iterator[Tuple[jax.Array, jax.Array]]:
    """Yield device-resident (images, labels), ``depth`` batches ahead."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def put_last(item) -> None:
        # Terminal put (sentinel / exception) that cannot deadlock when the
        # consumer has already left: once `stop` is set the consumer never
        # get()s again, so a Full queue means nobody needs the item. (A
        # depth=1 pipeline could otherwise block here forever when the
        # consumer's drain ran before the producer's final data put landed.)
        while True:
            try:
                q.put(item, timeout=0.1)
                return
            except queue.Full:
                if stop.is_set():
                    return

    def producer():
        it = iter(host_iter)
        try:
            while not stop.is_set():
                # stop is checked BEFORE the pull: closing the iterator must
                # not consume (and discard) one more global batch from the
                # shared reader queue — the trainer closes the test iterator
                # every test epoch precisely to stop that consumption
                try:
                    images, labels = next(it)
                except StopIteration:
                    return
                # dtypes pass through: float32 on the host-processed path,
                # compact uint16/uint8 on the raw path (cast happens on device)
                images = np.ascontiguousarray(images)
                labels = np.ascontiguousarray(labels)
                if sharding is not None:
                    from tpuseg.parallel.distributed import global_batch_from_local

                    images = global_batch_from_local(images, sharding)
                    labels = global_batch_from_local(labels, sharding)
                else:
                    images = jax.device_put(images)
                    labels = jax.device_put(labels)
                q.put((images, labels))
        except Exception as e:  # surface reader crashes to the consumer
            put_last(e)
        finally:
            put_last(None)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, Exception):
                raise item
            yield item
    finally:
        stop.set()
        # drain so the producer can exit its q.put
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
