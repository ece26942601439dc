"""device_prefetch: ordering, error propagation, and shutdown semantics.

The producer thread must stop consuming the (shared) upstream iterator the
moment the consumer closes the generator, and must never deadlock on its
terminal sentinel put — including at depth=1 (review r3)."""

import threading
import time

import numpy as np
import pytest

from tpuseg.train.prefetch import device_prefetch


def _batch(i):
    return (np.full((2, 4, 4, 1), i, np.float32),
            np.full((2, 4, 4, 2), i, np.float32))


def test_yields_all_batches_in_order():
    it = device_prefetch(iter([_batch(i) for i in range(5)]))
    got = [float(img[0, 0, 0, 0]) for img, _ in it]
    assert got == [0.0, 1.0, 2.0, 3.0, 4.0]


def test_propagates_producer_exception():
    def gen():
        yield _batch(0)
        raise RuntimeError("reader died")

    it = device_prefetch(gen())
    next(it)
    with pytest.raises(RuntimeError, match="reader died"):
        next(it)


@pytest.mark.parametrize("depth", [1, 2])
def test_close_stops_upstream_consumption(depth):
    """After close(), the producer must not pull any further batches from
    the upstream iterator — the trainer closes the test iterator each test
    epoch precisely so the sequential test stream isn't silently drained."""
    pulled = []
    done = threading.Event()

    def gen():
        for i in range(1000):
            pulled.append(i)
            yield _batch(i)
        done.set()

    it = device_prefetch(gen(), depth=depth)
    next(it)
    it.close()
    count_at_close = len(pulled)
    time.sleep(0.3)  # were the producer still running, it would race ahead
    assert not done.is_set()
    # at most one pull can be in flight at close time; none may follow
    assert len(pulled) <= count_at_close + 1
    final = len(pulled)
    time.sleep(0.2)
    assert len(pulled) == final


def test_depth1_early_close_does_not_leak_thread():
    """The terminal sentinel put must not block forever when the consumer
    drained before the producer's last data put landed (deadlocked daemon
    threads pin device batches for the process lifetime)."""
    before = threading.active_count()
    for _ in range(5):
        it = device_prefetch(iter([_batch(i) for i in range(50)]), depth=1)
        next(it)
        it.close()
    deadline = time.time() + 5.0
    while time.time() < deadline and threading.active_count() > before:
        time.sleep(0.05)
    assert threading.active_count() <= before
