"""CancellableQueue / prefetch_iter: the one producer-thread mechanism under
both inference IO-overlap paths (folder read-ahead, whole-slide streaming)."""

import threading
import time

import pytest

from tpuseg.utils.queues import CancellableQueue, prefetch_iter


def test_cancellable_put_returns_false_after_stop():
    q = CancellableQueue(maxsize=1)
    assert q.put("a") is True
    q.stop()
    assert q.put("b", poll_s=0.01) is False  # full + stopped: no block
    assert q.stopped()


def test_prefetch_iter_order_and_exhaustion():
    assert list(prefetch_iter(iter(range(7)), maxsize=2)) == list(range(7))
    assert list(prefetch_iter([], maxsize=1)) == []


def test_prefetch_iter_propagates_exception():
    def gen():
        yield 1
        raise RuntimeError("producer died")

    it = prefetch_iter(gen(), maxsize=1)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="producer died"):
        next(it)


def test_prefetch_iter_lazy_thread_start():
    """The producer thread must not exist until first iteration — consumer
    setup failures before the loop (e.g. a writer constructor) must never
    leak a running producer (review r3)."""
    before = threading.active_count()
    it = prefetch_iter(iter(range(100)), maxsize=1, name="tpuseg-lazy-test")
    time.sleep(0.1)
    assert threading.active_count() == before  # generator not started
    assert next(it) == 0
    it.close()


def test_prefetch_iter_close_releases_producer():
    consumed = []

    def gen():
        for i in range(10_000):
            consumed.append(i)
            yield i

    for maxsize in (1, 2):
        before = threading.active_count()
        it = prefetch_iter(gen(), maxsize=maxsize, name="tpuseg-close-test")
        next(it)
        it.close()
        deadline = time.time() + 5.0
        while time.time() < deadline and threading.active_count() > before:
            time.sleep(0.02)
        assert threading.active_count() <= before  # no leaked thread
        n = len(consumed)
        time.sleep(0.2)
        assert len(consumed) == n  # and no further consumption
