"""Parallel reader tests on a small synthetic database."""

import numpy as np
import pytest

from tpuseg.data.build_db import serialize_image_mask_pair
from tpuseg.data.reader import AugmentParams, ImageReader
from tpuseg.data.recordstore import RecordWriter


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    """8 records, 32x32 uint16, classes in key; class 1 only in half of them."""
    d = str(tmp_path_factory.mktemp("readerdb") / "train-x.lmdb")
    w = RecordWriter(d)
    rng = np.random.default_rng(0)
    for i in range(8):
        img = rng.integers(0, 1000, (32, 32, 1), dtype=np.uint16)
        msk = np.zeros((32, 32), dtype=np.uint8)
        if i % 2 == 0:
            msk[:16] = 1
        classes = ",".join(str(c) for c in np.unique(msk))
        w.put(f"img{i:03d}:{classes}", serialize_image_mask_pair(img, msk))
    w.close()
    return d


def test_probe_and_shape_contract(db):
    r = ImageReader(db, num_workers=1, use_augmentation=False)
    assert r.get_image_count() == 8
    assert r.get_image_size() == [32, 32, 1]
    assert r.get_image_tensor_shape() == [1, 32, 32]  # CHW (reference contract)
    assert r.get_label_tensor_shape() == [32, 32]


def test_non_x16_database_rejected(tmp_path):
    d = str(tmp_path / "bad.lmdb")
    w = RecordWriter(d)
    img = np.zeros((30, 32, 1), dtype=np.uint16)
    msk = np.zeros((30, 32), dtype=np.uint8)
    w.put("a:0", serialize_image_mask_pair(img, msk))
    w.close()
    with pytest.raises(IOError, match="multiple of 16"):
        ImageReader(d)


def test_worker_roundtrip_normalized(db):
    r = ImageReader(db, num_workers=2, use_augmentation=False, seed=0)
    with r:
        img, lbl = next(r.generator())
    assert img.shape == (1, 32, 32) and img.dtype == np.float32
    assert lbl.shape == (32, 32, 2) and lbl.dtype == np.int32
    assert abs(float(img.mean())) < 1e-4  # z-scored
    np.testing.assert_array_equal(lbl.sum(-1), 1)


def test_nhwc_layout(db):
    r = ImageReader(db, num_workers=1, use_augmentation=False, layout="nhwc", seed=0)
    with r:
        img, _ = next(r.generator())
    assert img.shape == (32, 32, 1)


def test_raw_mode(db):
    r = ImageReader(db, num_workers=1, raw_mode=True, seed=0)
    with r:
        img, msk = next(r.generator())
    assert img.dtype == np.uint16 and img.shape == (32, 32, 1)
    assert msk.dtype == np.uint8 and msk.shape == (32, 32)


def test_strided_walk_deterministic(db):
    """no-shuffle: worker-strided deterministic interleave (imagereader.py:239-241)."""
    r = ImageReader(db, num_workers=1, use_augmentation=False, shuffle=False, raw_mode=True)
    with r:
        gen = r.generator()
        seen = [next(gen)[0][0, 0, 0] for _ in range(8)]
    r2 = ImageReader(db, num_workers=1, use_augmentation=False, shuffle=False, raw_mode=True)
    with r2:
        gen = r2.generator()
        seen2 = [next(gen)[0][0, 0, 0] for _ in range(8)]
    assert seen == seen2  # deterministic order


def test_balanced_sampling_distribution(db):
    """class-balanced draws hit class-1-containing records ~50% even though
    they're half the DB with uniform-class selection semantics."""
    r = ImageReader(db, num_workers=1, use_augmentation=False, balance_classes=True,
                    number_classes=2, raw_mode=True, seed=123)
    with r:
        gen = r.generator()
        hits = 0
        n = 200
        for _ in range(n):
            _, msk = next(gen)
            hits += int(msk.max() == 1)
    # drawing class 1 w.p. 0.5 guarantees a class-1 record; drawing class 0
    # can also return one (they contain 0 too) => P(class-1 record) >= 0.5
    assert hits > n * 0.4


def test_batches(db):
    r = ImageReader(db, num_workers=2, use_augmentation=False, layout="nhwc", seed=0)
    with r:
        imgs, lbls = next(r.batches(4))
    assert imgs.shape == (4, 32, 32, 1)
    assert lbls.shape == (4, 32, 32, 2)


def test_augmented_pipeline_runs(db):
    r = ImageReader(db, num_workers=1, use_augmentation=True, seed=7,
                    augment_params=AugmentParams())
    with r:
        img, lbl = next(r.generator())
    assert img.shape == (1, 32, 32)
    assert set(np.unique(lbl)) <= {0, 1}


def test_shutdown_clean(db):
    r = ImageReader(db, num_workers=3, use_augmentation=False)
    r.startup()
    r.shutdown()
    assert r.workers is None


# --- multi-host sampling (the host-level generalization of the reference's
# worker-strided walk, imagereader.py:239-241; VERDICT r2 item 1) ---


def _simulate_worker_indices(db, *, process_index, process_count, num_workers,
                             worker_id, n, shuffle, seed=None):
    """Drive one worker's sampling stream in-process (no child procs)."""
    r = ImageReader(db, num_workers=num_workers, use_augmentation=False,
                    shuffle=shuffle, seed=seed, raw_mode=True,
                    process_index=process_index, process_count=process_count)
    rng, _ = r._init_worker_sampling(worker_id)
    return [r._next_index(rng) for _ in range(n)]


def test_multihost_strided_walk_partitions_keys(db):
    """no-shuffle: 2 hosts x 2 workers must partition the 8-key space —
    each worker walks a disjoint quarter, union covers everything."""
    streams = {}
    for p in range(2):
        for w in range(2):
            streams[(p, w)] = _simulate_worker_indices(
                db, process_index=p, process_count=2, num_workers=2,
                worker_id=w, n=2, shuffle=False)
    all_idx = [i for s in streams.values() for i in s]
    assert sorted(all_idx) == list(range(8))  # disjoint cover
    # start = global worker id, stride = total workers (4)
    assert streams[(0, 0)] == [0, 4]
    assert streams[(0, 1)] == [1, 5]
    assert streams[(1, 0)] == [2, 6]
    assert streams[(1, 1)] == [3, 7]


def test_multihost_seeded_streams_disjoint_and_deterministic(db):
    """shuffle + seed: each host's RNG stream must differ (same seed used to
    produce identical streams on every host => duplicated global batches)
    and be reproducible run-to-run."""
    a = _simulate_worker_indices(db, process_index=0, process_count=2,
                                 num_workers=1, worker_id=0, n=32,
                                 shuffle=True, seed=11)
    b = _simulate_worker_indices(db, process_index=1, process_count=2,
                                 num_workers=1, worker_id=0, n=32,
                                 shuffle=True, seed=11)
    assert a != b  # hosts draw distinct streams
    a2 = _simulate_worker_indices(db, process_index=0, process_count=2,
                                  num_workers=1, worker_id=0, n=32,
                                  shuffle=True, seed=11)
    assert a == a2  # deterministic under seed
    # host 1 worker 0 shares the RNG stream of host 0 worker 1 by global-id
    # construction — but they are different workers, so no duplication
    c = _simulate_worker_indices(db, process_index=0, process_count=2,
                                 num_workers=2, worker_id=1, n=32,
                                 shuffle=True, seed=11)
    assert isinstance(c, list)


def test_multihost_worker_processes_partition(db):
    """End-to-end through real worker processes: two single-worker hosts in
    no-shuffle raw mode emit interleaved-disjoint records."""
    def first_pixels(p):
        r = ImageReader(db, num_workers=1, use_augmentation=False,
                        shuffle=False, raw_mode=True,
                        process_index=p, process_count=2)
        with r:
            gen = r.generator()
            return [int(next(gen)[0][0, 0, 0]) for _ in range(4)]

    h0, h1 = first_pixels(0), first_pixels(1)
    # strides of 2 from starts 0 and 1: disjoint unless records collide by value
    r = ImageReader(db, num_workers=1, use_augmentation=False, raw_mode=True)
    from tpuseg.data.build_db import deserialize_image_mask_pair
    from tpuseg.data.recordstore import RecordReader
    store = RecordReader(db)
    try:
        expect = [int(deserialize_image_mask_pair(store.get_at(i))[0][0, 0, 0])
                  for i in range(8)]
    finally:
        store.close()
    assert h0 == expect[0::2]
    assert h1 == expect[1::2]


def test_reader_rejects_bad_process_identity(db):
    with pytest.raises(ValueError, match="process_index"):
        ImageReader(db, process_index=2, process_count=2)


def test_reader_restart_after_shutdown(db):
    """startup() after shutdown() must yield a fresh stream: the old outQ's
    final None sentinels (and stale batches) and any unconsumed terminate
    tokens must not end or poison the restarted run (review r3)."""
    r = ImageReader(db, num_workers=2, use_augmentation=False, seed=0)
    r.startup()
    first = [next(r.generator()) for _ in range(3)]
    r.shutdown()
    r.startup()
    gen = r.generator()
    second = [next(gen) for _ in range(3)]
    r.shutdown()
    assert len(first) == len(second) == 3
    for img, _ in second:
        assert img is not None


def test_balanced_all_empty_classes_rejected(tmp_path):
    """If no class in range 0..number_classes-1 has an example, the balanced
    re-draw loop could never terminate inside a worker — fail at
    construction instead (review r3)."""
    from tpuseg.data.build_db import serialize_image_mask_pair
    from tpuseg.data.recordstore import RecordWriter

    d = str(tmp_path / "hi-classes.lmdb")
    w = RecordWriter(d)
    img = np.zeros((32, 32, 1), dtype=np.uint16)
    msk = np.full((32, 32), 2, dtype=np.uint8)
    w.put("a:2,3", serialize_image_mask_pair(img, msk))
    w.close()
    with pytest.raises(IOError, match="has any examples"):
        ImageReader(d, balance_classes=True, number_classes=2)


def test_strided_walk_partitions_when_stride_shares_factor(tmp_path):
    """N=6 keys, 4 global workers (gcd(4,6)=2): the old mod-wrap drifted
    workers onto shared cosets, duplicating keys across the fleet and never
    visiting others; the restart walk is a true partition (review r3)."""
    from tpuseg.data.build_db import serialize_image_mask_pair
    from tpuseg.data.recordstore import RecordWriter

    db = str(tmp_path / "six.lmdb")
    w = RecordWriter(db)
    rng = np.random.default_rng(0)
    for i in range(6):
        img = rng.integers(0, 4000, (16, 16, 1)).astype(np.uint16)
        msk = (img[..., 0] > 2000).astype(np.uint8)
        w.put(f"k{i}:0,1", serialize_image_mask_pair(img, msk))
    w.close()

    streams = {}
    for p in range(2):
        for wk in range(2):
            streams[(p, wk)] = _simulate_worker_indices(
                db, process_index=p, process_count=2, num_workers=2,
                worker_id=wk, n=6, shuffle=False)
    # each global worker t owns {i : i == t mod 4} within [0, 6) and replays
    # its own subsequence — never another worker's keys
    assert streams[(0, 0)] == [0, 4, 0, 4, 0, 4]
    assert streams[(0, 1)] == [1, 5, 1, 5, 1, 5]
    assert streams[(1, 0)] == [2, 2, 2, 2, 2, 2]
    assert streams[(1, 1)] == [3, 3, 3, 3, 3, 3]
    covered = set()
    for s in streams.values():
        covered.update(s)
    assert covered == set(range(6))  # every key is visited by exactly one worker
