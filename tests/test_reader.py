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
