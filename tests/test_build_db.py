"""Dataset builder tests against the bundled NIST corpus semantics."""

import numpy as np
import pytest

from tpuseg.data.build_db import (
    build_databases,
    deserialize_image_mask_pair,
    enforce_size_multiple,
    process_slide_tiling,
    serialize_image_mask_pair,
)
from tpuseg.data.recordstore import RecordReader

REF_IMAGES = "/root/reference/data/images"
REF_MASKS = "/root/reference/data/masks"


def test_serialize_roundtrip():
    img = np.arange(32 * 48, dtype=np.uint16).reshape(32, 48)
    msk = (img % 2).astype(np.uint8)
    buf = serialize_image_mask_pair(img, msk)
    img2, msk2 = deserialize_image_mask_pair(buf)
    assert img2.shape == (32, 48, 1)  # 2D images get a channel dim (build_lmdb.py:39-41)
    np.testing.assert_array_equal(img2[..., 0], img)
    np.testing.assert_array_equal(msk2, msk)
    assert img2.dtype == np.uint16 and msk2.dtype == np.uint8


def test_serialize_supports_reference_dtype_matrix(tmp_path):
    """Every input dtype the reference documents (README.md:15-24: images
    uint8/uint16/int32/float32, masks uint8/uint16/int32) round-trips
    through the wire format and the reader's processed + raw modes."""
    import numpy as np

    from tpuseg.data.build_db import deserialize_image_mask_pair
    from tpuseg.data.reader import ImageReader
    from tpuseg.data.recordstore import RecordWriter

    rng = np.random.default_rng(0)
    img_dtypes = [np.uint8, np.uint16, np.int32, np.float32]
    msk_dtypes = [np.uint8, np.uint16, np.int32]
    for i_dt in img_dtypes:
        for m_dt in msk_dtypes:
            img = (rng.random((32, 32, 1)) * 100).astype(i_dt)
            msk = rng.integers(0, 2, (32, 32)).astype(m_dt)
            data = serialize_image_mask_pair(img, msk)
            img2, msk2 = deserialize_image_mask_pair(data)
            assert img2.dtype == i_dt and msk2.dtype == m_dt
            np.testing.assert_array_equal(img, img2)
            np.testing.assert_array_equal(msk, msk2)

    # a float32-image database flows through both reader modes
    db = str(tmp_path / "train-f32.lmdb")
    w = RecordWriter(db)
    for i in range(4):
        img = rng.normal(0, 50, (32, 32, 1)).astype(np.float32)
        msk = rng.integers(0, 2, (32, 32)).astype(np.int32)
        w.put(f"img{i}:0,1", serialize_image_mask_pair(img, msk))
    w.close()
    with ImageReader(db, use_augmentation=False, number_classes=2,
                     num_workers=1, layout="nhwc", seed=0) as r:
        im, lbl = next(r.generator())
        assert im.dtype == np.float32 and lbl.shape == (32, 32, 2)
    with ImageReader(db, raw_mode=True, number_classes=2,
                     num_workers=1, seed=0) as r:
        imgs, msks = next(r.batches(2))
        assert imgs.dtype == np.float32 and msks.dtype == np.int32


def test_streamed_build_matches_in_ram_tiling(tmp_path):
    """Whole-slide BigTIFF pairs tile straight from disk into the record
    store with byte-identical keys and records to the in-RAM path."""
    import numpy as np

    from tpuseg.data.build_db import (deserialize_image_mask_pair,
                                      generate_database, process_slide_tiling)
    from tpuseg.data.recordstore import RecordReader
    from tpuseg.utils import bigtiff

    rng = np.random.default_rng(6)
    img = rng.integers(0, 4096, (600, 500)).astype(np.uint16)
    msk = rng.integers(0, 3, (600, 500)).astype(np.uint8)

    imgdir = tmp_path / "imgs"
    mskdir = tmp_path / "msks"
    imgdir.mkdir(), mskdir.mkdir()
    bigtiff.write_bigtiff(str(imgdir / "slide.tif"), img, tile=(128, 128))
    bigtiff.write_bigtiff(str(mskdir / "slide.tif"), msk, tile=(128, 128))

    db = generate_database(["slide.tif"], "train-s.lmdb", str(imgdir),
                           str(mskdir), str(tmp_path), tile_size=256)

    tiles, mtiles, keys = process_slide_tiling(img, msk, 256, "slide")
    reader = RecordReader(db)
    try:
        stored = {(k.decode() if isinstance(k, bytes) else k): reader.get(k)
                  for k in reader.keys()}
    finally:
        reader.close()
    # slide-to-fit can emit duplicate edge boxes (two grid columns sliding
    # to the same start, reference geometry build_lmdb.py:99-108); the
    # store keeps one record per key in both paths
    assert sorted(stored) == sorted(set(keys))
    for t, m, k in zip(tiles, mtiles, keys):
        got_img, got_msk = deserialize_image_mask_pair(stored[k])
        np.testing.assert_array_equal(t.reshape(got_img.shape), got_img)
        np.testing.assert_array_equal(m, got_msk)


def test_streamed_build_falls_back_on_foreign_bigtiff(tmp_path, monkeypatch):
    """BigTIFF dialects our reader rejects fall back to the in-RAM imread
    path instead of aborting the database build."""
    import numpy as np

    from tpuseg.data import build_db
    from tpuseg.data.recordstore import RecordReader
    from tpuseg.utils import bigtiff

    rng = np.random.default_rng(7)
    img = rng.integers(0, 4096, (300, 280)).astype(np.uint16)
    msk = rng.integers(0, 2, (300, 280)).astype(np.uint8)
    imgdir, mskdir = tmp_path / "imgs", tmp_path / "msks"
    imgdir.mkdir(), mskdir.mkdir()
    bigtiff.write_bigtiff(str(imgdir / "s.tif"), img, tile=(128, 128))
    bigtiff.write_bigtiff(str(mskdir / "s.tif"), msk, tile=(128, 128))

    def boom(*a, **k):
        raise IOError("BigTIFF is not tiled (strip layout unsupported)")

    monkeypatch.setattr(build_db, "_stream_slide_tiling", boom)
    db = build_db.generate_database(["s.tif"], "train-fb.lmdb", str(imgdir),
                                    str(mskdir), str(tmp_path), tile_size=256)
    with RecordReader(db) as r:
        assert len(r) > 0  # built via the imread path


def test_build_rejects_float_masks(tmp_path):
    """Float masks would build keys like 'name:0.0,1.0' that crash the
    class-balanced sampler much later — the builder fails fast instead."""
    import numpy as np
    import pytest

    from tpuseg.data.build_db import generate_database
    from tpuseg.utils.imagio import imwrite

    imgdir, mskdir = tmp_path / "imgs", tmp_path / "msks"
    imgdir.mkdir(), mskdir.mkdir()
    imwrite(str(imgdir / "a.tif"), np.zeros((32, 32), np.uint16))
    imwrite(str(mskdir / "a.tif"), np.zeros((32, 32), np.float32))
    with pytest.raises(ValueError, match="integer type"):
        generate_database(["a.tif"], "train-f.lmdb", str(imgdir), str(mskdir),
                          str(tmp_path), tile_size=0)


def test_enforce_size_multiple():
    img = np.random.default_rng(0).random((37, 50))
    out = enforce_size_multiple(img)
    assert out.shape == (32, 48)
    # center crop: floor(dh/2) rows dropped from top (build_lmdb.py:76)
    np.testing.assert_array_equal(out, img[2:34, 1:49])


def test_tiling_grid_and_keys():
    h = w = 300
    img = np.random.default_rng(1).integers(0, 65535, (h, w), dtype=np.uint16)
    msk = np.zeros((h, w), dtype=np.uint8)
    msk[:100, :] = 1
    tiles, mtiles, keys = process_slide_tiling(img, msk, 128, "blk")
    # stride = 128 - 96 = 32; starts at 0,32,...,288 => 10 per axis, slid to
    # fit — starts >= 192 all collapse onto 172, and duplicates are emitted
    # once (the reference emits them repeatedly but its LMDB put overwrites
    # same-key records, netting the same 7x7 unique grid; review r3)
    assert len(tiles) == 49
    assert len(set(keys)) == 49
    assert all(t.shape == (128, 128) for t in tiles)
    # keys carry y,x start and present classes
    assert keys[0] == "blk_i0_j0:0,1"  # rows 0-127 span the 1-region (<100) and 0-region
    # an edge box is slid inward: start 288 -> 172
    assert any("_i172_" in k for k in keys)
    for t, m, k in zip(tiles, mtiles, keys):
        classes = k.split(":")[1].split(",")
        np.testing.assert_array_equal(np.unique(m), np.array(sorted(int(c) for c in classes)))


@pytest.fixture(scope="module")
def built_dbs(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("dbs"))
    return build_databases(REF_IMAGES, REF_MASKS, out, "smoke", train_fraction=0.8, seed=42)


def test_build_on_bundled_corpus(built_dbs):
    train_db, test_db = built_dbs
    rtrain = RecordReader(train_db)
    rtest = RecordReader(test_db)
    assert len(rtrain) == 80 and len(rtest) == 20
    img, msk = deserialize_image_mask_pair(rtrain.get_at(0))
    assert img.shape == (256, 256, 1) and img.dtype == np.uint16
    assert msk.shape == (256, 256) and msk.dtype == np.uint8
    assert set(np.unique(msk)) <= {0, 1}
    # keys end with the present-class list
    key = rtrain.keys()[0].decode()
    assert key.split(":")[1] in ("0", "1", "0,1")
    rtrain.close()
    rtest.close()


def test_manifest_written(built_dbs):
    import os

    train_db, _ = built_dbs
    with open(os.path.join(train_db, "img_filenames.csv")) as f:
        names = [line.strip() for line in f if line.strip()]
    assert len(names) == 80 and names[0].endswith(".tif")


def test_streamed_build_midstream_failure_does_not_duplicate(tmp_path, monkeypatch):
    """An I/O error AFTER some tiles were streamed must propagate, not fall
    back — the append-only store would otherwise hold the streamed tiles
    plus the in-RAM copies under duplicate keys (ADVICE r2)."""
    import numpy as np

    from tpuseg.data import build_db
    from tpuseg.utils import bigtiff

    rng = np.random.default_rng(8)
    img = rng.integers(0, 4096, (300, 280)).astype(np.uint16)
    msk = rng.integers(0, 2, (300, 280)).astype(np.uint8)
    imgdir, mskdir = tmp_path / "imgs", tmp_path / "msks"
    imgdir.mkdir(), mskdir.mkdir()
    bigtiff.write_bigtiff(str(imgdir / "s.tif"), img, tile=(128, 128))
    bigtiff.write_bigtiff(str(mskdir / "s.tif"), msk, tile=(128, 128))

    real = build_db._stream_slide_tiling

    def partial_then_fail(writer, img_path, msk_path, tile_size, block_key,
                          emitted=None):
        writer.put(f"{block_key}_i0_j0:0,1", b"partial-record")
        if emitted is not None:
            emitted["records"] = emitted.get("records", 0) + 1
        raise IOError("disk went away mid-stream")

    monkeypatch.setattr(build_db, "_stream_slide_tiling", partial_then_fail)
    with pytest.raises(IOError, match="mid-stream"):
        build_db.generate_database(["s.tif"], "train-mid.lmdb", str(imgdir),
                                   str(mskdir), str(tmp_path), tile_size=256)
    assert real is not partial_then_fail  # silence unused warning


def test_tiling_boxes_deduplicated():
    """Slide-to-fit collapse must not emit duplicate boxes: the reference's
    LMDB put overwrites same-key records, but the append-only RecordWriter
    would keep every copy and skew sampling (review r3)."""
    from tpuseg.data.build_db import tiling_boxes

    for h, w, tile in [(512, 512, 512), (900, 900, 512), (416, 416, 512),
                       (2048, 1024, 512)]:
        boxes = tiling_boxes(h, w, tile)
        assert len(boxes) == len(set(boxes)), (h, w, tile)
    # a tile-sized image yields exactly one box
    assert tiling_boxes(512, 512, 512) == [(0, 0, 512, 512)]


def test_stream_tiling_small_slide_falls_back_to_in_ram(tmp_path):
    """A tiled-BigTIFF pair smaller than tile_size must raise IOError before
    any put (the slide-to-fit grid needs negative starts that read_region
    rejects), so generate_database routes it to the in-RAM path (review r3)."""
    from tpuseg.data.build_db import _stream_slide_tiling
    from tpuseg.data.recordstore import RecordReader, RecordWriter
    from tpuseg.utils import bigtiff

    img = np.zeros((256, 256), np.uint16)
    msk = np.zeros((256, 256), np.uint8)
    ip, mp = str(tmp_path / "i.tif"), str(tmp_path / "m.tif")
    bigtiff.write_bigtiff(ip, img, tile=(128, 128))
    bigtiff.write_bigtiff(mp, msk, tile=(128, 128))
    w = RecordWriter(str(tmp_path / "db"))
    with pytest.raises(IOError, match="smaller than tile_size"):
        _stream_slide_tiling(w, ip, mp, 512, "s")
    w.close()
    assert RecordReader(str(tmp_path / "db")).keys() == []


def test_in_ram_multichannel_mask_rejected(tmp_path):
    """An RGB label image must fail at build time, not as a reshape error
    deep inside the training pipeline (review r3)."""
    from tpuseg.data.build_db import generate_database
    from tpuseg.utils.imagio import imwrite

    imgdir, mskdir = tmp_path / "img", tmp_path / "msk"
    imgdir.mkdir(); mskdir.mkdir()
    imwrite(str(imgdir / "a.tif"), np.zeros((32, 32), np.uint16))
    imwrite(str(mskdir / "a.tif"), np.zeros((32, 32, 3), np.uint8))
    with pytest.raises(ValueError, match="grayscale"):
        generate_database(["a.tif"], "db", str(imgdir), str(mskdir),
                          str(tmp_path / "out"), 0)


def test_generate_database_aborts_on_failure(tmp_path, monkeypatch):
    """A mid-build failure must not commit a valid-looking truncated
    database (review r3): the directory is removed and the error
    propagates."""
    from tpuseg.data import build_db as B
    from tpuseg.utils.imagio import imwrite

    imgdir, mskdir = tmp_path / "img", tmp_path / "msk"
    imgdir.mkdir(); mskdir.mkdir()
    for i in range(3):
        imwrite(str(imgdir / f"{i}.tif"), np.zeros((32, 32), np.uint16))
        imwrite(str(mskdir / f"{i}.tif"), np.zeros((32, 32), np.uint8))

    real = B.serialize_image_mask_pair
    calls = []

    def flaky(img, msk):
        calls.append(1)
        if len(calls) == 3:
            raise OSError("disk died")
        return real(img, msk)

    monkeypatch.setattr(B, "serialize_image_mask_pair", flaky)
    out = tmp_path / "out"
    with pytest.raises(OSError, match="disk died"):
        B.generate_database(["0.tif", "1.tif", "2.tif"], "db",
                            str(imgdir), str(mskdir), str(out), 0)
    assert not (out / "db").exists()


def test_tf_import_index_sort_numeric():
    from tpuseg.utils.tf_import import _ckpt_sort_key

    files = [f"/x/ckpt-{i}.index" for i in (1, 2, 9, 10, 12)]
    import random as _r

    shuffled = files[:]
    _r.Random(0).shuffle(shuffled)
    assert sorted(shuffled, key=_ckpt_sort_key) == files
