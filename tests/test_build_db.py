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
    # stride = 128 - 96 = 32; starts at 0,32,...,288 => 10 per axis, slid to fit
    assert len(tiles) == 100
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
