"""Reference-dataset interop: the pure-Python LMDB codec (data/lmdb_compat).

The ``lmdb`` C binding is absent in this environment, so the independent
fixture is a database image hand-authored byte-by-byte from the documented
LMDB 0.9 on-disk structs (lmdb.h/mdb.c layout, 64-bit little-endian) —
it exercises the *reader* without touching the writer, breaking the
"shared misunderstanding" loop a pure round-trip test would have.
"""

import os
import sys
import struct

import numpy as np
import pytest

from tpuseg.data.build_db import deserialize_image_mask_pair, serialize_image_mask_pair
from tpuseg.data.lmdb_compat import (
    DEFAULT_PSIZE,
    LmdbReader,
    LmdbWriter,
    MDB_MAGIC,
    is_lmdb_database,
)
from tpuseg.data.recordstore import LmdbRecordReader, RecordReader


# --- hand-authored golden fixture (reader independence) ---


def _handmade_lmdb(tmp_path, records):
    """Write a minimal LMDB data.mdb directly from the struct layout:
    meta pages 0/1, one leaf page (page 2) with inline values. Mirrors what
    liblmdb emits for a fresh tiny single-txn database."""
    psize = 4096
    leaf = bytearray(psize)
    upper = psize
    ptrs = []
    for key, value in sorted(records.items()):
        nsz = 8 + len(key) + len(value)
        nsz += nsz & 1
        upper -= nsz
        node = struct.pack("<HHHH", len(value) & 0xFFFF, len(value) >> 16,
                           0, len(key)) + key + value
        leaf[upper:upper + len(node)] = node
        ptrs.append(upper)
    lower = 16 + 2 * len(ptrs)
    # MDB_page header: pgno=2, pad, flags=P_LEAF, lower, upper
    leaf[:16] = struct.pack("<QHHHH", 2, 0, 0x02, lower, upper)
    struct.pack_into(f"<{len(ptrs)}H", leaf, 16, *ptrs)

    def meta(pgno):
        page = bytearray(psize)
        page[:16] = struct.pack("<QHHHH", pgno, 0, 0x08, 0, 0)  # P_META
        body = struct.pack("<IIQQ", MDB_MAGIC, 1, 0, 1 << 20)  # magic, v1, addr, mapsize
        # free DB: md_pad carries psize, flags=MDB_INTEGERKEY, root=invalid
        body += struct.pack("<IHHQQQQQ", psize, 0x08, 0, 0, 0, 0, 0, 2**64 - 1)
        # main DB: depth 1, 0 branch, 1 leaf, 0 overflow, N entries, root=2
        body += struct.pack("<IHHQQQQQ", 0, 0, 1, 0, 1, 0, len(records), 2)
        body += struct.pack("<QQ", 2, 1)  # last_pg, txnid
        page[16:16 + len(body)] = body
        return bytes(page)

    db = tmp_path / "handmade.lmdb"
    os.makedirs(db)
    with open(db / "data.mdb", "wb") as f:
        f.write(meta(0))
        f.write(meta(1))
        f.write(bytes(leaf))
    return str(db)


def test_reader_parses_handmade_spec_bytes(tmp_path):
    records = {b"alpha:0": b"small-value", b"beta:0,1": b"x" * 200, b"gamma:1": b"y"}
    db = _handmade_lmdb(tmp_path, records)
    assert is_lmdb_database(db)
    with LmdbReader(db) as r:
        assert r.keys() == sorted(records)
        for k in records:
            assert r.get(k) == records[k]


def test_reader_rejects_non_lmdb(tmp_path):
    db = tmp_path / "junk.lmdb"
    os.makedirs(db)
    (db / "data.mdb").write_bytes(b"\0" * 8192)
    assert not is_lmdb_database(str(db))
    with pytest.raises(IOError, match="not an LMDB database"):
        LmdbReader(str(db))


def test_reader_rejects_truncated_overflow(tmp_path):
    """A bigdata node pointing past EOF must raise IOError, not crash."""
    db = tmp_path / "trunc.lmdb"
    with LmdbWriter(str(db)) as w:
        w.put(b"big:0", b"z" * 50000)
    path = os.path.join(str(db), "data.mdb")
    size = os.path.getsize(path)
    with open(path, "r+b") as f:
        f.truncate(size - 3 * DEFAULT_PSIZE)
    with pytest.raises(IOError):
        LmdbReader(str(db))


# --- writer <-> reader round trip ---


def test_roundtrip_inline_overflow_and_tree_depth(tmp_path):
    """Small inline values, >page overflow values, and enough keys to force
    a multi-level branch hierarchy, all through one database."""
    rng = np.random.default_rng(1)
    items = {}
    for i in range(700):
        k = f"tile_{i:05d}:0,1".encode()
        n = int(rng.integers(1, 500)) if i % 5 else int(rng.integers(4000, 90000))
        items[k] = rng.integers(0, 255, n, dtype=np.uint8).tobytes()
    db = str(tmp_path / "rt.lmdb")
    with LmdbWriter(db) as w:
        for k, v in items.items():
            w.put(k, v)
    with LmdbReader(db) as r:
        assert r.keys() == sorted(items)
        for i, k in enumerate(r.keys()):
            assert r.get_at(i) == items[k]


def test_writer_meta_pages_match_spec():
    """Byte-level invariants any liblmdb open would check: magic at offset
    16 of both meta pages, version 1, psize in free-DB md_pad, P_META flag."""
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        db = os.path.join(tmp, "spec.lmdb")
        with LmdbWriter(db) as w:
            w.put(b"k:0", b"v")
        raw = open(os.path.join(db, "data.mdb"), "rb").read()
        for pg in (0, 1):
            base = pg * DEFAULT_PSIZE
            pgno, _pad, flags, _lo, _up = struct.unpack_from("<QHHHH", raw, base)
            assert pgno == pg and flags == 0x08  # P_META
            magic, version, _addr, _msz = struct.unpack_from("<IIQQ", raw, base + 16)
            assert magic == MDB_MAGIC and version == 1
            free_pad = struct.unpack_from("<I", raw, base + 16 + 24)[0]
            assert free_pad == DEFAULT_PSIZE  # mm_psize
        assert os.path.exists(os.path.join(db, "lock.mdb"))


def test_empty_database_roundtrip(tmp_path):
    db = str(tmp_path / "empty.lmdb")
    LmdbWriter(db).close()
    with LmdbReader(db) as r:
        assert len(r) == 0 and r.keys() == []


# --- integration: the reference workflow brings its LMDB to tpuseg ---


def _reference_style_db(tmp_path, n=6):
    """An LMDB of real serialized ImageMaskPairs with reference-format keys
    (build_lmdb.py:117-124) — what a reference deployment would bring."""
    rng = np.random.default_rng(2)
    db = str(tmp_path / "ref-data.lmdb")
    expected = {}
    with LmdbWriter(db) as w:
        for i in range(n):
            img = rng.integers(0, 4096, (32, 32, 1), dtype=np.uint16)
            msk = (img[..., 0] > 2048).astype(np.uint8)
            classes = ",".join(str(c) for c in np.unique(msk))
            key = f"img_{i:08d}:{classes}"
            w.put(key, serialize_image_mask_pair(img, msk))
            expected[key.encode("ascii")] = (img, msk)
    return db, expected


def test_recordreader_autodetects_lmdb(tmp_path):
    db, expected = _reference_style_db(tmp_path)
    r = RecordReader(db)
    assert isinstance(r, LmdbRecordReader)
    try:
        assert len(r) == len(expected)
        for i, k in enumerate(r.keys()):
            img, msk = deserialize_image_mask_pair(r.get_at(i))
            np.testing.assert_array_equal(img, expected[k][0])
            np.testing.assert_array_equal(msk, expected[k][1])
    finally:
        r.close()


def test_imagereader_trains_from_lmdb(tmp_path):
    """The full parallel data engine (worker processes, sampling, raw mode)
    over a reference-format LMDB — datasets migrate with zero conversion."""
    from tpuseg.data.reader import ImageReader

    db, expected = _reference_style_db(tmp_path, n=8)
    r = ImageReader(db, num_workers=2, use_augmentation=False, raw_mode=True,
                    number_classes=2, seed=0)
    assert r.get_image_count() == 8
    assert r.get_image_size() == [32, 32, 1]
    with r:
        img, msk = next(r.generator())
    assert img.shape == (32, 32, 1) and img.dtype == np.uint16
    assert msk.shape == (32, 32)


def test_convert_db_both_directions(tmp_path):
    """lmdb -> tsr -> lmdb through the CLI: record-identical at each hop."""
    from tpuseg.cli.convert_db import main as convert_main

    db, expected = _reference_style_db(tmp_path)
    tsr = str(tmp_path / "as-tsr.lmdb")
    back = str(tmp_path / "back.lmdb")
    convert_main(["--input_database", db, "--output_database", tsr, "--format", "tsr"])
    convert_main(["--input_database", tsr, "--output_database", back, "--format", "lmdb"])
    orig, mid, final = RecordReader(db), RecordReader(tsr), RecordReader(back)
    try:
        assert not isinstance(mid, LmdbRecordReader)  # really converted
        assert isinstance(final, LmdbRecordReader)
        assert orig.keys() == mid.keys() == final.keys()
        for i in range(len(orig.keys())):
            assert orig.get_at(i) == mid.get_at(i) == final.get_at(i)
    finally:
        orig.close(), mid.close(), final.close()


def test_convert_db_refuses_to_clobber(tmp_path):
    db, _ = _reference_style_db(tmp_path)
    out = tmp_path / "occupied"
    os.makedirs(out)
    (out / "something").write_text("x")
    from tpuseg.cli.convert_db import convert

    with pytest.raises(IOError, match="already exists"):
        convert(db, str(out), "tsr")


def test_writer_spills_values_to_disk(tmp_path):
    """The writer must not buffer record bytes in RAM (a real migration can
    exceed memory): values spill to a temp sidecar during puts and the
    sidecar is removed on close."""
    db = str(tmp_path / "spill.lmdb")
    w = LmdbWriter(db)
    w.put(b"k:0", b"v" * 100000)
    spill = os.path.join(db, "data.mdb.spill")
    assert os.path.exists(spill) and os.path.getsize(spill) == 100000
    assert sum(sys.getsizeof(v) for v in w._items.values()) < 10000  # locators only
    w.close()
    assert not os.path.exists(spill)
    with LmdbReader(db) as r:
        assert r.get(b"k:0") == b"v" * 100000


def test_writer_duplicate_key_last_wins(tmp_path):
    db = str(tmp_path / "dup.lmdb")
    with LmdbWriter(db) as w:
        w.put(b"k:0", b"first")
        w.put(b"k:0", b"second" * 3000)  # replaces via overflow path too
    with LmdbReader(db) as r:
        assert len(r) == 1
        assert r.get(b"k:0") == b"second" * 3000


def test_reader_survives_random_corruption(tmp_path):
    """Byte-flip fuzz: a corrupted database must raise IOError (or read
    differing bytes) — never crash with IndexError/struct.error/hang."""
    rng = np.random.default_rng(9)
    db = str(tmp_path / "fuzz.lmdb")
    with LmdbWriter(db) as w:
        for i in range(40):
            n = int(rng.integers(1, 20000))
            w.put(f"k{i:03d}:0".encode(), rng.integers(0, 255, n, dtype=np.uint8).tobytes())
    path = os.path.join(db, "data.mdb")
    pristine = open(path, "rb").read()
    for trial in range(60):
        raw = bytearray(pristine)
        for _ in range(int(rng.integers(1, 8))):
            pos = int(rng.integers(0, len(raw)))
            raw[pos] ^= int(rng.integers(1, 256))
        open(path, "wb").write(bytes(raw))
        try:
            with LmdbReader(db) as r:
                for i in range(len(r)):
                    r.get_at(i)
        except (IOError, KeyError):
            pass  # the contract: corruption surfaces as IOError (or os-level)


def test_reader_names_big_endian_rejection(tmp_path):
    db = tmp_path / "be.lmdb"
    os.makedirs(db)
    page = bytearray(4096)
    struct.pack_into(">I", page, 16, MDB_MAGIC)  # byte-swapped magic
    (db / "data.mdb").write_bytes(bytes(page) * 2)
    with pytest.raises(IOError, match="big-endian"):
        LmdbReader(str(db))


def test_convert_db_aborts_partial_output(tmp_path, monkeypatch):
    """A mid-copy failure must not leave a valid-looking truncated output
    database behind (review r3): the output dir is removed and the error
    propagates."""
    from tpuseg.cli.convert_db import convert
    from tpuseg.data import recordstore

    db, _ = _reference_style_db(tmp_path)
    out = str(tmp_path / "partial-out")

    real = recordstore.LmdbRecordReader.get_at

    def flaky(self, i):
        if i == 3:
            raise IOError("disk vanished mid-copy")
        return real(self, i)

    monkeypatch.setattr(recordstore.LmdbRecordReader, "get_at", flaky)
    with pytest.raises(IOError, match="mid-copy"):
        convert(db, out, "tsr")
    assert not os.path.exists(out)


def test_reader_truncated_midpage_raises_ioerror(tmp_path):
    """A file cut mid-page raises IOError (the module's corruption
    contract), never struct.error or silently-short records."""
    db = str(tmp_path / "cut.lmdb")
    with LmdbWriter(db) as w:
        for i in range(50):
            w.put(f"k{i:03d}:0".encode(), b"v" * 3000)
    path = os.path.join(db, "data.mdb")
    size = os.path.getsize(path)
    for cut in (size - 1, size - 100, size - DEFAULT_PSIZE - 7):
        with open(path, "r+b") as f:
            f.truncate(cut)
        with pytest.raises(IOError):
            LmdbReader(db)


@pytest.mark.parametrize("psize", [512, 8192])
def test_roundtrip_nonstandard_page_size(tmp_path, psize):
    """psize is self-describing (free-DB md_pad); meta page 1 moves with it
    and the reader must follow. 512 forces tiny leaves (many branch
    levels), 8192 exercises the large-page path."""
    rng = np.random.default_rng(7)
    items = {f"k{i:04d}:0".encode(): rng.integers(0, 255, int(rng.integers(1, 3000)),
                                                  dtype=np.uint8).tobytes()
             for i in range(300)}
    db = str(tmp_path / f"ps{psize}.lmdb")
    with LmdbWriter(db, psize=psize) as w:
        for k, v in items.items():
            w.put(k, v)
    with LmdbReader(db) as r:
        assert r._psize == psize
        assert r.keys() == sorted(items)
        for i, k in enumerate(r.keys()):
            assert r.get_at(i) == items[k]


def test_writer_emit_failure_cleans_up_and_close_retry_raises(tmp_path, monkeypatch):
    """An emission failure (e.g. ENOSPC) must remove data.mdb.tmp and the
    .spill sidecar, and a retried close() must raise — not silently succeed
    with no database (review r3)."""
    db = str(tmp_path / "fail.lmdb")
    w = LmdbWriter(db)
    w.put(b"k", b"v")
    monkeypatch.setattr(LmdbWriter, "_emit",
                        lambda self, out: (_ for _ in ()).throw(OSError("disk full")))
    with pytest.raises(OSError, match="disk full"):
        w.close()
    data = os.path.join(db, "data.mdb")
    assert not os.path.exists(data)
    assert not os.path.exists(data + ".tmp")
    assert not os.path.exists(data + ".spill")
    with pytest.raises(IOError, match="not written"):
        w.close()


def test_writer_abort_writes_nothing(tmp_path):
    db = str(tmp_path / "abort.lmdb")
    w = LmdbWriter(db)
    w.put(b"k", b"v")
    w.abort()
    data = os.path.join(db, "data.mdb")
    assert not os.path.exists(data)
    assert not os.path.exists(data + ".spill")
    with pytest.raises(IOError, match="aborted"):
        w.close()


def test_writer_context_manager_aborts_on_exception(tmp_path):
    """An exception inside the with-block must not commit a partial DB."""
    db = str(tmp_path / "ctx.lmdb")
    with pytest.raises(RuntimeError):
        with LmdbWriter(db) as w:
            w.put(b"k", b"v")
            raise RuntimeError("boom")
    assert not os.path.exists(os.path.join(db, "data.mdb"))


def test_convert_db_output_is_existing_file(tmp_path):
    """A plain file at the output path gets the clean already-exists error,
    not NotADirectoryError from os.listdir (review r3)."""
    from tpuseg.cli.convert_db import convert
    db, _ = _reference_style_db(tmp_path)
    out = tmp_path / "data.mdb"
    out.write_bytes(b"not a directory")
    with pytest.raises(IOError, match="already exists"):
        convert(db, str(out), "tsr")


def test_writer_rejects_unpackable_put(tmp_path):
    """A key too long for the page size (or a >4 GiB value length) must
    fail at put() with the limit named — the packer used to blow up at
    close() (or silently mask dsize to 32 bits) instead (review r3)."""
    from tpuseg.data.lmdb_compat import LmdbWriter

    w = LmdbWriter(str(tmp_path / "small"), psize=512)
    with pytest.raises(ValueError, match="too large for page size"):
        w.put(b"k" * 500, b"x" * 10000)
    w.put(b"ok", b"v")  # normal puts still work at psize=512
    w.close()

    class _FakeLen(bytes):
        def __len__(self):
            return (1 << 32) + 100

    w2 = LmdbWriter(str(tmp_path / "big"))
    with pytest.raises(ValueError, match="4 GiB"):
        w2.put(b"k", _FakeLen(b"x"))
    w2.abort()
