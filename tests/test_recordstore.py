"""tsrstore tests: roundtrip, sorted-key iteration, native/Python format parity."""

import os

import numpy as np
import pytest

from tpuseg.data.recordstore import RecordReader, RecordWriter, load_native


def _fill(db, use_native):
    w = RecordWriter(db, use_native=use_native)
    w.put(b"banana:1", b"yellow" * 100)
    w.put(b"apple:0,1", b"red")
    w.put(b"cherry:2", b"")
    w.close()


@pytest.mark.parametrize("use_native", [True, False])
def test_roundtrip_and_sorted_keys(tmp_path, use_native):
    if use_native and load_native() is None:
        pytest.skip("native lib unavailable")
    db = str(tmp_path / "db")
    _fill(db, use_native)
    r = RecordReader(db, use_native=use_native)
    assert len(r) == 3
    # sorted iteration = LMDB cursor parity
    assert r.keys() == [b"apple:0,1", b"banana:1", b"cherry:2"]
    assert r.get(b"banana:1") == b"yellow" * 100
    assert r.get(b"apple:0,1") == b"red"
    assert r.get(b"cherry:2") == b""
    assert r.get_at(0) == b"red"
    with pytest.raises(KeyError):
        r.get(b"missing")
    r.close()


def test_cross_impl_format_compat(tmp_path):
    """Python writer -> native reader and vice versa: identical on-disk format."""
    if load_native() is None:
        pytest.skip("native lib unavailable")
    db_py = str(tmp_path / "py")
    _fill(db_py, use_native=False)
    r = RecordReader(db_py, use_native=True)
    assert r.keys() == [b"apple:0,1", b"banana:1", b"cherry:2"]
    assert r.get(b"banana:1") == b"yellow" * 100
    r.close()

    db_nat = str(tmp_path / "nat")
    _fill(db_nat, use_native=True)
    r = RecordReader(db_nat, use_native=False)
    assert r.keys() == [b"apple:0,1", b"banana:1", b"cherry:2"]
    assert r.get(b"cherry:2") == b""
    r.close()


def test_missing_database_message(tmp_path):
    with pytest.raises(IOError, match="Missing Database"):
        RecordReader(str(tmp_path / "nope"))


def test_large_values(tmp_path):
    db = str(tmp_path / "big")
    big = np.random.default_rng(0).integers(0, 255, size=2_000_000, dtype=np.uint8).tobytes()
    w = RecordWriter(db)
    w.put(b"k", big)
    w.close()
    r = RecordReader(db)
    assert r.get(b"k") == big
    r.close()


@pytest.mark.parametrize("use_native", [True, False])
@pytest.mark.parametrize("corruption", ["header", "truncate", "index_entry"])
def test_corrupt_store_raises_cleanly(tmp_path, use_native, corruption):
    """Corrupted databases must raise IOError, never crash the process —
    a corrupt count used to reach the native vector::reserve, whose
    std::length_error escaped the C ABI and aborted the whole trainer."""
    import os

    if use_native and load_native() is None:
        pytest.skip("native library unavailable")
    db = str(tmp_path / f"c-{use_native}-{corruption}.lmdb")
    _fill(db, use_native)
    path = os.path.join(db, "data.tsr")
    data = bytearray(open(path, "rb").read())
    if corruption == "header":
        for i in range(8, 24):
            data[i] = 0xFF
    elif corruption == "truncate":
        data = data[: len(data) // 2]
    else:  # index_entry: clobber the index region
        _, count, index_offset = __import__("struct").unpack_from("<8sQQ", data, 0)
        for i in range(index_offset, min(index_offset + 20, len(data))):
            data[i] = 0xFF
    open(path, "wb").write(bytes(data))
    with pytest.raises(IOError):
        RecordReader(db, use_native=use_native)


@pytest.mark.parametrize("use_native", [True, False])
def test_abort_leaves_unreadable_partial(tmp_path, use_native):
    """abort() must NOT finalize: a partial database aborted mid-build has
    to fail open (the native abort used to write the full index and commit
    a valid-looking truncated dataset — review r3)."""
    if use_native and load_native() is None:
        pytest.skip("native lib unavailable")
    db = str(tmp_path / f"abort-{use_native}.lmdb")
    w = RecordWriter(db, use_native=use_native)
    w.put(b"k1", b"v1")
    w.abort()
    with pytest.raises(IOError):
        RecordReader(db, use_native=use_native)


@pytest.mark.parametrize("use_native", [True, False])
def test_context_manager_aborts_on_exception(tmp_path, use_native):
    """`with RecordWriter(...)` commits on clean exit only; an exception
    mid-loop must not produce a valid truncated database (review r3)."""
    if use_native and load_native() is None:
        pytest.skip("native lib unavailable")
    db = str(tmp_path / f"ctx-{use_native}.lmdb")
    with pytest.raises(RuntimeError):
        with RecordWriter(db, use_native=use_native) as w:
            w.put(b"k1", b"v1")
            raise RuntimeError("boom")
    with pytest.raises(IOError):
        RecordReader(db, use_native=use_native)
    # clean exit still commits
    db2 = str(tmp_path / f"ctx2-{use_native}.lmdb")
    with RecordWriter(db2, use_native=use_native) as w:
        w.put(b"k1", b"v1")
    with RecordReader(db2, use_native=use_native) as r:
        assert r.get(b"k1") == b"v1"


@pytest.mark.parametrize("use_native", [True, False])
def test_duplicate_puts_last_wins(tmp_path, use_native):
    """Duplicate keys resolve to the LAST put on both backends — the
    reference's LMDB txn.put overwrite semantics (build_lmdb.py:136); the
    two backends used to disagree (first-wins native, last-wins Python)."""
    if use_native and load_native() is None:
        pytest.skip("native lib unavailable")
    db = str(tmp_path / f"dup-{use_native}.lmdb")
    w = RecordWriter(db, use_native=use_native)
    w.put(b"a", b"first")
    w.put(b"b", b"only")
    w.put(b"a", b"second")
    w.close()
    for reader_native in (True, False):
        if reader_native and load_native() is None:
            continue
        with RecordReader(db, use_native=reader_native) as r:
            assert len(r) == 2
            assert r.get(b"a") == b"second"
            assert r.keys() == [b"a", b"b"]
            assert r.get_at(0) == b"second"


def test_truncated_header_raises_ioerror(tmp_path):
    """A builder killed before the 24-byte header completes leaves a short
    data.tsr; the pure-Python reader must raise IOError (the documented
    corrupt-DB signal), not ValueError/struct.error (review r3)."""
    for payload in (b"", b"TSRSTOR1\x01"):
        db = tmp_path / f"trunc-{len(payload)}.lmdb"
        db.mkdir()
        (db / "data.tsr").write_bytes(payload)
        with pytest.raises(IOError):
            RecordReader(str(db), use_native=False)


@pytest.mark.parametrize("use_native", [True, False])
def test_get_at_negative_and_closed(tmp_path, use_native):
    """Negative indices wrap Python-style on BOTH backends (the native one
    used to wrap through c_uint64 -> IndexError); a closed reader raises
    ValueError, not AttributeError (review r3)."""
    if use_native and load_native() is None:
        pytest.skip("native lib unavailable")
    db = str(tmp_path / f"neg-{use_native}.lmdb")
    _fill(db, use_native)
    r = RecordReader(db, use_native=use_native)
    last = r.get_at(len(r) - 1)
    assert r.get_at(-1) == last
    with pytest.raises(IndexError):
        r.get_at(len(r))
    with pytest.raises(IndexError):
        r.get_at(-len(r) - 1)
    r.close()
    with pytest.raises(ValueError, match="closed"):
        r.get_at(0)
    with pytest.raises(ValueError, match="closed"):
        r.get(b"k")
