"""Python binding for the native tsrstore record store.

tsrstore plays the role LMDB plays in the reference (imagereader.py:120,
build_lmdb.py:136): a memory-mapped, sorted-key, zero-copy store of
serialized ``ImageMaskPair`` records.  The hot path is the native C++
library (``native/recordstore.cc``) bound via ctypes; a pure-Python mmap
implementation of the identical on-disk format backs it up so a missing
compiler degrades performance, not functionality.

A "database" is a directory (named ``*.lmdb`` for reference CLI parity)
containing ``data.tsr`` plus the builder's ``img_filenames.csv``.
"""

from __future__ import annotations

import ctypes
import mmap
import os
import struct
import subprocess
import threading
from typing import Iterator, List, Optional

_MAGIC = b"TSRSTOR1"
_HEADER = struct.Struct("<8sQQ")  # magic, count, index_offset
_REC = struct.Struct("<IQ")  # key_len, val_len
_IDX = struct.Struct("<IQQ")  # key_len, val_offset, val_len

DATA_FILENAME = "data.tsr"

_native_lock = threading.Lock()
_native_lib: Optional[ctypes.CDLL] = None
_native_failed = False


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")


def load_native() -> Optional[ctypes.CDLL]:
    """Load (building on first use) the native library; None if unavailable."""
    global _native_lib, _native_failed
    with _native_lock:
        if _native_lib is not None or _native_failed:
            return _native_lib
        so_path = os.path.join(_native_dir(), "libtsrstore.so")
        try:
            # Always invoke make (a no-op when fresh): timestamp-based
            # rebuild keeps a stale .so from serving an old ABI after the
            # source changes. The flock serializes concurrent first-use
            # builds across processes (two CLIs starting on a fresh checkout
            # used to race make and dlopen a half-written .so); the Makefile
            # additionally renames the .so into place atomically.
            import fcntl

            with open(os.path.join(_native_dir(), ".build.lock"), "w") as lock:
                fcntl.flock(lock, fcntl.LOCK_EX)
                subprocess.run(
                    ["make", "-C", _native_dir()],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            lib = ctypes.CDLL(so_path)
        except Exception:
            _native_failed = True
            return None
        lib.tsr_writer_open.restype = ctypes.c_void_p
        lib.tsr_writer_open.argtypes = [ctypes.c_char_p]
        lib.tsr_writer_put.restype = ctypes.c_int
        lib.tsr_writer_put.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint32, ctypes.c_char_p, ctypes.c_uint64,
        ]
        lib.tsr_writer_close.restype = ctypes.c_int
        lib.tsr_writer_close.argtypes = [ctypes.c_void_p]
        lib.tsr_writer_abort.restype = ctypes.c_int
        lib.tsr_writer_abort.argtypes = [ctypes.c_void_p]
        lib.tsr_reader_open.restype = ctypes.c_void_p
        lib.tsr_reader_open.argtypes = [ctypes.c_char_p]
        lib.tsr_reader_count.restype = ctypes.c_uint64
        lib.tsr_reader_count.argtypes = [ctypes.c_void_p]
        lib.tsr_reader_key.restype = ctypes.c_int
        lib.tsr_reader_key.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_uint32),
        ]
        lib.tsr_reader_get.restype = ctypes.c_int
        lib.tsr_reader_get.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.tsr_reader_get_at.restype = ctypes.c_int
        lib.tsr_reader_get_at.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.tsr_reader_close.restype = None
        lib.tsr_reader_close.argtypes = [ctypes.c_void_p]
        _native_lib = lib
        return lib


def _data_path(db_dir: str) -> str:
    return os.path.join(db_dir, DATA_FILENAME)


class RecordWriter:
    """Append-only writer; call close() to finalize the sorted index."""

    def __init__(self, db_dir: str, use_native: bool = True):
        os.makedirs(db_dir, exist_ok=True)
        self._path = _data_path(db_dir)
        self._lib = load_native() if use_native else None
        self._handle = None
        self._pyfile = None
        self._pyindex: List[tuple] = []
        if self._lib is not None:
            self._handle = self._lib.tsr_writer_open(self._path.encode())
            if not self._handle:
                raise IOError(f"tsrstore: cannot open {self._path} for writing")
        else:
            self._pyfile = open(self._path, "wb")
            self._pyfile.write(_HEADER.pack(_MAGIC, 0, 0))
            self._pypos = _HEADER.size

    def put(self, key: bytes, value: bytes) -> None:
        if isinstance(key, str):
            key = key.encode("ascii")
        if self._handle is not None:
            rc = self._lib.tsr_writer_put(self._handle, key, len(key), value, len(value))
            if rc != 0:
                raise IOError("tsrstore: write failed")
        else:
            self._pyfile.write(_REC.pack(len(key), len(value)))
            self._pyfile.write(key)
            self._pyfile.write(value)
            val_offset = self._pypos + _REC.size + len(key)
            self._pyindex.append((key, val_offset, len(value)))
            self._pypos = val_offset + len(value)

    def close(self) -> None:
        if self._handle is not None:
            rc = self._lib.tsr_writer_close(self._handle)
            self._handle = None
            if rc != 0:
                raise IOError("tsrstore: close failed")
        elif self._pyfile is not None:
            index_offset = self._pypos
            # duplicate puts resolve to the latest value — the reference's
            # LMDB txn.put overwrite semantics (build_lmdb.py:136), identical
            # to the native writer's stable-sort + last-of-run dedup
            dedup = {}
            for key, off, length in self._pyindex:
                dedup[key] = (off, length)
            for key in sorted(dedup):
                off, length = dedup[key]
                self._pyfile.write(_IDX.pack(len(key), off, length))
                self._pyfile.write(key)
            self._pyfile.seek(8)
            self._pyfile.write(struct.pack("<QQ", len(dedup), index_offset))
            self._pyfile.close()
            self._pyfile = None

    def abort(self) -> None:
        """Release file handles WITHOUT finalizing: no index is written and
        the header keeps its zeroed count/index_offset, so a later open of
        the partial file raises IOError instead of serving a valid-looking
        truncated dataset. The directory may hold the partial data file
        (callers delete it)."""
        if self._handle is not None:
            self._lib.tsr_writer_abort(self._handle)
            self._handle = None
        elif self._pyfile is not None:
            self._pyfile.close()
            self._pyfile = None

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        # commit only on clean exit: closing during exception propagation
        # would finalize a valid-looking database holding a silently
        # truncated record set (review r3; build_db.py guards the same way)
        if exc_type is None:
            self.close()
        else:
            self.abort()


class RecordReader:
    """Read-only, memory-mapped view of a database directory.

    Safe to open independently in each reader process (the mmap pages are
    shared through the page cache, like the reference's LMDB readers).

    Databases built by the *reference* (real LMDB files, imagereader.py:120)
    are auto-detected and served through :class:`LmdbRecordReader` — the
    same interface over the pure-Python LMDB parser (lmdb_compat.py), so
    reference deployments can bring their data unconverted.
    """

    def __new__(cls, db_dir: str, use_native: bool = True):
        if cls is RecordReader and not os.path.exists(_data_path(db_dir)):
            from tpuseg.data import lmdb_compat

            if lmdb_compat.lmdb_data_path(db_dir) is not None:
                return super().__new__(LmdbRecordReader)
        return super().__new__(cls)

    def __init__(self, db_dir: str, use_native: bool = True):
        path = _data_path(db_dir)
        if not os.path.exists(path):
            raise IOError(f"Missing Database: {db_dir}")  # message parity imagereader.py:110-113
        self._lib = load_native() if use_native else None
        self._handle = None
        self._mm = None
        self._keys: Optional[List[bytes]] = None
        if self._lib is not None:
            self._handle = self._lib.tsr_reader_open(path.encode())
            if not self._handle:
                raise IOError(f"tsrstore: cannot open {path}")
            self._count = int(self._lib.tsr_reader_count(self._handle))
        else:
            f = open(path, "rb")
            try:
                self._mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
            except ValueError as e:  # 0-byte file: "cannot mmap an empty file"
                raise IOError(f"tsrstore: cannot map {path}: {e}")
            finally:
                f.close()
            try:
                magic, count, index_offset = _HEADER.unpack_from(self._mm, 0)
            except struct.error as e:  # < 24-byte file (builder killed early)
                raise IOError(f"tsrstore: truncated header in {path}: {e}")
            if magic != _MAGIC:
                raise IOError(f"tsrstore: bad magic in {path}")
            # corruption sanity, mirroring the native reader: the index must
            # lie inside the file and each entry is >= _IDX.size bytes
            size = len(self._mm)
            if (index_offset < _HEADER.size or index_offset > size
                    or count > (size - index_offset) // _IDX.size):
                raise IOError(f"tsrstore: corrupt header in {path}")
            self._count = count
            self._index = []
            self._by_key = {}
            pos = index_offset
            for i in range(count):
                if size - pos < _IDX.size:
                    raise IOError(f"tsrstore: truncated index in {path}")
                kl, off, length = _IDX.unpack_from(self._mm, pos)
                pos += _IDX.size
                if size - pos < kl or off > size or size - off < length:
                    raise IOError(f"tsrstore: corrupt index entry in {path}")
                key = bytes(self._mm[pos:pos + kl])
                pos += kl
                self._index.append((key, off, length))
                self._by_key[key] = i

    def __len__(self) -> int:
        return self._count

    def _check_open(self) -> None:
        # use-after-close used to surface as AttributeError from the native
        # branch falling through to never-created pure-Python state
        if self._handle is None and self._mm is None:
            raise ValueError("tsrstore: reader is closed")

    def keys(self) -> List[bytes]:
        """All keys in sorted order (LMDB cursor iteration parity)."""
        if self._keys is None:
            self._check_open()
            if self._handle is not None:
                out = []
                kp = ctypes.c_char_p()
                klen = ctypes.c_uint32()
                for i in range(self._count):
                    if self._lib.tsr_reader_key(self._handle, i, ctypes.byref(kp), ctypes.byref(klen)) != 0:
                        raise IOError("tsrstore: key read failed")
                    out.append(ctypes.string_at(kp, klen.value))
                self._keys = out
            else:
                self._keys = [k for k, _, _ in self._index]
        return self._keys

    def get(self, key: bytes) -> bytes:
        self._check_open()
        if isinstance(key, str):
            key = key.encode("ascii")
        if self._handle is not None:
            vp = ctypes.c_char_p()
            vlen = ctypes.c_uint64()
            if self._lib.tsr_reader_get(self._handle, key, len(key), ctypes.byref(vp), ctypes.byref(vlen)) != 0:
                raise KeyError(key)
            return ctypes.string_at(vp, vlen.value)
        i = self._by_key.get(key)
        if i is None:
            raise KeyError(key)
        _, off, length = self._index[i]
        return bytes(self._mm[off:off + length])

    def get_at(self, i: int) -> bytes:
        """Value at sorted position i — avoids key marshalling on the hot
        path. Negative indices wrap Python-style on both backends (they used
        to wrap through c_uint64 on the native one only)."""
        self._check_open()
        if i < 0:
            i += self._count
        if not 0 <= i < self._count:
            raise IndexError(i)
        if self._handle is not None:
            vp = ctypes.c_char_p()
            vlen = ctypes.c_uint64()
            if self._lib.tsr_reader_get_at(self._handle, i, ctypes.byref(vp), ctypes.byref(vlen)) != 0:
                raise IndexError(i)
            return ctypes.string_at(vp, vlen.value)
        key, off, length = self._index[i]
        return bytes(self._mm[off:off + length])

    def __iter__(self) -> Iterator[bytes]:
        for i in range(self._count):
            yield self.get_at(i)

    def close(self) -> None:
        if self._handle is not None:
            self._lib.tsr_reader_close(self._handle)
            self._handle = None
        if self._mm is not None:
            self._mm.close()
            self._mm = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class LmdbRecordReader(RecordReader):
    """RecordReader interface over a *reference-built* LMDB database.

    Instantiated transparently by ``RecordReader(db)`` when the directory
    holds ``data.mdb`` instead of ``data.tsr`` (or by passing an
    ``MDB_NOSUBDIR`` single data file) — the dataset-interop path
    (imagereader.py:120). Keys come back in LMDB's sorted cursor order,
    the same contract tsrstore's sorted index provides."""

    def __init__(self, db_dir: str, use_native: bool = True):
        from tpuseg.data import lmdb_compat

        self._r = lmdb_compat.LmdbReader(db_dir)
        self._count = len(self._r)

    def __len__(self) -> int:
        return self._count

    def keys(self) -> List[bytes]:
        return self._r.keys()

    def get(self, key) -> bytes:
        return self._r.get(key)

    def get_at(self, i: int) -> bytes:
        return self._r.get_at(i)

    def __iter__(self) -> Iterator[bytes]:
        return iter(self._r)

    def close(self) -> None:
        self._r.close()
