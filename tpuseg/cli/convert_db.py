"""CLI: convert datasets between the reference LMDB format and tsrstore.

The reference's durable artifact is an LMDB database of ``ImageMaskPair``
protobufs (imagereader.py:120, build_lmdb.py:136). tpuseg *reads* LMDB
databases directly (RecordReader auto-detects ``data.mdb`` via the
pure-Python parser in data/lmdb_compat.py), so conversion is optional for
training — this tool exists to (a) materialize a tsrstore copy for the
zero-copy native fast path, and (b) export a tpuseg-built dataset back to
LMDB for a reference deployment — the dataset analog of the two-way
checkpoint migration (import_checkpoint/export_checkpoint). tpuseg
extension — the reference has no converter tooling.
"""

import argparse
import os
import shutil


def convert(input_db: str, output_db: str, fmt: str) -> int:
    """Copy all records from ``input_db`` into a fresh ``output_db`` of
    format ``fmt`` ('tsr' or 'lmdb'); returns the record count. The
    builder's ``img_filenames.csv`` sidecar travels along when present."""
    from tpuseg.data.lmdb_compat import LmdbWriter
    from tpuseg.data.recordstore import RecordReader, RecordWriter

    if os.path.exists(output_db) and (
            not os.path.isdir(output_db) or os.listdir(output_db)):
        raise IOError(f"output database already exists and is not empty: {output_db}")
    pre_existing_dir = os.path.isdir(output_db)  # user-supplied empty dir
    reader = RecordReader(input_db)
    try:
        writer = None
        try:
            writer = LmdbWriter(output_db) if fmt == "lmdb" else RecordWriter(output_db)
            keys = reader.keys()
            for i, key in enumerate(keys):
                writer.put(key, reader.get_at(i))
            writer.close()
        except BaseException:
            # abort, don't commit: close() finalizes a valid-looking
            # database holding only the records copied so far — a silently
            # truncated dataset that would train without error
            if writer is not None:
                try:
                    writer.abort()
                except Exception:
                    pass  # cleanup failure must not mask the root cause
            # remove only what WE created: a pre-existing (empty) output
            # directory may be the user's mount point / prepared dir
            try:
                if pre_existing_dir:
                    for name in os.listdir(output_db):
                        p = os.path.join(output_db, name)
                        (shutil.rmtree if os.path.isdir(p) else os.remove)(p)
                else:
                    shutil.rmtree(output_db, ignore_errors=True)
            except OSError:
                pass  # best-effort cleanup; the root cause propagates
            raise
        count = len(keys)
    finally:
        reader.close()
    csv = os.path.join(input_db, "img_filenames.csv")
    if os.path.isdir(input_db) and os.path.exists(csv):
        shutil.copyfile(csv, os.path.join(output_db, "img_filenames.csv"))
    return count


def main(argv=None):
    from tpuseg.utils.compile_cache import enable as _enable_cache
    _enable_cache()

    parser = argparse.ArgumentParser(
        prog="convert_db",
        description="Convert a dataset between the reference's LMDB format "
                    "(imagereader.py:120) and tpuseg's tsrstore — both "
                    "directions; input format is auto-detected")
    parser.add_argument("--input_database", dest="input_database", type=str, required=True,
                        help="source database directory, either format (Required)")
    parser.add_argument("--output_database", dest="output_database", type=str, required=True,
                        help="destination database directory, must not exist (Required)")
    parser.add_argument("--format", dest="format", type=str, default="tsr",
                        choices=["tsr", "lmdb"],
                        help="output format: 'tsr' (tpuseg native, default) or "
                             "'lmdb' (reference interop)")
    args = parser.parse_args(argv)

    count = convert(args.input_database, args.output_database, args.format)
    print(f"Converted {count} records: {args.input_database} -> "
          f"{args.output_database} ({args.format})")


if __name__ == "__main__":
    main()
