"""Dataset builder: folders of image/mask files -> train/test record stores.

Re-implements the behavior of the reference ``UNet/build_lmdb.py`` against
the native tsrstore backend:

- shuffled train/test split at ``train_fraction`` (build_lmdb.py:218-222);
- optional sliding-window tiling with stride ``tile_size - RADIUS`` and
  slide-to-fit at the right/bottom edges (build_lmdb.py:82-126);
- per-record keys carrying the classes present, ``{name}_i{y}_j{x}:{c0,c1}``
  (tiled, build_lmdb.py:117-124) or ``{name}:{c0,c1}`` (whole image,
  build_lmdb.py:172-178) — the class-balanced sampler indexes on these;
- whole images center-cropped to a multiple of 16 (build_lmdb.py:63-79);
- ``img_filenames.csv`` manifest in the database directory
  (build_lmdb.py:139-141).

Database directories are named ``{train,test}-{name}.lmdb`` for CLI parity
even though the engine is tsrstore.
"""

from __future__ import annotations

import os
import random
import shutil
from typing import List, Optional, Sequence, Tuple

import numpy as np

from tpuseg import RADIUS, SIZE_FACTOR
from tpuseg.data.isg_ai_pb2 import ImageMaskPair
from tpuseg.data.recordstore import RecordWriter
from tpuseg.utils.imagio import imread


def serialize_image_mask_pair(img: np.ndarray, msk: np.ndarray) -> bytes:
    """Encode one (image, mask) pair as the wire-compatible protobuf record
    (reference write_img_to_db, build_lmdb.py:29-60)."""
    if not isinstance(img, np.ndarray) or not isinstance(msk, np.ndarray):
        raise TypeError("Img must be numpy array to store into db")
    if img.ndim > 3 or img.ndim < 2:
        raise ValueError("Img must be 2D or 3D [HW, or HWC] format")
    if img.ndim == 2:
        img = img.reshape((img.shape[0], img.shape[1], 1))

    datum = ImageMaskPair()
    datum.channels = img.shape[2]
    datum.img_height = img.shape[0]
    datum.img_width = img.shape[1]
    datum.img_type = img.dtype.str
    datum.mask_type = msk.dtype.str
    datum.image = img.tobytes()
    datum.mask = msk.tobytes()
    datum.labels = np.unique(msk).tobytes()
    return datum.SerializeToString()


def deserialize_image_mask_pair(buf: bytes) -> Tuple[np.ndarray, np.ndarray]:
    """Decode a record back to (image HWC, mask HW) numpy arrays
    (reference decode, imagereader.py:269-281)."""
    datum = ImageMaskPair()
    datum.ParseFromString(buf)
    img = np.frombuffer(datum.image, dtype=np.dtype(datum.img_type))
    img = img.reshape((datum.img_height, datum.img_width, datum.channels))
    msk = np.frombuffer(datum.mask, dtype=np.dtype(datum.mask_type))
    msk = msk.reshape((datum.img_height, datum.img_width))
    return img, msk


def enforce_size_multiple(img: np.ndarray) -> np.ndarray:
    """Center-crop H,W down to multiples of 16 (build_lmdb.py:63-79)."""
    h, w = img.shape[0], img.shape[1]
    tgt_h = (h // SIZE_FACTOR) * SIZE_FACTOR
    tgt_w = (w // SIZE_FACTOR) * SIZE_FACTOR
    dh, dw = h - tgt_h, w - tgt_w
    img = img[dh // 2:, dw // 2:]
    return img[:tgt_h, :tgt_w]


def _present_classes_str(msk: np.ndarray) -> str:
    return ",".join(str(c) for c in np.unique(msk))


def tiling_boxes(height: int, width: int, tile_size: int) -> List[Tuple[int, int, int, int]]:
    """(y_st, x_st, y_end, x_end) boxes: stride ``tile_size - RADIUS``, edge
    boxes slid inward to fit, in the reference's column-major emission order
    (build_lmdb.py:82-126)."""
    delta = int(tile_size - RADIUS)
    boxes = []
    seen = set()
    for x_st in range(0, width, delta):
        for y_st in range(0, height, delta):
            x_end, y_end = x_st + tile_size, y_st + tile_size
            if x_end > width:
                x_st += width - x_end
                x_end = width
            if y_end > height:
                y_st += height - y_end
                y_end = height
            box = (y_st, x_st, y_end, x_end)
            # slide-to-fit can collapse several grid cells onto one box
            # (e.g. a 512^2 image at tile 512 collapses all 4); the
            # reference emits the duplicates too, but its LMDB txn.put
            # overwrites same-key records — the append-only RecordWriter
            # would keep every copy and skew sampling toward edge tiles
            # (review r3), so dedupe to the reference's net result
            if box not in seen:
                seen.add(box)
                boxes.append(box)
    return boxes


def process_slide_tiling(
    img: np.ndarray, msk: np.ndarray, tile_size: int, block_key: str
) -> Tuple[List[np.ndarray], List[np.ndarray], List[str]]:
    """Overlapping tile grid over in-RAM arrays (build_lmdb.py:82-126)."""
    img_list, msk_list, key_list = [], [], []
    for y_st, x_st, y_end, x_end in tiling_boxes(img.shape[0], img.shape[1], tile_size):
        img_tile = img[y_st:y_end, x_st:x_end]
        msk_tile = msk[y_st:y_end, x_st:x_end]
        img_list.append(img_tile)
        msk_list.append(msk_tile)
        key_list.append(f"{block_key}_i{y_st}_j{x_st}:{_present_classes_str(msk_tile)}")
    return img_list, msk_list, key_list


def _stream_slide_tiling(writer: RecordWriter, img_path: str, msk_path: str,
                         tile_size: int, block_key: str,
                         emitted: Optional[dict] = None) -> None:
    """Tile a whole-slide image/mask pair straight from tiled BigTIFF into
    the record store without materializing either — the builder analog of
    streaming inference. The reference (and the in-RAM path below) loads
    whole images (build_lmdb.py:149-151), so slides larger than host RAM
    could not be turned into training data at all. Keys and record contents
    are identical to the in-RAM path (tested)."""
    from tpuseg.utils.bigtiff import BigTiffReader

    with BigTiffReader(img_path) as ir, BigTiffReader(msk_path) as mr:
        if ir.height < tile_size or ir.width < tile_size:
            # slide-to-fit would need negative region starts, which
            # read_region rejects; IOError (before any put) routes the pair
            # to the in-RAM path, whose negative-index slicing handles
            # sub-tile images with reference parity (review r3)
            raise IOError(
                f"slide {ir.height}x{ir.width} smaller than tile_size "
                f"{tile_size}; in-RAM path handles it: {img_path}")
        if (ir.height, ir.width) != (mr.height, mr.width):
            raise AssertionError(
                "Image and Mask must be the same Height, input images should be "
                "either HW or HWC dimension ordering")
        if mr.channels != 1:
            raise ValueError(
                f"mask must be grayscale, got {mr.channels} channels: {msk_path}")
        _check_mask_dtype(mr.dtype, msk_path)
        for y_st, x_st, y_end, x_end in tiling_boxes(ir.height, ir.width, tile_size):
            t = ir.read_region(y_st, x_st, y_end - y_st, x_end - x_st)
            m = mr.read_region(y_st, x_st, y_end - y_st, x_end - x_st)[..., 0]
            key = f"{block_key}_i{y_st}_j{x_st}:{_present_classes_str(m)}"
            writer.put(key, serialize_image_mask_pair(t, m))
            if emitted is not None:
                # lets the caller distinguish "failed before any write"
                # (safe to fall back) from "failed mid-stream" (falling
                # back would duplicate the already-written keys)
                emitted["records"] = emitted.get("records", 0) + 1


def _check_mask_dtype(dtype, msk_path: str) -> None:
    """Masks must be integer class ids (README.md:19-20: uint8/uint16/int32).
    Float masks would build keys like 'name:0.0,1.0' that crash the
    class-balanced sampler much later — fail fast at build time instead."""
    if np.dtype(dtype).kind not in "iu":
        raise ValueError(
            f"mask dtype must be an integer type (uint8/uint16/int32), got "
            f"{np.dtype(dtype)}: {msk_path}")


def generate_database(
    img_list: Sequence[str],
    database_name: str,
    image_filepath: str,
    mask_filepath: str,
    output_folder: str,
    tile_size: int,
) -> str:
    """Build one database directory from matched image/mask files
    (build_lmdb.py:129-188). Returns the database path."""
    db_dir = os.path.join(output_folder, database_name)
    if os.path.exists(db_dir):
        print("Deleting existing database")
        shutil.rmtree(db_dir)
    os.makedirs(db_dir)

    with open(os.path.join(db_dir, "img_filenames.csv"), "w") as csvfile:
        for fn in img_list:
            csvfile.write(fn + "\n")

    writer = RecordWriter(db_dir)
    try:
        from tpuseg.utils.bigtiff import is_bigtiff

        for i, img_file_name in enumerate(img_list):
            print(f"  {i}/{len(img_list)}")
            block_key = os.path.splitext(img_file_name)[0]
            img_path = os.path.join(image_filepath, img_file_name)
            msk_path = os.path.join(mask_filepath, img_file_name)

            if tile_size > 0 and is_bigtiff(img_path) and is_bigtiff(msk_path):
                # whole-slide pair: tile straight from disk, never
                # materializing the image (reference loads it whole,
                # build_lmdb.py:149-151 — impossible for >RAM slides)
                emitted: dict = {}
                try:
                    _stream_slide_tiling(writer, img_path, msk_path,
                                         tile_size, block_key, emitted)
                    continue
                except IOError:
                    # foreign BigTIFF dialect (strip layout, LZW, ...):
                    # fall back to the in-RAM path, whose imread fallbacks
                    # (imageio/cv2 libtiff) handle those files — but only
                    # if nothing was written yet: a mid-stream I/O error
                    # after some puts must propagate, or the append-only
                    # store would hold the streamed tiles AND the in-RAM
                    # copies (duplicate keys skew sampling; ADVICE r2)
                    if emitted.get("records"):
                        raise

            img = imread(os.path.join(image_filepath, img_file_name))
            # mask dtype is preserved (reference write_img_to_db keeps it,
            # build_lmdb.py:51-52; README.md:19-20 allows uint8/uint16/int32
            # masks whose class ids may exceed 255)
            msk = imread(os.path.join(mask_filepath, img_file_name))
            if msk.ndim == 3 and msk.shape[2] == 1:
                msk = msk[..., 0]
            if msk.ndim != 2:
                # fail fast like the streaming path (mr.channels != 1): a
                # multichannel mask would serialize 3*H*W bytes and only
                # blow up on reshape deep inside the training pipeline
                raise ValueError(
                    f"mask must be grayscale, got shape {msk.shape}: {msk_path}")
            _check_mask_dtype(msk.dtype, msk_path)
            assert img.shape[0] == msk.shape[0], (
                "Image and Mask must be the same Height, input images should be "
                "either HW or HWC dimension ordering")
            assert img.shape[1] == msk.shape[1], (
                "Image and Mask must be the same Width, input images should be "
                "either HW or HWC dimension ordering")

            if tile_size > 0:
                tiles, mtiles, keys = process_slide_tiling(img, msk, tile_size, block_key)
                for t, m, k in zip(tiles, mtiles, keys):
                    writer.put(k, serialize_image_mask_pair(t, m))
            else:
                img = enforce_size_multiple(img)
                msk = enforce_size_multiple(msk)
                key = f"{block_key}:{_present_classes_str(msk)}"
                writer.put(key, serialize_image_mask_pair(img, msk))
    except BaseException:
        # abort, don't commit: close() would finalize a valid-looking
        # database holding only the records built so far — a silently
        # truncated dataset that would train without error
        try:
            writer.abort()
        finally:
            shutil.rmtree(db_dir, ignore_errors=True)
        raise
    else:
        writer.close()
    return db_dir


def build_databases(
    image_folder: str,
    mask_folder: str,
    output_folder: str,
    dataset_name: str,
    train_fraction: float = 0.8,
    image_format: str = "tif",
    use_tiling: bool = False,
    tile_size: int = 512,
    seed: int | None = None,
) -> Tuple[str, str]:
    """Reference main() (build_lmdb.py:191-230): split and build both DBs."""
    if not use_tiling:
        tile_size = 0
    else:
        assert tile_size % SIZE_FACTOR == 0, "UNet requires tiles with shapes that are multiples of 16"

    image_format = image_format.lstrip(".")
    image_folder = os.path.abspath(image_folder)
    mask_folder = os.path.abspath(mask_folder)
    output_folder = os.path.abspath(output_folder)
    os.makedirs(output_folder, exist_ok=True)

    img_files = [f for f in os.listdir(mask_folder) if f.endswith(f".{image_format}")]
    if len(img_files) == 0:
        raise RuntimeError("Found no images")

    rng = random.Random(seed)
    rng.shuffle(img_files)
    idx = int(train_fraction * len(img_files))
    train_img_files = img_files[:idx]
    test_img_files = img_files[idx:]

    print("building train database")
    train_db = generate_database(
        train_img_files, f"train-{dataset_name}.lmdb", image_folder, mask_folder, output_folder, tile_size)
    print("building test database")
    test_db = generate_database(
        test_img_files, f"test-{dataset_name}.lmdb", image_folder, mask_folder, output_folder, tile_size)
    return train_db, test_db
