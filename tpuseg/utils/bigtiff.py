"""Minimal native BigTIFF tiled writer/reader.

The reference saves large inference masks as tiled, deflate-compressed
BigTIFF (``skimage.io.imsave(..., bigtiff=True, tile=(1024,1024),
compress=6)``, /root/reference/UNet/inference.py:221-222) so whole-slide
masks larger than the 4 GiB classic-TIFF limit remain writable. No TIFF
library with BigTIFF *write* support is available in this environment
(no tifffile; Pillow writes classic TIFF only), so this module implements
the format directly — it is ~the size of the wrapper code it replaces and
removes the dependency.

Scope: single-image grayscale or interleaved-multichannel BigTIFF, tiled,
Adobe-deflate (zlib) compressed — exactly the shape of the masks the
inference engine emits (uint8/uint16/int32, inference.py:215-220). The
reader handles everything the writer produces (plus uncompressed tiles)
and is used as the fallback for formats Pillow/cv2 cannot parse.

Format reference: TIFF 6.0 spec + the BigTIFF (version 43) extension:
16-byte header, 8-byte offsets, 20-byte IFD entries.
"""

from __future__ import annotations

import struct
import zlib
from typing import Dict, Tuple

import numpy as np

BIGTIFF_MAGIC = b"II+\x00"  # little-endian, version 43

# TIFF tag ids
_IMAGE_WIDTH = 256
_IMAGE_LENGTH = 257
_BITS_PER_SAMPLE = 258
_COMPRESSION = 259  # 1 = none, 8 = adobe deflate
_PHOTOMETRIC = 262  # 1 = BlackIsZero
_SAMPLES_PER_PIXEL = 277
_PLANAR_CONFIG = 284  # 1 = chunky (interleaved)
_TILE_WIDTH = 322
_TILE_LENGTH = 323
_TILE_OFFSETS = 324
_TILE_BYTE_COUNTS = 325
_SAMPLE_FORMAT = 339  # 1 = uint, 2 = int, 3 = float

_TYPE_SHORT = 3  # u16
_TYPE_LONG8 = 16  # u64

_SAMPLE_FORMATS = {"u": 1, "i": 2, "f": 3}
_FORMAT_DTYPES = {(1, 8): np.uint8, (1, 16): np.uint16, (1, 32): np.uint32,
                  (2, 8): np.int8, (2, 16): np.int16, (2, 32): np.int32,
                  (3, 32): np.float32, (3, 64): np.float64}


def is_bigtiff(fp: str) -> bool:
    with open(fp, "rb") as f:
        return f.read(4) == BIGTIFF_MAGIC


def write_bigtiff(fp: str, img: np.ndarray, tile: Tuple[int, int] = (1024, 1024),
                  compression: str = "deflate", level: int = 6) -> None:
    """Write ``img`` (HW or HWC) as a tiled BigTIFF.

    ``level=6`` matches the reference's ``compress=6`` (inference.py:222).
    """
    img = np.ascontiguousarray(img)
    if img.ndim == 2:
        h, w = img.shape
        spp = 1
    elif img.ndim == 3:
        h, w, spp = img.shape
    else:
        raise ValueError(f"BigTIFF writer expects HW or HWC, got {img.shape}")
    kind = img.dtype.kind
    if kind not in _SAMPLE_FORMATS:
        raise ValueError(f"unsupported dtype {img.dtype}")
    th, tw = tile
    compress = compression == "deflate"

    tiles_down = -(-h // th)
    tiles_across = -(-w // tw)
    offsets = []
    counts = []

    with open(fp, "wb") as f:
        # header: magic, offset size 8, pad, first-IFD offset (patched later)
        f.write(BIGTIFF_MAGIC + struct.pack("<HHQ", 8, 0, 0))
        # tile data, row-major over the tile grid; edge tiles are zero-padded
        # to full tile size per the TIFF spec
        for ty in range(tiles_down):
            for tx in range(tiles_across):
                block = np.zeros((th, tw, spp), img.dtype)
                ys, xs = ty * th, tx * tw
                sub = img[ys:ys + th, xs:xs + tw]
                sub = sub.reshape(sub.shape[0], sub.shape[1], spp)
                block[:sub.shape[0], :sub.shape[1]] = sub
                raw = block.tobytes()
                data = zlib.compress(raw, level) if compress else raw
                if f.tell() % 2:
                    f.write(b"\x00")  # keep offsets word-aligned
                offsets.append(f.tell())
                counts.append(len(data))
                f.write(data)

        # out-of-line arrays for tile offsets/bytecounts (always LONG8)
        def write_array(values):
            if f.tell() % 2:
                f.write(b"\x00")
            pos = f.tell()
            f.write(struct.pack(f"<{len(values)}Q", *values))
            return pos

        n_tiles = len(offsets)
        if n_tiles == 1:
            off_value, cnt_value = offsets[0], counts[0]
        else:
            off_value = write_array(offsets)
            cnt_value = write_array(counts)

        entries = [
            (_IMAGE_WIDTH, _TYPE_LONG8, 1, w),
            (_IMAGE_LENGTH, _TYPE_LONG8, 1, h),
            (_BITS_PER_SAMPLE, _TYPE_SHORT, 1, img.dtype.itemsize * 8),
            (_COMPRESSION, _TYPE_SHORT, 1, 8 if compress else 1),
            (_PHOTOMETRIC, _TYPE_SHORT, 1, 1),
            (_SAMPLES_PER_PIXEL, _TYPE_SHORT, 1, spp),
            (_PLANAR_CONFIG, _TYPE_SHORT, 1, 1),
            (_TILE_WIDTH, _TYPE_SHORT, 1, tw),
            (_TILE_LENGTH, _TYPE_SHORT, 1, th),
            (_TILE_OFFSETS, _TYPE_LONG8, n_tiles, off_value),
            (_TILE_BYTE_COUNTS, _TYPE_LONG8, n_tiles, cnt_value),
            (_SAMPLE_FORMAT, _TYPE_SHORT, 1, _SAMPLE_FORMATS[kind]),
        ]
        if f.tell() % 2:
            f.write(b"\x00")
        ifd_offset = f.tell()
        f.write(struct.pack("<Q", len(entries)))
        for tag, typ, count, value in sorted(entries):
            f.write(struct.pack("<HHQQ", tag, typ, count, value))
        f.write(struct.pack("<Q", 0))  # no next IFD

        f.seek(8)
        f.write(struct.pack("<Q", ifd_offset))


def _read_ifd(f) -> Dict[int, Tuple[int, int, int]]:
    (n,) = struct.unpack("<Q", f.read(8))
    entries = {}
    for _ in range(n):
        tag, typ, count, value = struct.unpack("<HHQQ", f.read(20))
        entries[tag] = (typ, count, value)
    return entries


def _tag_array(f, entry) -> np.ndarray:
    typ, count, value = entry
    size = {_TYPE_SHORT: 2, _TYPE_LONG8: 8, 4: 4}[typ]
    fmt = {_TYPE_SHORT: "H", _TYPE_LONG8: "Q", 4: "I"}[typ]
    if count * size <= 8:
        # inline little-endian packing of the value field
        raw = struct.pack("<Q", value)[:count * size]
    else:
        f.seek(value)
        raw = f.read(count * size)
    return np.frombuffer(raw, f"<{fmt}")


def read_bigtiff(fp: str) -> np.ndarray:
    """Read a (single-image, tiled or single-tile) BigTIFF written by
    :func:`write_bigtiff` — grayscale or chunky multichannel, deflate or
    uncompressed."""
    with open(fp, "rb") as f:
        if f.read(4) != BIGTIFF_MAGIC:
            raise IOError(f"not a little-endian BigTIFF: {fp}")
        _, _, ifd_offset = struct.unpack("<HHQ", f.read(12))
        f.seek(ifd_offset)
        tags = _read_ifd(f)

        def scalar(tag, default=None):
            if tag not in tags:
                if default is None:
                    raise IOError(f"BigTIFF missing required tag {tag}: {fp}")
                return default
            return int(_tag_array(f, tags[tag])[0])

        w, h = scalar(_IMAGE_WIDTH), scalar(_IMAGE_LENGTH)
        bits = scalar(_BITS_PER_SAMPLE, 8)
        comp = scalar(_COMPRESSION, 1)
        spp = scalar(_SAMPLES_PER_PIXEL, 1)
        tw, th = scalar(_TILE_WIDTH), scalar(_TILE_LENGTH)
        fmt = scalar(_SAMPLE_FORMAT, 1)
        dtype = _FORMAT_DTYPES.get((fmt, bits))
        if dtype is None:
            raise IOError(f"unsupported sample format {(fmt, bits)}: {fp}")
        if comp not in (1, 8):
            raise IOError(f"unsupported compression {comp}: {fp}")

        offsets = _tag_array(f, tags[_TILE_OFFSETS])
        counts = _tag_array(f, tags[_TILE_BYTE_COUNTS])
        tiles_across = -(-w // tw)
        out = np.zeros((-(-h // th) * th, tiles_across * tw, spp), dtype)
        for i, (off, cnt) in enumerate(zip(offsets, counts)):
            f.seek(int(off))
            data = f.read(int(cnt))
            if comp == 8:
                data = zlib.decompress(data)
            block = np.frombuffer(data, dtype).reshape(th, tw, spp)
            ty, tx = divmod(i, tiles_across)
            out[ty * th:(ty + 1) * th, tx * tw:(tx + 1) * tw] = block
    out = out[:h, :w]
    return out[..., 0] if spp == 1 else out
