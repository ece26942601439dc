"""Shear/einsum warp tests: parity with the host (scipy) affine path.

The Pallas shear kernel runs in interpret mode on the CPU test mesh, so
these cover the exact code path that executes on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuseg.aug.host import apply_affine_transformation
from tpuseg.ops.warp import (
    _apply_shear_x,
    _mirror_float,
    rotate,
    scale_translate,
    warp_affine_batch,
)


def _smooth_batch(b=2, n=64, c=1, seed=0):
    """Smooth test images: bilinear-resample differences stay tiny."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:n, 0:n].astype(np.float32) / n
    imgs = []
    for i in range(b):
        cx, cy, s = rng.uniform(0.3, 0.7, 3)
        img = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (0.05 + 0.1 * s)))
        imgs.append(img[..., None].repeat(c, axis=-1))
    return jnp.asarray(np.stack(imgs), jnp.float32)


def test_mirror_float():
    got = np.asarray(_mirror_float(jnp.asarray([-1.5, -0.5, 0.0, 3.0, 4.5, 6.0]), 5))
    np.testing.assert_allclose(got, [1.5, 0.5, 0.0, 3.0, 3.5, 2.0], atol=1e-6)


def test_shear_zero_offset_identity():
    img = jnp.asarray(np.random.default_rng(0).random((2, 16, 32)), jnp.float32)
    out = _apply_shear_x(img, jnp.zeros((2, 16)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_shear_integer_offset():
    img = jnp.zeros((1, 8, 32), jnp.float32).at[0, :, 10].set(1.0)
    # offset +3: out[c] = in[c+3] -> the spike moves from col 10 to col 7
    out = _apply_shear_x(img, jnp.full((1, 8), 3.0))
    assert float(out[0, 0, 7]) == pytest.approx(1.0, abs=1e-6)
    assert float(out[0, 0, 10]) == pytest.approx(0.0, abs=1e-6)


def test_shear_fractional_offset_blends():
    img = jnp.zeros((1, 8, 32), jnp.float32).at[0, :, 10].set(1.0)
    out = _apply_shear_x(img, jnp.full((1, 8), 0.25))
    assert float(out[0, 0, 9]) == pytest.approx(0.25, abs=1e-5)
    assert float(out[0, 0, 10]) == pytest.approx(0.75, abs=1e-5)


@pytest.mark.parametrize("angle", [0.0, 15.0, 90.0, 137.0, 245.0, 355.0])
def test_rotate_matches_host(angle):
    imgs = _smooth_batch()
    theta = jnp.full((2,), np.deg2rad(angle), jnp.float32)
    ours = np.asarray(rotate(imgs, theta))
    for i in range(2):
        ref = apply_affine_transformation(
            np.asarray(imgs[i]), angle, False, False, 0, 0, 1.0, 1.0)
        # interior comparison; the three 1-D shear resamples soften slightly
        # vs scipy's single 2-D bilinear — worst near the 45deg residual
        # (measured max ~0.056 on a sharp gaussian blob), zero at k*90deg
        np.testing.assert_allclose(ours[i][8:-8, 8:-8], ref[8:-8, 8:-8], atol=0.1)


def test_rotate_90_exact():
    imgs = jnp.asarray(np.random.default_rng(1).random((1, 32, 32, 1)), jnp.float32)
    out = np.asarray(rotate(imgs, jnp.asarray([np.pi / 2], jnp.float32)))
    np.testing.assert_allclose(out[0, ..., 0], np.rot90(np.asarray(imgs[0, ..., 0])),
                               atol=1e-5)


def test_scale_translate_matches_host():
    imgs = _smooth_batch()
    ours = np.asarray(scale_translate(
        imgs,
        sx=jnp.asarray([1.1, 0.92]), sy=jnp.asarray([0.95, 1.08]),
        tx=jnp.asarray([4.0, -3.0]), ty=jnp.asarray([-2.0, 5.0])))
    for i, (sx, sy, tx, ty) in enumerate([(1.1, 0.95, 4, -2), (0.92, 1.08, -3, 5)]):
        ref = apply_affine_transformation(
            np.asarray(imgs[i]), 0, False, False, tx, ty, sx, sy)
        np.testing.assert_allclose(ours[i][8:-8, 8:-8], ref[8:-8, 8:-8], atol=0.02)


def test_full_warp_matches_host():
    imgs = _smooth_batch()
    angle = 33.0
    ours = np.asarray(warp_affine_batch(
        imgs,
        theta=jnp.full((2,), np.deg2rad(angle)),
        tx=jnp.asarray([3.0, -2.0]), ty=jnp.asarray([-1.0, 4.0]),
        sx=jnp.asarray([1.05, 0.97]), sy=jnp.asarray([0.93, 1.02])))
    for i, (tx, ty, sx, sy) in enumerate([(3, -1, 1.05, 0.93), (-2, 4, 0.97, 1.02)]):
        ref = apply_affine_transformation(
            np.asarray(imgs[i]), angle, False, False, tx, ty, sx, sy)
        np.testing.assert_allclose(ours[i][10:-10, 10:-10], ref[10:-10, 10:-10], atol=0.065)


def test_warp_preserves_binary_mask_roundability():
    """A warped {0,1} mask must round back to a clean binary mask."""
    msk = np.zeros((1, 64, 64, 1), np.float32)
    msk[0, 16:48, 16:48, 0] = 1.0
    out = np.asarray(rotate(jnp.asarray(msk), jnp.asarray([0.4], jnp.float32)))
    rounded = np.round(out)
    assert set(np.unique(rounded)) <= {0.0, 1.0}
    assert rounded.sum() > 0.8 * msk.sum()
