"""Host augmentation tests: geometric identities, statistical properties,
and cross-validation of the rotation against an independent implementation."""

import numpy as np
import pytest

from tpuseg.aug.host import apply_affine_transformation, augment_image
from tpuseg.data.preprocess import one_hot_labels, zscore_normalize


def _img(h=64, w=64, c=1, seed=0):
    return np.random.default_rng(seed).random((h, w, c)).astype(np.float32)


def test_identity_transform_is_noop():
    img = _img()
    out = apply_affine_transformation(img, 0, False, False, 0, 0, 1.0, 1.0)
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_flips():
    img = _img()
    out = apply_affine_transformation(img, 0, True, False, 0, 0, 1.0, 1.0)
    np.testing.assert_allclose(out, np.fliplr(img), atol=1e-6)
    out = apply_affine_transformation(img, 0, False, True, 0, 0, 1.0, 1.0)
    np.testing.assert_allclose(out, np.flipud(img), atol=1e-6)


def test_rotation_90_matches_rot90():
    """90deg CCW about center == np.rot90 (skimage.rotate convention) for a
    square image, up to interpolation epsilon."""
    img = _img(32, 32)
    out = apply_affine_transformation(img, 90, False, False, 0, 0, 1.0, 1.0)
    np.testing.assert_allclose(out[..., 0], np.rot90(img[..., 0]), atol=1e-4)


def test_rotation_360_is_identity():
    img = _img()
    out = apply_affine_transformation(img, 360.0, False, False, 0, 0, 1.0, 1.0)
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_rotation_matches_opencv():
    """Cross-validate interior pixels of an arbitrary-angle rotation against
    cv2.warpAffine (independent implementation)."""
    cv2 = pytest.importorskip("cv2")
    img = _img(64, 64)[..., 0].astype(np.float64)
    angle = 33.0
    ours = apply_affine_transformation(img, angle, False, False, 0, 0, 1.0, 1.0)
    M = cv2.getRotationMatrix2D((63 / 2, 63 / 2), angle, 1.0)
    theirs = cv2.warpAffine(img, M, (64, 64), flags=cv2.INTER_LINEAR)
    # compare interior (boundary handling differs)
    np.testing.assert_allclose(ours[16:-16, 16:-16], theirs[16:-16, 16:-16], atol=2e-2)


def test_jitter_translates():
    """Positive jitter_x shifts content right by jitter_x pixels."""
    img = np.zeros((32, 32, 1), np.float32)
    img[16, 10, 0] = 1.0
    out = apply_affine_transformation(img, 0, False, False, 5, 0, 1.0, 1.0)
    assert out[16, 15, 0] == pytest.approx(1.0, abs=1e-5)
    out = apply_affine_transformation(img, 0, False, False, 0, 3, 1.0, 1.0)
    assert out[19, 10, 0] == pytest.approx(1.0, abs=1e-5)


def test_scale_is_corner_anchored():
    """Reference scale (AffineTransform(scale=...)) is anchored at (0,0):
    a point at col=10 under scale_x=2 lands at col=20."""
    img = np.zeros((64, 64, 1), np.float32)
    img[0, 10, 0] = 1.0
    out = apply_affine_transformation(img, 0, False, False, 0, 0, 2.0, 1.0)
    assert out[0, 20, 0] == pytest.approx(1.0, abs=1e-5)


def test_mask_rides_same_transform_and_rounds():
    rng = np.random.default_rng(1)
    img = _img(48, 48)
    mask = (np.arange(48 * 48).reshape(48, 48) % 2).astype(np.float32)
    img2, mask2 = augment_image(img, mask, rotation_flag=True, reflection_flag=True,
                                jitter_augmentation_severity=0.1,
                                scale_augmentation_severity=0.1, rng=rng)
    assert img2.shape == img.shape and mask2.shape == mask.shape
    assert set(np.unique(mask2)) <= {0.0, 1.0}  # rounded back to hard labels


def test_noise_statistics():
    rng = np.random.default_rng(2)
    img = np.zeros((128, 128, 1), np.float32)
    img[0, 0, 0] = 1.0  # dynamic range 1
    out = augment_image(img, noise_augmentation_severity=0.02, rng=rng)
    resid = out - img
    assert 0 < np.std(resid) <= 0.02 + 1e-3


def test_blur_applied_half_the_time():
    applied = 0
    trials = 200
    for i in range(trials):
        rng = np.random.default_rng(100 + i)
        img = _img(16, 16, seed=i)
        out = augment_image(img, blur_augmentation_max_sigma=2, rng=rng)
        if not np.allclose(out, img):
            applied += 1
    assert 60 < applied < 140  # ~Binomial(200, 0.5)


def test_worst_case_flag():
    img = _img(32, 32)
    rng = np.random.default_rng(3)
    out = augment_image(img, blur_augmentation_max_sigma=2, rng=rng, worst_case=True)
    assert not np.allclose(out, img)  # sigma forced to max -> always blurred


def test_severity_range_asserts():
    with pytest.raises(AssertionError):
        augment_image(_img(), jitter_augmentation_severity=1.5)


# --- preprocess ---

def test_zscore_chw():
    img = np.random.default_rng(4).normal(5, 3, (2, 32, 32)).astype(np.float32)
    out = zscore_normalize(img)
    for c in range(2):
        assert abs(out[c].mean()) < 1e-5
        assert abs(out[c].std() - 1) < 1e-5


def test_zscore_low_std_only_centers():
    img = np.full((16, 16), 7.25, np.float32)
    img[0, 0] = 7.5  # std << 1
    out = zscore_normalize(img)
    assert abs(out.mean()) < 1e-5
    assert out.max() - out.min() == pytest.approx(0.25, abs=1e-5)


def test_zscore_channels_last_roundtrip():
    img = np.random.default_rng(5).normal(0, 4, (16, 16, 3)).astype(np.float32)
    out = zscore_normalize(img, channels_first=False)
    assert out.shape == (16, 16, 3)
    for c in range(3):
        assert abs(out[..., c].std() - 1) < 1e-4


def test_one_hot():
    mask = np.array([[0, 1], [2, 1]])
    oh = one_hot_labels(mask, 3)
    assert oh.shape == (2, 2, 3)
    np.testing.assert_array_equal(oh.argmax(-1), mask)
    np.testing.assert_array_equal(oh.sum(-1), 1)


def test_one_hot_class_mismatch_message():
    with pytest.raises(IndexError, match="Number of classes specified differs"):
        one_hot_labels(np.array([[0, 3]]), 2)
