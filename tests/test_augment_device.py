"""On-device augmentation tests: identity paths, host-parity geometry,
statistical properties, and the fused raw train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuseg.aug.device import (
    DeviceAugmentParams,
    _bilinear_sample,
    _gaussian_kernel,
    _mirror_index,
    _separable_blur,
    _warp_coords,
    augment_and_preprocess_batch,
)

NO_AUG = DeviceAugmentParams(
    reflection=False, rotation=False, jitter_severity=0.0,
    noise_severity=0.0, scale_severity=0.0, blur_max_sigma=0.0)


def _raw_batch(seed=0, n=2, h=32, w=32, c=1):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 4000, (n, h, w, c)).astype(np.uint16)
    msk = rng.integers(0, 2, (n, h, w)).astype(np.uint8)
    return jnp.asarray(img), jnp.asarray(msk)


def test_mirror_index_matches_numpy_reflect():
    size = 5
    idx = jnp.arange(-6, 12)
    got = np.asarray(_mirror_index(idx, size))
    padded = np.pad(np.arange(size), (6, 7), mode="reflect")
    np.testing.assert_array_equal(got, padded)


def test_identity_warp_is_exact():
    img = jnp.asarray(np.random.default_rng(0).random((16, 16, 1)), jnp.float32)
    rows, cols = _warp_coords(16, 16, jnp.float32(0), jnp.float32(0), jnp.float32(0),
                              jnp.float32(1), jnp.float32(1))
    out = _bilinear_sample(img, rows, cols)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_warp_matches_host_rotation():
    """Device warp at a fixed angle == host affine (scipy) on the interior."""
    from tpuseg.aug.host import apply_affine_transformation

    img_np = np.random.default_rng(1).random((64, 64, 1)).astype(np.float32)
    theta_deg = 37.0
    host = apply_affine_transformation(img_np, theta_deg, False, False, 0, 0, 1.0, 1.0)
    rows, cols = _warp_coords(64, 64, jnp.deg2rad(theta_deg), jnp.float32(0),
                              jnp.float32(0), jnp.float32(1), jnp.float32(1))
    dev = np.asarray(_bilinear_sample(jnp.asarray(img_np), rows, cols))
    np.testing.assert_allclose(dev[8:-8, 8:-8], host[8:-8, 8:-8], atol=1e-4)


def test_warp_matches_host_scale_translate():
    from tpuseg.aug.host import apply_affine_transformation

    img_np = np.random.default_rng(2).random((64, 64, 1)).astype(np.float32)
    host = apply_affine_transformation(img_np, 0, False, False, 5, -3, 1.1, 0.95)
    rows, cols = _warp_coords(64, 64, jnp.float32(0), jnp.float32(5), jnp.float32(-3),
                              jnp.float32(1.1), jnp.float32(0.95))
    dev = np.asarray(_bilinear_sample(jnp.asarray(img_np), rows, cols))
    np.testing.assert_allclose(dev[8:-8, 8:-8], host[8:-8, 8:-8], atol=1e-4)


def test_gaussian_kernel_normalized_and_delta():
    k = _gaussian_kernel(jnp.float32(1.5), 17)
    np.testing.assert_allclose(float(k.sum()), 1.0, rtol=1e-6)
    d = np.asarray(_gaussian_kernel(jnp.float32(0.0), 17))
    assert d[8] == 1.0 and d.sum() == 1.0


def test_separable_blur_matches_scipy():
    import scipy.ndimage

    img = np.random.default_rng(3).random((32, 32, 1)).astype(np.float32)
    sigma = 1.3
    k = _gaussian_kernel(jnp.float32(sigma), 17)
    ours = np.asarray(_separable_blur(jnp.asarray(img), k))
    ref = scipy.ndimage.gaussian_filter(img[..., 0], sigma, mode="mirror", truncate=8 / sigma)
    np.testing.assert_allclose(ours[..., 0], ref, atol=1e-3)


def test_no_aug_path_is_zscore_onehot_only():
    img, msk = _raw_batch()
    out_img, out_lbl = augment_and_preprocess_batch(
        jax.random.PRNGKey(0), img, msk, NO_AUG, 2, augment=False)
    assert out_img.dtype == jnp.float32 and out_lbl.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out_img).mean(axis=(1, 2)), 0.0, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out_lbl).argmax(-1), np.asarray(msk))


def test_augment_changes_but_preserves_label_set():
    img, msk = _raw_batch(n=4)
    out_img, out_lbl = augment_and_preprocess_batch(
        jax.random.PRNGKey(1), img, msk, DeviceAugmentParams(), 2, augment=True)
    assert np.isfinite(np.asarray(out_img)).all()
    lbl = np.asarray(out_lbl)
    np.testing.assert_allclose(lbl.sum(-1), 1.0)  # valid one-hot after rounding
    # different key -> different augmentation
    out2, _ = augment_and_preprocess_batch(
        jax.random.PRNGKey(2), img, msk, DeviceAugmentParams(), 2, augment=True)
    assert not np.allclose(np.asarray(out_img), np.asarray(out2))


def test_augment_deterministic_per_key():
    img, msk = _raw_batch(n=2)
    a, _ = augment_and_preprocess_batch(jax.random.PRNGKey(5), img, msk,
                                        DeviceAugmentParams(), 2, True)
    b, _ = augment_and_preprocess_batch(jax.random.PRNGKey(5), img, msk,
                                        DeviceAugmentParams(), 2, True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_raw_train_step_learns():
    from tpuseg.models.unet import UNet
    from tpuseg.train.steps import create_train_state, make_jitted_raw_steps

    model = UNet(num_classes=2, base_features=2, dtype=jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), 1, 1e-2)
    tstep, estep = make_jitted_raw_steps(model, num_classes=2, augment=True)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 2, (2, 32, 32, 1)).astype(np.uint16) * 3000
    msk = (img[..., 0] > 0).astype(np.uint8)
    img_j, msk_j = jnp.asarray(img), jnp.asarray(msk)
    first = None
    for _ in range(10):
        state, m = tstep(state, img_j, msk_j)
        if first is None:
            first = float(m["loss"])
    assert float(m["loss"]) < first
    ev = estep(state, img_j, msk_j)
    assert np.isfinite(float(ev["loss"]))


def test_nonsquare_warp_no_gather_in_jaxpr():
    """Non-square batches must use the pad-to-square roll warp, never the
    gather path (gathers are ~18x slower on this backend; VERDICT r1 #8)."""
    from tpuseg.aug.device import DeviceAugmentParams, augment_and_preprocess_batch

    raw = jnp.zeros((2, 32, 64, 1), jnp.uint16)
    msk = jnp.zeros((2, 32, 64), jnp.uint8)
    jaxpr = jax.make_jaxpr(
        lambda r, i, m: augment_and_preprocess_batch(
            r, i, m, DeviceAugmentParams(), 2, True)
    )(jax.random.PRNGKey(0), raw, msk)
    assert "gather" not in str(jaxpr), "gather op leaked into the non-square warp"


def test_nonsquare_warp_matches_host_reference():
    """Pad-to-square -> shear warp -> crop equals the host (scipy-convention)
    warp on a non-square tile, for shared transform params (interior)."""
    from tpuseg.aug.host import apply_affine_transformation
    from tpuseg.ops.warp import warp_affine_batch

    h, w = 32, 64
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.exp(-(((xx / w - 0.4) ** 2 + (yy / h - 0.55) ** 2) / 0.07)).astype(np.float32)

    for theta_deg, jx, jy, sx, sy in [(20.0, 3, -2, 1.05, 0.95),
                                      (200.0, -4, 5, 0.92, 1.08)]:
        host = apply_affine_transformation(img[..., None], theta_deg, False, False,
                                           jx, jy, sx, sy)

        s_dim = max(h, w)
        py, px = (s_dim - h) // 2, (s_dim - w) // 2
        padded = jnp.pad(jnp.asarray(img[None, ..., None]),
                         ((0, 0), (py, s_dim - h - py), (px, s_dim - w - px), (0, 0)),
                         mode="reflect")
        out = np.asarray(warp_affine_batch(
            padded,
            theta=jnp.asarray([np.deg2rad(theta_deg)], jnp.float32),
            tx=jnp.asarray([jx + px * (1.0 - sx)], jnp.float32),
            ty=jnp.asarray([jy + py * (1.0 - sy)], jnp.float32),
            sx=jnp.asarray([sx]), sy=jnp.asarray([sy])))[0, py:py + h, px:px + w]

        diff = np.abs(out[8:-8, 8:-8] - host[8:-8, 8:-8])
        assert np.quantile(diff, 0.99) < 0.06, float(np.quantile(diff, 0.99))
        assert diff.max() < 0.15, float(diff.max())


def test_nonsquare_full_pipeline_runs_and_is_sane():
    from tpuseg.aug.device import DeviceAugmentParams, augment_and_preprocess_batch

    rng = np.random.default_rng(0)
    raw = rng.integers(100, 4000, (2, 32, 64, 1)).astype(np.uint16)
    msk = rng.integers(0, 2, (2, 32, 64)).astype(np.uint8)
    img, lbl = augment_and_preprocess_batch(
        jax.random.PRNGKey(1), jnp.asarray(raw), jnp.asarray(msk),
        DeviceAugmentParams(), 2, True)
    assert img.shape == (2, 32, 64, 1) and lbl.shape == (2, 32, 64, 2)
    np.testing.assert_allclose(np.asarray(img).mean(axis=(1, 2, 3)), 0.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(lbl).sum(-1), 1.0)
