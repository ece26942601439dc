"""On-device augmentation tests: identity paths, host-parity geometry,
statistical properties, and the fused raw train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuseg.aug.device import (
    DeviceAugmentParams,
    _gaussian_kernel,
    _separable_blur,
    augment_and_preprocess_batch,
)


# ---- gather-based warp oracle (test-only) ---------------------------------
# The production warp is the gather-free shear path (tpuseg.ops.warp); this
# independent bilinear-gather implementation of the same inverse map exists
# ONLY as a parity oracle here — it moved out of aug/device.py where it was
# dead code masquerading as the tested path (review r3).

def _mirror_index(idx, size):
    period = 2 * (size - 1) if size > 1 else 1
    idx = jnp.abs(idx)
    idx = jnp.mod(idx, period)
    return jnp.where(idx >= size, period - idx, idx).astype(jnp.int32)


def _bilinear_sample(img, rows, cols):
    h, w = img.shape[0], img.shape[1]
    r0, c0 = jnp.floor(rows), jnp.floor(cols)
    fr, fc = (rows - r0)[..., None], (cols - c0)[..., None]
    r0i, c0i = r0.astype(jnp.int32), c0.astype(jnp.int32)

    def gather(ri, ci):
        return img[_mirror_index(ri, h), _mirror_index(ci, w)]

    top = gather(r0i, c0i) * (1 - fc) + gather(r0i, c0i + 1) * fc
    bot = gather(r0i + 1, c0i) * (1 - fc) + gather(r0i + 1, c0i + 1) * fc
    return top * (1 - fr) + bot * fr


def _warp_coords(h, w, theta, tx, ty, sx, sy):
    rows = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    r1, c1 = (rows - ty) / sy, (cols - tx) / sx
    cy, cx = h / 2.0 - 0.5, w / 2.0 - 0.5
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    r2 = cos * (r1 - cy) + sin * (c1 - cx) + cy
    c2 = -sin * (r1 - cy) + cos * (c1 - cx) + cx
    return r2, c2


def _oracle_warp(img_np, theta_rad, tx, ty, sx, sy):
    rows, cols = _warp_coords(img_np.shape[0], img_np.shape[1],
                              jnp.float32(theta_rad), jnp.float32(tx),
                              jnp.float32(ty), jnp.float32(sx), jnp.float32(sy))
    return np.asarray(_bilinear_sample(jnp.asarray(img_np), rows, cols))

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


def test_shipped_warp_matches_gather_oracle():
    """The PRODUCTION shear warp (tpuseg.ops.warp.warp_affine_batch) agrees
    with the independent bilinear-gather oracle on random affines — the old
    tests validated only the oracle against the host, leaving the shipped
    path unpinned here (review r3). Interior compare: the three-shear
    rotation resamples once more than a direct bilinear map (softening),
    and boundary conventions differ within the halo."""
    from tpuseg.ops.warp import warp_affine_batch

    # smooth inputs: on white noise the extra shear resample legitimately
    # diverges from a single bilinear map (pure interpolation softening)
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32)
    base = (np.sin(yy / 6.0) + np.cos(xx / 9.0) + np.sin((xx + yy) / 13.0))
    imgs = np.stack([base * s for s in (1.0, 0.7, -1.3)])[..., None].astype(np.float32)
    thetas = np.array([0.0, np.deg2rad(37.0), np.deg2rad(-112.0)], np.float32)
    txs = np.array([0.0, 5.0, -3.0], np.float32)
    tys = np.array([0.0, -3.0, 2.0], np.float32)
    sxs = np.array([1.0, 1.1, 0.93], np.float32)
    sys_ = np.array([1.0, 0.95, 1.07], np.float32)
    dev = np.asarray(warp_affine_batch(
        jnp.asarray(imgs), jnp.asarray(thetas), jnp.asarray(txs),
        jnp.asarray(tys), jnp.asarray(sxs), jnp.asarray(sys_)))
    for i in range(3):
        want = _oracle_warp(imgs[i], thetas[i], txs[i], tys[i], sxs[i], sys_[i])
        # compare only output pixels whose inverse-mapped source lies well
        # inside the input: where the map reaches the border, the two
        # implementations' mirror conventions legitimately differ
        rows, cols = _warp_coords(64, 64, jnp.float32(thetas[i]),
                                  jnp.float32(txs[i]), jnp.float32(tys[i]),
                                  jnp.float32(sxs[i]), jnp.float32(sys_[i]))
        rows, cols = np.asarray(rows), np.asarray(cols)
        # ...and whose scale/translate-stage source stays inside the rotated
        # INTERMEDIATE image: the two-stage path mirrors at that boundary
        # too, which the composed single-resample oracle cannot reproduce
        yy2 = (np.arange(64, dtype=np.float32)[:, None] - tys[i]) / sys_[i]
        xx2 = (np.arange(64, dtype=np.float32)[None, :] - txs[i]) / sxs[i]
        mid_ok = ((yy2 >= 1) & (yy2 <= 62)) * ((xx2 >= 1) & (xx2 <= 62))
        valid = ((rows >= 6) & (rows <= 57) & (cols >= 6) & (cols <= 57)
                 & mid_ok)
        assert valid.sum() > 1500  # the mask must keep most of the image
        err = np.abs(dev[i, ..., 0] - want[..., 0])[valid]
        assert err.max() < 0.06, (i, err.max())


def test_oracle_matches_host_rotation():
    """The gather oracle itself == host affine (scipy) on the interior."""
    from tpuseg.aug.host import apply_affine_transformation

    img_np = np.random.default_rng(1).random((64, 64, 1)).astype(np.float32)
    host = apply_affine_transformation(img_np, 37.0, False, False, 0, 0, 1.0, 1.0)
    dev = _oracle_warp(img_np, np.deg2rad(37.0), 0, 0, 1.0, 1.0)
    np.testing.assert_allclose(dev[8:-8, 8:-8], host[8:-8, 8:-8], atol=1e-4)


def test_oracle_matches_host_scale_translate():
    from tpuseg.aug.host import apply_affine_transformation

    img_np = np.random.default_rng(2).random((64, 64, 1)).astype(np.float32)
    host = apply_affine_transformation(img_np, 0, False, False, 5, -3, 1.1, 0.95)
    dev = _oracle_warp(img_np, 0.0, 5, -3, 1.1, 0.95)
    np.testing.assert_allclose(dev[8:-8, 8:-8], host[8:-8, 8:-8], atol=1e-4)


def test_gaussian_kernel_normalized_and_delta():
    k = _gaussian_kernel(jnp.float32(1.5), 17)
    np.testing.assert_allclose(float(k.sum()), 1.0, rtol=1e-6)
    d = np.asarray(_gaussian_kernel(jnp.float32(0.0), 17))
    assert d[8] == 1.0 and d.sum() == 1.0


def test_separable_blur_matches_scipy():
    """Full-array compare against the REFERENCE blur mode: gaussian_filter
    mode='reflect' (scipy reflect = numpy 'symmetric'). The device blur
    used to pad numpy-'reflect' (= scipy 'mirror'), diverging up to 8% of
    the dynamic range near borders — invisible to interior-only compares
    (review r3)."""
    import scipy.ndimage

    img = np.random.default_rng(3).random((32, 32, 1)).astype(np.float32)
    sigma = 1.3
    k = _gaussian_kernel(jnp.float32(sigma), 17)
    ours = np.asarray(_separable_blur(jnp.asarray(img), k))
    ref = scipy.ndimage.gaussian_filter(img[..., 0], sigma, mode="reflect", truncate=8 / sigma)
    np.testing.assert_allclose(ours[..., 0], ref, atol=1e-3)

    identity = np.asarray(_separable_blur(jnp.asarray(img),
                                          _gaussian_kernel(jnp.float32(0.0), 17)))
    np.testing.assert_allclose(identity, img, atol=1e-6)


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
