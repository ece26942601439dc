"""Host vs device augmentation: same transform parameters -> same image.

The two pipelines draw their random parameters differently (numpy Generator
vs jax.random), so parity is checked at fixed parameters (geometry) and
statistically (full pipeline distributions).
"""

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.aug.device import DeviceAugmentParams, augment_and_preprocess_batch
from tpuseg.aug.host import apply_affine_transformation
from tpuseg.data.preprocess import zscore_normalize
from tpuseg.ops.warp import warp_affine_batch


def test_fixed_params_geometry_parity():
    """Device warp == host warp for shared (theta, jitter, scale) params on
    smooth data (interiors; resample-count differences only)."""
    n = 64
    yy, xx = np.mgrid[0:n, 0:n].astype(np.float32) / n
    img = np.exp(-(((xx - 0.4) ** 2 + (yy - 0.55) ** 2) / 0.07)).astype(np.float32)

    cases = [(20.0, 3, -2, 1.05, 0.95), (200.0, -4, 5, 0.92, 1.08)]
    for theta_deg, jx, jy, sx, sy in cases:
        host = apply_affine_transformation(img[..., None], theta_deg, False, False,
                                           jx, jy, sx, sy)
        dev = np.asarray(warp_affine_batch(
            jnp.asarray(img[None, ..., None]),
            theta=jnp.asarray([np.deg2rad(theta_deg)], jnp.float32),
            tx=jnp.asarray([float(jx)]), ty=jnp.asarray([float(jy)]),
            sx=jnp.asarray([sx]), sy=jnp.asarray([sy])))[0]
        # interpolation-count differences (3 shear resamples vs scipy's one
        # 2-D bilinear) soften sharp features slightly near 45deg residuals:
        # demand tight agreement for the bulk and a sane worst case
        diff = np.abs(dev[10:-10, 10:-10] - host[10:-10, 10:-10])
        assert np.quantile(diff, 0.99) < 0.06, float(np.quantile(diff, 0.99))
        assert diff.max() < 0.15, float(diff.max())


def test_full_pipeline_statistics_match():
    """Both pipelines preserve per-sample zscore statistics and produce
    comparable output distributions under the default severities."""
    rng = np.random.default_rng(0)
    raw = rng.integers(100, 4000, (4, 64, 64, 1)).astype(np.uint16)
    masks = rng.integers(0, 2, (4, 64, 64)).astype(np.uint8)

    dev_img, dev_lbl = augment_and_preprocess_batch(
        jax.random.PRNGKey(0), jnp.asarray(raw), jnp.asarray(masks),
        DeviceAugmentParams(), 2, True)
    dev_img = np.asarray(dev_img)

    # z-scored per sample
    np.testing.assert_allclose(dev_img.mean(axis=(1, 2, 3)), 0.0, atol=1e-3)
    np.testing.assert_allclose(dev_img.std(axis=(1, 2, 3)), 1.0, atol=0.05)

    # host pipeline equivalent for distribution comparison
    from tpuseg.aug.host import augment_image

    host_stds = []
    for i in range(4):
        h_img, _ = augment_image(
            raw[i].astype(np.float32), masks[i],
            rotation_flag=True, reflection_flag=True,
            jitter_augmentation_severity=0.1, noise_augmentation_severity=0.02,
            scale_augmentation_severity=0.1, blur_augmentation_max_sigma=2,
            rng=np.random.default_rng(100 + i))
        host_stds.append(zscore_normalize(h_img.transpose(2, 0, 1)).std())
    np.testing.assert_allclose(host_stds, 1.0, atol=0.05)

    # labels remain valid one-hot after warp+round on both paths
    np.testing.assert_allclose(np.asarray(dev_lbl).sum(-1), 1.0)
