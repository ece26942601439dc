"""Config #2 coverage (BASELINE.json): multi-class, N-channel input with
class-balanced sampling, through the data engine and both training paths."""

import numpy as np
import pytest

from tpuseg.data.build_db import serialize_image_mask_pair
from tpuseg.data.reader import ImageReader
from tpuseg.data.recordstore import RecordWriter

N_CLASSES = 4
CHANNELS = 3


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mc") / "train-mc.lmdb")
    w = RecordWriter(d)
    rng = np.random.default_rng(0)
    for i in range(12):
        img = rng.integers(0, 65535, (32, 32, CHANNELS), dtype=np.uint16)
        msk = rng.integers(0, 2, (32, 32)).astype(np.uint8)
        if i % 3 == 1:
            msk[msk == 1] = 2
        if i % 3 == 2:
            msk[:8][msk[:8] == 0] = 3
        classes = ",".join(str(c) for c in np.unique(msk))
        w.put(f"img{i:03d}:{classes}", serialize_image_mask_pair(img, msk))
    w.close()
    return d


def test_balanced_multiclass_reader(db):
    r = ImageReader(db, use_augmentation=False, balance_classes=True,
                    number_classes=N_CLASSES, num_workers=2, layout="nhwc", seed=1)
    assert r.get_image_size() == [32, 32, CHANNELS]
    assert len(r.keys) == N_CLASSES
    assert all(len(k) > 0 for k in r.keys)
    with r:
        img, lbl = next(r.generator())
    assert img.shape == (32, 32, CHANNELS)
    assert lbl.shape == (32, 32, N_CLASSES)


def test_multichannel_augmented_reader(db):
    r = ImageReader(db, use_augmentation=True, number_classes=N_CLASSES,
                    num_workers=1, layout="nhwc", seed=2)
    with r:
        img, lbl = next(r.generator())
    assert img.shape == (32, 32, CHANNELS)
    assert np.isfinite(img).all()


def test_multichannel_device_train_step(db):
    import jax
    import jax.numpy as jnp

    from tpuseg.models.unet import UNet
    from tpuseg.train.steps import create_train_state, make_jitted_raw_steps

    r = ImageReader(db, raw_mode=True, number_classes=N_CLASSES, num_workers=1, seed=3)
    with r:
        imgs, msks = next(r.batches(4))
    model = UNet(num_classes=N_CLASSES, base_features=2, dtype=jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), CHANNELS, 1e-3)
    tstep, estep = make_jitted_raw_steps(model, num_classes=N_CLASSES, augment=True)
    state, m = tstep(state, jnp.asarray(imgs), jnp.asarray(msks))
    assert np.isfinite(float(m["loss"]))
    ev = estep(state, jnp.asarray(imgs), jnp.asarray(msks))
    assert np.isfinite(float(ev["loss"]))


def test_multichannel_inference(db):
    import jax
    import jax.numpy as jnp

    from tpuseg.infer.tiled import inference_single, make_predict_fn
    from tpuseg.models.unet import UNet, init_variables

    model = UNet(num_classes=N_CLASSES, base_features=2, dtype=jnp.float32)
    variables = init_variables(model, jax.random.PRNGKey(0), CHANNELS, (32, 32))
    predict = make_predict_fn(model, variables)
    img = np.random.default_rng(4).random((50, 60, CHANNELS)).astype(np.float32)
    pred = inference_single(img, predict)
    assert pred.shape == (50, 60)
    assert pred.max() < N_CLASSES


def test_multichannel_batched_and_streaming_inference(tmp_path):
    """The round-2 inference paths (batched small images, streamed slides)
    handle C>1 imagery with per-channel z-score."""
    import jax
    import jax.numpy as jnp

    from tpuseg.data.preprocess import zscore_normalize, zscore_stats
    from tpuseg.infer.tiled import (inference_single, inference_single_batch,
                                    inference_tiled, inference_tiled_streaming,
                                    make_predict_fn)
    from tpuseg.models.unet import UNet, init_variables
    from tpuseg.utils import bigtiff

    model = UNet(num_classes=N_CLASSES, base_features=2, dtype=jnp.float32)
    variables = init_variables(model, jax.random.PRNGKey(0), CHANNELS, (32, 32))
    predict = make_predict_fn(model, variables)
    rng = np.random.default_rng(5)

    # batched small images == per-image host-normalized path
    imgs = [rng.integers(0, 4096, (48, 64, CHANNELS)).astype(np.uint16)
            for _ in range(3)]
    batched = inference_single_batch(imgs, predict, batch_size=2)
    for im, got in zip(imgs, batched):
        want = inference_single(
            zscore_normalize(im.astype(np.float32), channels_first=False), predict)
        np.testing.assert_array_equal(want, got)

    # streamed slide == in-RAM tiled under equal stats
    img = rng.integers(0, 4096, (320, 320, CHANNELS)).astype(np.uint16)
    stats = zscore_stats(img)
    in_ram = inference_tiled(img, predict, tile_size=288, radius=96,
                             batch_size=2, num_classes=N_CLASSES, norm_stats=stats)
    src = str(tmp_path / "slide.tif")
    bigtiff.write_bigtiff(src, img, tile=(128, 128))
    out = str(tmp_path / "mask.tif")
    with bigtiff.BigTiffReader(src) as reader:
        inference_tiled_streaming(reader, predict, out, tile_size=288,
                                  radius=96, batch_size=2,
                                  num_classes=N_CLASSES, norm_stats=stats,
                                  progress=False)
    np.testing.assert_array_equal(in_ram.astype(np.uint8),
                                  bigtiff.read_bigtiff(out))
