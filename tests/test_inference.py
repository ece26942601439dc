"""Inference tests: padding geometry, tiled-vs-single equivalence, ERF probe."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuseg.infer.erf import estimate_radius
from tpuseg.infer.tiled import (
    inference_single,
    inference_tiled,
    make_predict_fn,
    make_softmax_fn,
    minimize_dtype,
)
from tpuseg.models.unet import UNet, init_variables


@pytest.fixture(scope="module")
def tiny():
    model = UNet(num_classes=3, base_features=2, dtype=jnp.float32)
    variables = init_variables(model, jax.random.PRNGKey(0), num_channels=1, spatial=(32, 32))
    return model, variables


def test_single_pads_and_unpads(tiny):
    model, variables = tiny
    predict = make_predict_fn(model, variables)
    img = np.random.default_rng(0).random((50, 70)).astype(np.float32)  # not x16
    pred = inference_single(img, predict)
    assert pred.shape == (50, 70)
    assert pred.dtype == np.int32
    assert set(np.unique(pred)) <= {0, 1, 2}


def test_single_rejects_bad_ndim(tiny):
    model, variables = tiny
    predict = make_predict_fn(model, variables)
    with pytest.raises(IOError, match="HW or HWC"):
        inference_single(np.zeros((4, 4, 4, 4), np.float32), predict)


def test_tiled_matches_single_on_interior(tiny):
    """Tiled stitching with a halo >= true receptive field reproduces the
    single-shot prediction exactly (the ERF argument, SURVEY.md §5.7).
    base_features=2 still has the full 4-level geometry => true RF ~ 96px,
    so use radius=96 with a small ZoR to exercise many tiles."""
    model, variables = tiny
    predict = make_predict_fn(model, variables)
    img = np.random.default_rng(1).random((320, 320)).astype(np.float32)
    whole = inference_single(img, predict)
    tiled = inference_tiled(img, predict, tile_size=288, radius=96, batch_size=3)
    assert tiled.shape == whole.shape
    match = (tiled == whole).mean()
    assert match > 0.999, f"tiled/single agreement {match}"


def test_tiled_skinny_image(tiny):
    """One dim smaller than the tile: reflect-padded up, output still exact size."""
    model, variables = tiny
    predict = make_predict_fn(model, variables)
    img = np.random.default_rng(2).random((100, 600)).astype(np.float32)
    pred = inference_tiled(img, predict, tile_size=288, radius=96, batch_size=2)
    assert pred.shape == (100, 600)


def test_tiled_sharded_matches_unsharded(tiny):
    """Tile-grid data parallelism (SURVEY.md §5.7): sharding the tile batch
    over the full 8-device mesh returns the identical stitched mask."""
    from tpuseg.parallel.mesh import make_mesh

    model, variables = tiny
    predict = make_predict_fn(model, variables)
    img = np.random.default_rng(3).random((620, 620)).astype(np.float32)
    base = inference_tiled(img, predict, tile_size=288, radius=96, batch_size=2)
    mesh = make_mesh(jax.devices(), data=4, spatial=2)  # both axes consumed
    sharded = inference_tiled(img, predict, tile_size=288, radius=96,
                              batch_size=1, mesh=mesh)
    np.testing.assert_array_equal(base, sharded)


def test_tiled_device_normalization_is_exact(tiny):
    """Fused on-device z-score (norm_stats path, raw uint16 input) returns
    the identical mask to host zscore_normalize + float32 transfer."""
    from tpuseg.data.preprocess import zscore_normalize, zscore_stats

    model, variables = tiny
    predict = make_predict_fn(model, variables)
    raw = np.random.default_rng(4).integers(0, 4096, size=(400, 340)).astype(np.uint16)
    host = inference_tiled(zscore_normalize(raw.astype(np.float32), channels_first=False),
                           predict, tile_size=288, radius=96, batch_size=2)
    dev = inference_tiled(raw, predict, tile_size=288, radius=96, batch_size=2,
                          norm_stats=zscore_stats(raw))
    np.testing.assert_array_equal(host, dev)


def test_single_batch_matches_per_image(tiny):
    """Batched same-shape small images (fused device z-score) reproduce the
    host-normalized one-at-a-time path exactly, including tail padding."""
    from tpuseg.data.preprocess import zscore_normalize
    from tpuseg.infer.tiled import inference_single_batch

    model, variables = tiny
    predict = make_predict_fn(model, variables)
    rng = np.random.default_rng(7)
    imgs = [rng.integers(0, 4096, size=(50, 70)).astype(np.uint16) for _ in range(5)]
    batched = inference_single_batch(imgs, predict, batch_size=2)  # 2 full + tail
    for im, got in zip(imgs, batched):
        want = inference_single(
            zscore_normalize(im.astype(np.float32), channels_first=False), predict)
        np.testing.assert_array_equal(want, got)


def test_tiled_device_output(tiny):
    """device_output=True returns the identical mask as a device array."""
    model, variables = tiny
    predict = make_predict_fn(model, variables)
    img = np.random.default_rng(6).random((300, 340)).astype(np.float32)
    host = inference_tiled(img, predict, tile_size=288, radius=96, batch_size=2)
    dev = inference_tiled(img, predict, tile_size=288, radius=96, batch_size=2,
                          device_output=True)
    assert isinstance(dev, jax.Array)
    np.testing.assert_array_equal(host, np.asarray(dev))


def test_zscore_stats_matches_normalize():
    from tpuseg.data.preprocess import zscore_normalize, zscore_stats

    rng = np.random.default_rng(5)
    for shape in ((37, 53), (37, 53, 3)):
        x = (rng.random(shape) * 300).astype(np.float32)
        mean, std = zscore_stats(x)
        centered = x.astype(np.float32) - mean if x.ndim == 3 else x - mean[0]
        expect = zscore_normalize(x, channels_first=False)
        got = np.where(std <= 1.0, centered, centered / std) if x.ndim == 3 \
            else (centered if std[0] <= 1.0 else centered / std[0])
        np.testing.assert_array_equal(expect, got)
    # std<=1 guard: constant-ish channel is only mean-shifted
    flat = np.full((16, 16), 7.25, np.float32)
    mean, std = zscore_stats(flat)
    assert std[0] <= 1.0
    np.testing.assert_array_equal(zscore_normalize(flat), flat - mean[0])


def test_softmax_fn_contract(tiny):
    model, variables = tiny
    sm = make_softmax_fn(model, variables)
    out = np.asarray(sm(jnp.zeros((1, 32, 32, 1))))
    np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-5)


def test_streaming_matches_in_ram_tiled(tiny, tmp_path):
    """Window-streamed whole-slide inference (BigTIFF in, incremental
    BigTIFF out) equals the in-RAM tiled engine exactly when given the same
    normalization statistics."""
    from tpuseg.data.preprocess import zscore_stats
    from tpuseg.infer.tiled import inference_tiled_streaming
    from tpuseg.utils import bigtiff

    model, variables = tiny
    predict = make_predict_fn(model, variables)
    rng = np.random.default_rng(8)
    img = rng.integers(0, 4096, size=(640, 480)).astype(np.uint16)  # x16 dims
    stats = zscore_stats(img)

    in_ram = inference_tiled(img, predict, tile_size=288, radius=96,
                             batch_size=2, num_classes=3, norm_stats=stats)

    src = str(tmp_path / "slide.tif")
    bigtiff.write_bigtiff(src, img, tile=(128, 128))
    out = str(tmp_path / "mask.tif")
    with bigtiff.BigTiffReader(src) as reader:
        inference_tiled_streaming(reader, predict, out, tile_size=288,
                                  radius=96, batch_size=2, num_classes=3,
                                  norm_stats=stats, progress=False)
    streamed = bigtiff.read_bigtiff(out)
    assert streamed.dtype == np.uint8
    np.testing.assert_array_equal(in_ram.astype(np.uint8), streamed)


def test_streaming_default_stats_close_to_host(tiny, tmp_path):
    """With its own single-pass float64 statistics the streamed mask still
    agrees with the in-RAM engine away from decision boundaries."""
    from tpuseg.infer.tiled import inference_tiled_streaming
    from tpuseg.utils import bigtiff

    model, variables = tiny
    predict = make_predict_fn(model, variables)
    rng = np.random.default_rng(9)
    img = rng.integers(0, 4096, size=(320, 320)).astype(np.uint16)
    from tpuseg.data.preprocess import zscore_stats
    in_ram = inference_tiled(img, predict, tile_size=288, radius=96,
                             batch_size=2, num_classes=3,
                             norm_stats=zscore_stats(img))
    src = str(tmp_path / "slide.tif")
    bigtiff.write_bigtiff(src, img, tile=(128, 128))
    out = str(tmp_path / "mask.tif")
    with bigtiff.BigTiffReader(src) as reader:
        inference_tiled_streaming(reader, predict, out, tile_size=288,
                                  radius=96, batch_size=2, num_classes=3,
                                  progress=False)
    streamed = bigtiff.read_bigtiff(out)
    agree = (streamed == in_ram).mean()
    assert agree > 0.999, f"streamed/in-RAM agreement {agree}"


def test_single_batch_and_streaming_sharded_match(tiny, tmp_path):
    """Small-image batches and streamed windows shard over the 8-device
    mesh with identical outputs (batch_size becomes per-device)."""
    from tpuseg.data.preprocess import zscore_stats
    from tpuseg.infer.tiled import (inference_single_batch,
                                    inference_tiled_streaming)
    from tpuseg.parallel.mesh import make_mesh
    from tpuseg.utils import bigtiff

    model, variables = tiny
    predict = make_predict_fn(model, variables)
    mesh = make_mesh(jax.devices(), data=8, spatial=1)
    rng = np.random.default_rng(10)

    imgs = [rng.integers(0, 4096, size=(48, 64)).astype(np.uint16) for _ in range(11)]
    base = inference_single_batch(imgs, predict, batch_size=2)
    sharded = inference_single_batch(imgs, predict, batch_size=1, mesh=mesh)
    for b, s in zip(base, sharded):
        np.testing.assert_array_equal(b, s)

    img = rng.integers(0, 4096, size=(400, 340)).astype(np.uint16)
    stats = zscore_stats(img)
    src = str(tmp_path / "slide.tif")
    bigtiff.write_bigtiff(src, img, tile=(128, 128))
    outs = {}
    for name, m in (("solo", None), ("mesh", mesh)):
        out = str(tmp_path / f"mask_{name}.tif")
        with bigtiff.BigTiffReader(src) as reader:
            inference_tiled_streaming(reader, predict, out, tile_size=288,
                                      radius=96, batch_size=1, num_classes=3,
                                      norm_stats=stats, progress=False, mesh=m)
        outs[name] = bigtiff.read_bigtiff(out)
    np.testing.assert_array_equal(outs["solo"], outs["mesh"])


def test_minimize_dtype():
    assert minimize_dtype(np.array([[1, 255]])).dtype == np.uint8
    assert minimize_dtype(np.array([[1, 256]])).dtype == np.uint16
    assert minimize_dtype(np.array([[1, 70000]])).dtype == np.int32
    # negative labels (-1 ignore/void) must stay signed — an unsigned cast
    # silently wrapped them to 255/65535 (review r3)
    out = minimize_dtype(np.array([[-1, 3]]))
    assert out.dtype == np.int32 and out.min() == -1
    assert minimize_dtype(np.array([], dtype=np.int64)).dtype == np.uint8


def test_tile_geometry_errors_are_actionable(tiny):
    """Bad --tile_size/--radius raise ValueError with the rule named, not a
    bare assert that strips under python -O (review r3)."""
    model, variables = tiny
    predict = make_predict_fn(model, variables)
    img = np.zeros((300, 300), np.float32)
    with pytest.raises(ValueError, match="multiples of 16"):
        inference_tiled(img, predict, tile_size=1000, radius=96)
    with pytest.raises(ValueError, match="receptive-field halo"):
        inference_tiled(img, predict, tile_size=128, radius=96)


def test_tiled_returns_device_dtype(tiny):
    """num_classes<=256 keeps the device's uint8 (half the transfer; the
    saver re-minimizes anyway); without num_classes it stays int32."""
    model, variables = tiny
    predict = make_predict_fn(model, variables)
    img = np.random.default_rng(7).random((300, 300)).astype(np.float32)
    u8 = inference_tiled(img, predict, tile_size=288, radius=96,
                         batch_size=2, num_classes=3)
    i32 = inference_tiled(img, predict, tile_size=288, radius=96, batch_size=2)
    assert u8.dtype == np.uint8 and i32.dtype == np.int32
    assert (u8 == i32).all()


def test_streaming_writer_setup_failure_spawns_no_producer(tiny, tmp_path):
    """A writer-constructor failure (unwritable path) must raise before the
    window-reader thread ever starts — the ctor used to run after the
    thread, leaking it with a decoded window group pinned (review r3)."""
    import threading

    from tpuseg.infer.tiled import inference_tiled_streaming
    from tpuseg.utils import bigtiff

    model, variables = tiny
    predict = make_predict_fn(model, variables)
    img = np.random.default_rng(8).integers(0, 4096, size=(640, 480)).astype(np.uint16)
    src = str(tmp_path / "slide2.tif")
    bigtiff.write_bigtiff(src, img, tile=(128, 128))

    before = {t.name for t in threading.enumerate()}
    with bigtiff.BigTiffReader(src) as reader:
        with pytest.raises(IOError):
            inference_tiled_streaming(
                reader, predict, str(tmp_path / "no-such-dir" / "out.tif"),
                tile_size=288, radius=96, batch_size=2, num_classes=3)
    leaked = {t.name for t in threading.enumerate()} - before
    assert not any("stream-read" in n for n in leaked)


def test_erf_radius_is_x16_and_plausible(tiny):
    model, variables = tiny
    r = estimate_radius(model, variables, num_channels=1, rng=np.random.default_rng(0))
    assert r % 16 == 0
    assert 16 <= r <= 192


def test_erf_seed_makes_radius_and_geometry_deterministic(tiny):
    """InferenceConfig.seed pins the ERF noise draw: same seed => same
    radius on every run (and thus on every host of a striped fleet), so
    tile geometry and --auto_tile choices can't diverge between nominally
    identical invocations (VERDICT r3 weak #5)."""
    from tpuseg.infer.runner import InferenceConfig, _erf_rng

    model, variables = tiny
    cfg = InferenceConfig(checkpoint_filepath="", image_folder="",
                          output_folder="", number_classes=2,
                          number_channels=1, seed=7)
    radii = {estimate_radius(model, variables, 1, rng=_erf_rng(cfg))
             for _ in range(3)}
    assert len(radii) == 1, f"seeded radii diverged: {radii}"
    # unseeded keeps reference behavior: a fresh-entropy Generator each call
    assert _erf_rng(InferenceConfig(
        checkpoint_filepath="", image_folder="", output_folder="",
        number_classes=2, number_channels=1)) is None


def test_choose_tile_size_cost_model():
    """The auto-tile chooser minimizes computed pixels and prefers whole
    device chunks on ties."""
    from tpuseg.infer.tiled import choose_tile_size

    # 4096^2, radius 96: the chooser beats the fixed 1024 (25 tiles =
    # 26.2 MP) by finding zor 1024 -> tile 1216, a 4x4 grid covering 4096
    # exactly (23.7 MP, zero grid padding)
    t4096 = choose_tile_size(4096, 4096, 96)
    assert t4096 == 1216
    assert 16 * t4096 * t4096 < 25 * 1024 * 1024
    # 3330^2: fixed 1024 needs 25 tiles -> 32 padded slots (33.6 MP-slots);
    # the chooser finds a 16-slot geometry (measured 14.8 -> 18.2 MP/s)
    t = choose_tile_size(3330, 3330, 96)
    zor = t - 192
    n = (-(-3330 // zor)) ** 2
    slots = -(-n // 8) * 8
    assert slots * t * t < 32 * 1024 * 1024
    # always a multiple of 16, zor >= radius (the stitcher's own contract)
    for h, w in ((1100, 5000), (2048, 2048), (9000, 1200)):
        t = choose_tile_size(h, w, 96)
        assert t % 16 == 0 and (t - 192) >= 96


def test_auto_tile_matches_fixed_tile_outputs(tiny):
    """auto_tile changes geometry, never pixels (every output still sees
    its full halo): an awkward non-divisible image must segment identically
    under the chosen tile and the fixed tile."""
    from tpuseg.infer.tiled import choose_tile_size

    model, variables = tiny
    predict = make_predict_fn(model, variables)
    rng = np.random.default_rng(5)
    img = rng.normal(size=(430, 390, 1)).astype(np.float32)
    # radius 96 >= the tiny model's true receptive field -> exact equality
    fixed = inference_tiled(img, predict, tile_size=288, radius=96,
                            batch_size=2, num_classes=3)
    t = choose_tile_size(430, 390, radius=96, min_tile=288, max_tile=512)
    assert t != 288  # the chooser actually picked a different geometry
    auto = inference_tiled(img, predict, tile_size=t, radius=96,
                           batch_size=2, num_classes=3)
    assert fixed.shape == auto.shape == (430, 390)
    # interior pixels (full halo inside the real image) are bit-identical;
    # border pixels may differ where the two geometries reflect-pad
    # different amounts (the reference's clamped boxes have the same
    # property, inference.py:75-95)
    np.testing.assert_array_equal(fixed[96:-96, 96:-96], auto[96:-96, 96:-96])
    assert (fixed != auto).mean() < 1e-3


def test_streaming_consumer_failure_releases_producer(tiny, tmp_path, monkeypatch):
    """If the consumer loop raises (writer failure), the one-slot producer
    thread must exit instead of blocking forever in q.put with a full group
    of decoded halo windows pinned (review r3; same class as the
    runner._read_ahead fix)."""
    import threading
    import time

    from tpuseg.infer import tiled as tiled_mod
    from tpuseg.utils import bigtiff

    model, variables = tiny
    predict = make_predict_fn(model, variables)
    rng = np.random.default_rng(6)
    img = rng.integers(0, 4096, size=(640, 480)).astype(np.uint16)
    src = str(tmp_path / "slide.tif")
    bigtiff.write_bigtiff(src, img, tile=(128, 128))

    class _BoomWriter:
        def __init__(self, *a, **k):
            pass

        def put_tile(self, *a):
            raise IOError("writer disk full")

        def abort(self):
            pass

    monkeypatch.setattr(tiled_mod, "BigTiffTileWriter", _BoomWriter, raising=False)
    # the streaming fn imports the writer inside its body — patch the source
    from tpuseg.utils import bigtiff as bigtiff_mod

    monkeypatch.setattr(bigtiff_mod, "BigTiffTileWriter", _BoomWriter)

    with bigtiff.BigTiffReader(src) as reader:
        with pytest.raises(IOError, match="disk full"):
            tiled_mod.inference_tiled_streaming(
                reader, predict, str(tmp_path / "mask.tif"), tile_size=288,
                radius=96, batch_size=1, num_classes=3, progress=False)
        deadline = time.time() + 5.0
        while time.time() < deadline:
            if not [t for t in threading.enumerate()
                    if t.name == "tpuseg-stream-read" and t.is_alive()]:
                break
            time.sleep(0.05)
    assert not [t for t in threading.enumerate()
                if t.name == "tpuseg-stream-read" and t.is_alive()], \
        "streaming producer still alive after consumer failure"
