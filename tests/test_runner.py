"""Folder-level inference runner tests (reference inference.py:176-227):
checkpoint restore -> read-ahead -> single/tiled dispatch -> dtype-minimized
mask save, including the sharded tile grid and error propagation."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuseg.infer.runner import InferenceConfig, _read_ahead, inference
from tpuseg.models.unet import UNet
from tpuseg.train.steps import create_train_state
from tpuseg.utils.checkpoint import save_checkpoint
from tpuseg.utils.imagio import imread, imwrite


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    model = UNet(num_classes=2, base_features=2, dtype=jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), num_channels=1,
                               learning_rate=1e-4)
    path = str(tmp_path_factory.mktemp("ck") / "checkpoint")
    save_checkpoint(path, state)
    return path


def _write_corpus(folder):
    os.makedirs(folder, exist_ok=True)
    rng = np.random.default_rng(0)
    imwrite(os.path.join(folder, "small.tif"),
            rng.integers(0, 4096, size=(96, 80)).astype(np.uint16))
    imwrite(os.path.join(folder, "big.tif"),
            rng.integers(0, 4096, size=(400, 330)).astype(np.uint16))


def test_inference_runner_both_branches(ckpt, tmp_path):
    """One sub-tile image (single-shot branch) and one above-tile image
    (tiled branch with fused device z-score) through the full runner."""
    imgdir = str(tmp_path / "imgs")
    _write_corpus(imgdir)
    outdir = str(tmp_path / "out")
    cfg = InferenceConfig(
        checkpoint_filepath=ckpt, image_folder=imgdir, output_folder=outdir,
        number_classes=2, number_channels=1, tile_size=288, radius=96,
        batch_size=2, dtype="float32", base_features=2)
    written = inference(cfg)
    assert sorted(os.path.basename(p) for p in written) == ["big.tif", "small.tif"]
    for p, shape in zip(sorted(written), [(400, 330), (96, 80)]):
        mask = imread(p)
        assert mask.shape == shape
        assert mask.dtype == np.uint8  # 2 classes fit a byte (inference.py:215-220)
        assert set(np.unique(mask)) <= {0, 1}


def test_inference_runner_batches_mixed_small_shapes(ckpt, tmp_path):
    """A folder mixing two small shapes and a big image: small ones batch
    per shape group, output order and per-file shapes are preserved."""
    imgdir = str(tmp_path / "imgs")
    os.makedirs(imgdir)
    rng = np.random.default_rng(1)
    shapes = {"a.tif": (64, 64), "b.tif": (64, 64), "c.tif": (96, 80),
              "d.tif": (400, 330), "e.tif": (64, 64)}
    for name, shape in shapes.items():
        imwrite(os.path.join(imgdir, name),
                rng.integers(0, 4096, size=shape).astype(np.uint16))
    outdir = str(tmp_path / "out")
    cfg = InferenceConfig(
        checkpoint_filepath=ckpt, image_folder=imgdir, output_folder=outdir,
        number_classes=2, number_channels=1, tile_size=288, radius=96,
        batch_size=2, dtype="float32", base_features=2)
    written = inference(cfg)
    assert [os.path.basename(p) for p in written] == sorted(shapes)
    for p in written:
        assert imread(p).shape == shapes[os.path.basename(p)]


def test_inference_runner_streaming_mode(ckpt, tmp_path):
    """--streaming: tiled-BigTIFF slide in, incrementally written BigTIFF
    mask out, through the full runner surface."""
    from tpuseg.utils import bigtiff

    imgdir = str(tmp_path / "imgs")
    os.makedirs(imgdir)
    rng = np.random.default_rng(2)
    img = rng.integers(0, 4096, size=(400, 330)).astype(np.uint16)
    bigtiff.write_bigtiff(os.path.join(imgdir, "slide.tif"), img, tile=(128, 128))
    outdir = str(tmp_path / "out")
    os.makedirs(outdir)
    cfg = InferenceConfig(
        checkpoint_filepath=ckpt, image_folder=imgdir, output_folder=outdir,
        number_classes=2, number_channels=1, tile_size=288, radius=96,
        batch_size=2, dtype="float32", base_features=2, streaming=True)
    written = inference(cfg)
    assert len(written) == 1
    mask = bigtiff.read_bigtiff(written[0])
    assert mask.shape == (400, 330)
    assert mask.dtype == np.uint8
    assert set(np.unique(mask)) <= {0, 1}


def test_read_ahead_preserves_order_and_stats(tmp_path):
    imgdir = str(tmp_path / "imgs")
    os.makedirs(imgdir)
    paths = []
    for i in range(4):
        p = os.path.join(imgdir, f"im{i}.tif")
        imwrite(p, np.full((20, 20), i * 100, np.uint16))
        paths.append(p)
    got = list(_read_ahead(paths, depth=2))
    assert [g[0] for g in got] == paths
    for i, (_, img, (mean, std)) in enumerate(got):
        assert img[0, 0] == i * 100
        assert mean[0] == pytest.approx(i * 100.0)
        assert std[0] == 0.0


def test_read_ahead_propagates_errors(tmp_path):
    bad = str(tmp_path / "missing.tif")
    it = _read_ahead([bad])
    with pytest.raises(Exception):
        next(it)


def test_read_ahead_disabled_is_synchronous(tmp_path):
    p = str(tmp_path / "a.tif")
    imwrite(p, np.full((20, 20), 300, np.uint16))
    got = list(_read_ahead([p], enabled=False))
    assert len(got) == 1 and got[0][0] == p
    assert got[0][2][0][0] == pytest.approx(300.0)


def test_streaming_refuses_inplace_overwrite(ckpt, tmp_path):
    """--streaming must not truncate the slide it is still reading."""
    from tpuseg.utils import bigtiff

    imgdir = str(tmp_path / "imgs")
    os.makedirs(imgdir)
    img = np.random.default_rng(3).integers(0, 4096, size=(400, 330)).astype(np.uint16)
    bigtiff.write_bigtiff(os.path.join(imgdir, "slide.tif"), img, tile=(128, 128))
    cfg = InferenceConfig(
        checkpoint_filepath=ckpt, image_folder=imgdir, output_folder=imgdir,
        number_classes=2, number_channels=1, tile_size=288, radius=96,
        batch_size=2, dtype="float32", base_features=2, streaming=True)
    with pytest.raises(ValueError, match="cannot write over its input"):
        inference(cfg)
    np.testing.assert_array_equal(  # slide untouched
        bigtiff.read_bigtiff(os.path.join(imgdir, "slide.tif")), img)


def test_program_cache_dies_with_model():
    """Compiled inference programs are cached on the predict_fn itself —
    one program per geometry, and dropping the model frees the whole cycle
    (no global registry pinning dead checkpoints' device weights)."""
    import gc
    import weakref

    import jax.numpy as jnp

    from tpuseg.infer.tiled import inference_single_batch, make_predict_fn
    from tpuseg.models.unet import UNet, init_variables

    model = UNet(num_classes=2, base_features=2, dtype=jnp.float32)
    variables = init_variables(model, jax.random.PRNGKey(1), num_channels=1)
    predict = make_predict_fn(model, variables)
    img = np.random.default_rng(4).integers(0, 100, size=(32, 32)).astype(np.uint16)
    inference_single_batch([img], predict, batch_size=1)
    inference_single_batch([img, img], predict, batch_size=1)  # same geometry
    assert len(predict._tpuseg_programs) == 1  # one cached program, reused
    ref = weakref.ref(predict)
    del predict
    gc.collect()
    assert ref() is None, "predict_fn (and its program cache) not collected"


def test_read_ahead_abandoned_consumer_releases_producer(tmp_path):
    """Closing the generator mid-iteration must unblock and end the reader
    thread (ADVICE r2: an abandoned q.put pinned decoded images for process
    life when a library caller's inference raised on one image)."""
    import threading
    import time

    imgdir = str(tmp_path / "imgs")
    os.makedirs(imgdir)
    paths = []
    for i in range(6):
        p = os.path.join(imgdir, f"im{i}.tif")
        imwrite(p, np.full((20, 20), i, np.uint16))
        paths.append(p)

    before = {t.name for t in threading.enumerate()}
    it = _read_ahead(paths, depth=1)
    next(it)  # producer is now blocked on the bounded queue
    it.close()  # consumer abandons (finally -> stop event)
    deadline = time.time() + 5.0
    while time.time() < deadline:
        readers = [t for t in threading.enumerate()
                   if t.name == "tpuseg-infer-read" and t.is_alive()
                   and t.name not in before]
        if not readers:
            break
        time.sleep(0.05)
    assert not [t for t in threading.enumerate()
                if t.name == "tpuseg-infer-read" and t.is_alive()], \
        "read-ahead producer still alive after generator close"


def test_inference_rejects_channel_mismatch(ckpt, tmp_path):
    """A 3-channel image against a 1-channel model must fail fast with a
    clean message, not an XLA shape error (VERDICT r2 item 8)."""
    imgdir = str(tmp_path / "imgs")
    os.makedirs(imgdir)
    rng = np.random.default_rng(0)
    imwrite(os.path.join(imgdir, "rgbish.tif"),
            rng.integers(0, 255, size=(64, 64, 3)).astype(np.uint8))
    cfg = InferenceConfig(
        checkpoint_filepath=ckpt, image_folder=imgdir,
        output_folder=str(tmp_path / "out"),
        number_classes=2, number_channels=1, tile_size=288, radius=96,
        batch_size=2, dtype="float32", base_features=2)
    with pytest.raises(ValueError, match="3 channel.*number_channels=1"):
        inference(cfg)


def test_inference_runner_streaming_auto_tile(ckpt, tmp_path, capsys):
    """--streaming --auto_tile: the chooser engages (capped by slide dims)
    and the mask agrees with the fixed-geometry streamed mask everywhere
    except near-tie pixels (a random-init model ties almost everywhere, so
    exact cross-geometry equality is not the contract — the per-geometry
    exactness is pinned in test_inference.py::test_streaming_matches_in_ram_tiled)."""
    from tpuseg.utils import bigtiff

    imgdir = str(tmp_path / "imgs")
    os.makedirs(imgdir)
    rng = np.random.default_rng(4)
    img = rng.integers(0, 4096, size=(400, 330)).astype(np.uint16)
    bigtiff.write_bigtiff(os.path.join(imgdir, "slide.tif"), img, tile=(128, 128))

    def run(outname, auto):
        outdir = str(tmp_path / outname)
        os.makedirs(outdir)
        cfg = InferenceConfig(
            checkpoint_filepath=ckpt, image_folder=imgdir, output_folder=outdir,
            number_classes=2, number_channels=1, tile_size=288, radius=96,
            batch_size=2, dtype="float32", base_features=2, streaming=True,
            auto_tile=auto)
        return bigtiff.read_bigtiff(inference(cfg)[0])

    fixed = run("fixed", False)
    auto = run("auto", True)
    assert "auto tile size: 320" in capsys.readouterr().out  # chooser engaged, capped
    assert fixed.shape == auto.shape == (400, 330)
    assert auto.dtype == np.uint8 and set(np.unique(auto)) <= {0, 1}
    assert (fixed != auto).mean() < 0.02  # near-tie flips only


def test_auto_tile_fallback_requires_halo_valid_configured_tile():
    """When the slot-cost search has no candidate (ValueError), _auto_tile may
    degrade to the configured tile ONLY if that tile satisfies the zor rule
    zor = tile - 2*radius >= radius (inference.py:58-59); otherwise the
    actionable search error must propagate instead of dying later inside the
    tiled program with a bare geometry assert."""
    from tpuseg.infer.runner import _auto_tile

    cfg = InferenceConfig(
        checkpoint_filepath="unused", image_folder="unused",
        output_folder="unused", number_classes=2, number_channels=1,
        tile_size=1024, radius=96, batch_size=8)
    # max_dim caps the search below any halo-valid candidate for radius=512,
    # but the configured 1024 tile is halo-valid for radius=96 -> degrade.
    assert _auto_tile(cfg, 600, 600, 96, None, max_dim=200) == 1024
    # radius=512 makes the configured 1024 tile halo-invalid (zor=0): raise.
    with pytest.raises(ValueError):
        _auto_tile(cfg, 5000, 5000, 512, None, max_dim=200)


def test_inference_runner_quantized_int8(ckpt, tmp_path, capsys):
    """--quantize int8 through the full runner (both small-batched and tiled
    branches): calibrates on the inputs, writes masks of the right
    shape/values, and agrees with the fp masks away from near-ties."""
    imgdir = str(tmp_path / "imgs")
    _write_corpus(imgdir)

    def run(outname, quantize):
        outdir = str(tmp_path / outname)
        cfg = InferenceConfig(
            checkpoint_filepath=ckpt, image_folder=imgdir,
            output_folder=outdir,
            number_classes=2, number_channels=1, tile_size=288, radius=96,
            batch_size=2, dtype="float32", base_features=2, quantize=quantize)
        return {os.path.basename(p): imread(p) for p in inference(cfg)}

    fp = run("fp", "none")
    q = run("q", "int8")
    assert "quantize=int8: calibrating on 2 image(s) at 96x80" in capsys.readouterr().out
    assert sorted(q) == ["big.tif", "small.tif"]
    for name in q:
        assert q[name].shape == fp[name].shape
        assert set(np.unique(q[name])) <= {0, 1}
        # random-init fixture: logits are near-tie almost nowhere dominated,
        # so demand broad (not exact) agreement with the fp masks
        assert (q[name] == fp[name]).mean() > 0.85


def test_inference_runner_int8_blocked_matches_int8(ckpt, tmp_path):
    """--quantize int8_blocked through the full runner produces masks
    identical to the dense int8 engine (the blocked path is arithmetically
    the same quantized network — pinned bitwise in test_quant.py)."""
    imgdir = str(tmp_path / "imgs")
    _write_corpus(imgdir)

    def run(outname, quantize):
        outdir = str(tmp_path / outname)
        cfg = InferenceConfig(
            checkpoint_filepath=ckpt, image_folder=imgdir,
            output_folder=outdir,
            number_classes=2, number_channels=1, tile_size=288, radius=96,
            batch_size=2, dtype="float32", base_features=2, quantize=quantize)
        return {os.path.basename(p): imread(p) for p in inference(cfg)}

    dense = run("q8", "int8")
    blocked = run("q8b", "int8_blocked")
    assert sorted(blocked) == sorted(dense)
    for name in dense:
        np.testing.assert_array_equal(blocked[name], dense[name])


def test_inference_runner_int8_auto_matches_int8(ckpt, tmp_path):
    """--quantize int8_auto (blocked engine on the tiled dispatch, dense on
    the batched small-image dispatch — the measured round-5 serving matrix)
    produces masks identical to plain int8 on BOTH paths: the corpus's
    big.tif exceeds tile_size (tiled) and small.tif doesn't (batched), and
    one calibration feeds both engines."""
    imgdir = str(tmp_path / "imgs")
    _write_corpus(imgdir)

    def run(outname, quantize):
        outdir = str(tmp_path / outname)
        cfg = InferenceConfig(
            checkpoint_filepath=ckpt, image_folder=imgdir,
            output_folder=outdir,
            number_classes=2, number_channels=1, tile_size=288, radius=96,
            batch_size=2, dtype="float32", base_features=2, quantize=quantize)
        return {os.path.basename(p): imread(p) for p in inference(cfg)}

    dense = run("q8", "int8")
    auto = run("q8a", "int8_auto")
    assert sorted(auto) == ["big.tif", "small.tif"]
    for name in dense:
        np.testing.assert_array_equal(auto[name], dense[name])


def test_inference_runner_quantize_rejects_unknown_mode(ckpt, tmp_path):
    imgdir = str(tmp_path / "imgs")
    _write_corpus(imgdir)
    cfg = InferenceConfig(
        checkpoint_filepath=ckpt, image_folder=imgdir,
        output_folder=str(tmp_path / "out"),
        number_classes=2, number_channels=1, batch_size=2, dtype="float32",
        base_features=2, quantize="int4")
    with pytest.raises(ValueError, match="unknown quantize mode"):
        inference(cfg)


def test_inference_runner_streaming_quantized(ckpt, tmp_path, capsys):
    """--streaming --quantize int8: calibration reads a central window via
    BigTiffReader.read_region (the whole slide may exceed host RAM) and the
    streamed int8 mask tracks the streamed fp mask."""
    from tpuseg.utils import bigtiff

    imgdir = str(tmp_path / "imgs")
    os.makedirs(imgdir)
    rng = np.random.default_rng(5)
    img = rng.integers(0, 4096, size=(400, 330)).astype(np.uint16)
    bigtiff.write_bigtiff(os.path.join(imgdir, "slide.tif"), img, tile=(128, 128))

    def run(outname, quantize):
        outdir = str(tmp_path / outname)
        os.makedirs(outdir)
        cfg = InferenceConfig(
            checkpoint_filepath=ckpt, image_folder=imgdir, output_folder=outdir,
            number_classes=2, number_channels=1, tile_size=288, radius=96,
            batch_size=2, dtype="float32", base_features=2, streaming=True,
            quantize=quantize)
        return bigtiff.read_bigtiff(inference(cfg)[0])

    fp = run("fp", "none")
    q = run("q", "int8")
    assert "quantize=int8: calibrating on 1 image(s) at 400x320" in capsys.readouterr().out
    assert q.shape == fp.shape == (400, 330)
    assert set(np.unique(q)) <= {0, 1}
    assert (q == fp).mean() > 0.85  # random-init model: near-tie flips only
    # the recommended production combo: streamed whole-slide + blocked int8
    # serving — bit-identical to the dense int8 engine through the rolling
    # strip too (same predict_fn contract, same int8 codes)
    qb = run("qb", "int8_blocked")
    np.testing.assert_array_equal(qb, q)


def test_inference_runner_quantized_empty_folder(ckpt, tmp_path):
    """quantize=int8 on an empty folder returns [] like the fp path (no
    'needs calibration images' crash for scripted pipelines)."""
    imgdir = str(tmp_path / "imgs")
    os.makedirs(imgdir)
    cfg = InferenceConfig(
        checkpoint_filepath=ckpt, image_folder=imgdir,
        output_folder=str(tmp_path / "out"),
        number_classes=2, number_channels=1, batch_size=2, dtype="float32",
        base_features=2, quantize="int8")
    assert inference(cfg) == []


def test_inference_runner_quantized_channel_mismatch_fails_fast(ckpt, tmp_path):
    """A wrong-channel calibration image fails with the clean per-file
    message, not an XLA shape error inside the calibration forward."""
    imgdir = str(tmp_path / "imgs")
    os.makedirs(imgdir)
    rng = np.random.default_rng(0)
    imwrite(os.path.join(imgdir, "rgbish.tif"),
            rng.integers(0, 255, size=(64, 64, 3)).astype(np.uint8))
    cfg = InferenceConfig(
        checkpoint_filepath=ckpt, image_folder=imgdir,
        output_folder=str(tmp_path / "out"),
        number_classes=2, number_channels=1, batch_size=2, dtype="float32",
        base_features=2, quantize="int8")
    with pytest.raises(ValueError, match="3 channel.*number_channels=1"):
        inference(cfg)


def test_inference_runner_quantize_rejects_unknown_mode_empty_folder(ckpt, tmp_path):
    """Mode validation must not be skipped by the empty-folder shortcut
    (review r3): a bad mode fails loudly even with nothing to predict."""
    imgdir = str(tmp_path / "imgs")
    os.makedirs(imgdir)
    cfg = InferenceConfig(
        checkpoint_filepath=ckpt, image_folder=imgdir,
        output_folder=str(tmp_path / "out"),
        number_classes=2, number_channels=1, batch_size=2, dtype="float32",
        base_features=2, quantize="int4")
    with pytest.raises(ValueError, match="unknown quantize mode"):
        inference(cfg)


def test_max_auto_tile_scales_with_batch():
    """The auto-tile HBM cap was measured at batch 8 x 1536^2; larger
    batches shrink the tile so batch x tile^2 stays inside that envelope,
    smaller batches do not extrapolate above 1536 (review r3)."""
    from tpuseg.infer.tiled import MAX_AUTO_TILE, max_auto_tile

    assert max_auto_tile(8) == MAX_AUTO_TILE
    assert max_auto_tile(1) == MAX_AUTO_TILE  # never above the validated point
    for batch in (8, 16, 24, 32, 64):
        tile = max_auto_tile(batch)
        assert tile % 16 == 0
        assert batch * tile * tile <= 8 * MAX_AUTO_TILE * MAX_AUTO_TILE
    assert max_auto_tile(16) < MAX_AUTO_TILE


def test_streaming_quantized_reuses_calibration_stats(ckpt, tmp_path, monkeypatch):
    """int8 calibration's full-slide stats scan is reused by streaming
    inference instead of being recomputed (review r3)."""
    from tpuseg.utils import bigtiff

    imgdir = str(tmp_path / "imgs")
    os.makedirs(imgdir)
    rng = np.random.default_rng(5)
    img = rng.integers(0, 4096, size=(400, 330)).astype(np.uint16)
    bigtiff.write_bigtiff(os.path.join(imgdir, "slide.tif"), img, tile=(128, 128))

    calls = []
    real = bigtiff.BigTiffReader.streaming_zscore_stats

    def counted(self, *a, **k):
        calls.append(1)
        return real(self, *a, **k)

    monkeypatch.setattr(bigtiff.BigTiffReader, "streaming_zscore_stats", counted)
    outdir = str(tmp_path / "out")
    os.makedirs(outdir)
    cfg = InferenceConfig(
        checkpoint_filepath=ckpt, image_folder=imgdir, output_folder=outdir,
        number_classes=2, number_channels=1, tile_size=288, radius=96,
        batch_size=2, dtype="float32", base_features=2, streaming=True,
        quantize="int8")
    inference(cfg)
    assert len(calls) == 1  # once in calibration, zero in the streaming pass


def test_read_ahead_uses_calibration_cache(tmp_path, monkeypatch):
    """Paths whose decoded image sits in the calibration cache are not
    re-read; the cache drains as the stream is consumed (review r3)."""
    import tpuseg.infer.runner as runner_mod

    paths = []
    for i in range(3):
        p = str(tmp_path / f"im{i}.tif")
        imwrite(p, np.full((32, 32), i, np.uint8))
        paths.append(p)

    reads = []
    real = runner_mod.imread

    def counted(p):
        reads.append(p)
        return real(p)

    monkeypatch.setattr(runner_mod, "imread", counted)
    from tpuseg.data.preprocess import zscore_stats as zs
    cached_img = real(paths[0])
    cache = {paths[0]: (cached_img, zs(cached_img)),
             paths[1]: (None, zs(real(paths[1])))}  # stats-only entry
    out = list(runner_mod._read_ahead(paths, enabled=False, cache=cache))
    assert [p for p, _, _ in out] == paths
    assert reads == paths[1:]  # cached image skipped, stats-only re-read
    assert not cache  # drained


def test_check_channels_rejects_bad_ndim():
    """A 4D decode (multi-page TIFF) used to pass the fail-fast gate as
    '1-channel' and die on an opaque shape error downstream (review r3)."""
    from tpuseg.infer.runner import _check_channels

    with pytest.raises(ValueError, match="HW or HWC"):
        _check_channels((3, 64, 64, 3), 1, "pages.tif")
    with pytest.raises(ValueError, match="HW or HWC"):
        _check_channels((64,), 1, "vector.tif")
    _check_channels((64, 64), 1, "ok.tif")
    _check_channels((64, 64, 3), 3, "ok3.tif")


def test_inference_multihost_stripes_folder(ckpt, tmp_path):
    """With multiple processes, each host segments its stride of the sorted
    folder with its LOCAL devices (a process-spanning mesh would deadlock on
    hosts running different tile programs); union over hosts covers the
    folder exactly once."""
    imgdir = str(tmp_path / "imgs")
    os.makedirs(imgdir)
    rng = np.random.default_rng(0)
    names = [f"im{i}.tif" for i in range(5)]
    for n in names:
        imwrite(os.path.join(imgdir, n),
                rng.integers(0, 4096, size=(96, 80)).astype(np.uint16))

    written = {}
    for me in (0, 1):
        outdir = str(tmp_path / f"out{me}")
        cfg = InferenceConfig(
            checkpoint_filepath=ckpt, image_folder=imgdir,
            output_folder=outdir, number_classes=2, number_channels=1,
            tile_size=288, radius=96, batch_size=2, dtype="float32",
            base_features=2, process_index=me, process_count=2)
        written[me] = sorted(os.path.basename(p) for p in inference(cfg))

    assert written[0] == ["im0.tif", "im2.tif", "im4.tif"]
    assert written[1] == ["im1.tif", "im3.tif"]


def test_calibration_sample_is_even_spaced_not_prefix():
    """Calibration inputs are a deterministic evenly-spaced sample of the
    sorted folder, NOT its first-K prefix: alphabetical order can correlate
    with acquisition batch / staining / exposure, so a prefix sample could
    calibrate unrepresentative ranges (VERDICT r4 weak #5). Purely
    positional, so every fleet host derives the identical sample."""
    from tpuseg.infer.runner import _calibration_sample

    paths = [f"im{i:02d}" for i in range(10)]
    assert _calibration_sample(paths, 4) == ["im00", "im02", "im05", "im07"]
    # non-prefix: even a 2-sample reaches into the back half of the folder
    assert _calibration_sample(paths, 2) == ["im00", "im05"]
    assert _calibration_sample(paths, 1) == ["im00"]
    assert _calibration_sample(paths, 10) == paths
    assert _calibration_sample(paths, 99) == paths  # clamped, no IndexError
    assert _calibration_sample(paths, 0) == ["im00"]  # floor of one image


def test_multihost_int8_calibration_is_deterministic(ckpt, tmp_path, monkeypatch):
    """Fleet int8 calibration uses a GLOBAL evenly-spaced sample of the
    sorted folder, not each host's own stripe: every host derives the
    identical scale dict, so masks are identical to the single-host run per
    image (VERDICT r3 item 3 — the repo-wide sharded==unsharded contract)."""
    import tpuseg.infer.quant as quant

    imgdir = str(tmp_path / "imgs")
    os.makedirs(imgdir)
    rng = np.random.default_rng(0)
    # deliberately different intensity distributions per image so per-stripe
    # calibration WOULD disagree if it still saw each host's own first files
    for i, (mu, sig) in enumerate([(500, 40), (2000, 300), (900, 90), (3000, 10)]):
        imwrite(os.path.join(imgdir, f"im{i}.tif"),
                np.clip(rng.normal(mu, sig, (96, 80)), 0, 65535).astype(np.uint16))

    recorded = []
    real_calibrate = quant.calibrate

    def recording_calibrate(*a, **k):
        ranges = real_calibrate(*a, **k)
        recorded.append(ranges)
        return ranges

    monkeypatch.setattr(quant, "calibrate", recording_calibrate)

    def run(outname, me=None, n=None):
        outdir = str(tmp_path / outname)
        cfg = InferenceConfig(
            checkpoint_filepath=ckpt, image_folder=imgdir,
            output_folder=outdir, number_classes=2, number_channels=1,
            tile_size=288, radius=96, batch_size=2, dtype="float32",
            base_features=2, quantize="int8", calibration_images=2,
            process_index=me, process_count=n)
        return {os.path.basename(p): imread(p) for p in inference(cfg)}

    single = run("single")
    host0 = run("h0", me=0, n=2)
    host1 = run("h1", me=1, n=2)

    # three calibrations, one scale dict: bitwise-equal floats
    assert len(recorded) == 3
    assert recorded[0] == recorded[1] == recorded[2]
    # the striped union covers the folder with pixel-identical masks
    assert sorted(host0) == ["im0.tif", "im2.tif"]
    assert sorted(host1) == ["im1.tif", "im3.tif"]
    for name, mask in {**host0, **host1}.items():
        np.testing.assert_array_equal(mask, single[name])


def test_calibration_out_then_in_roundtrip(ckpt, tmp_path, monkeypatch):
    """--calibration_out persists the calibrated scales; a second run with
    --calibration_in loads them, performs ZERO calibration forwards, and
    produces pixel-identical masks (VERDICT r4 item 9)."""
    import tpuseg.infer.quant as quant

    imgdir = str(tmp_path / "imgs")
    _write_corpus(imgdir)
    calls = []
    real_calibrate = quant.calibrate

    def counting_calibrate(*a, **k):
        calls.append(1)
        return real_calibrate(*a, **k)

    monkeypatch.setattr(quant, "calibrate", counting_calibrate)
    cal = str(tmp_path / "cal.json")

    def run(outname, **kw):
        outdir = str(tmp_path / outname)
        cfg = InferenceConfig(
            checkpoint_filepath=ckpt, image_folder=imgdir,
            output_folder=outdir, number_classes=2, number_channels=1,
            tile_size=288, radius=96, batch_size=2, dtype="float32",
            base_features=2, quantize="int8", **kw)
        return {os.path.basename(p): imread(p) for p in inference(cfg)}

    first = run("out_a", calibration_out=cal)
    assert calls == [1] and os.path.exists(cal)
    assert quant.load_act_ranges(cal)  # well-formed, non-empty

    second = run("out_b", calibration_in=cal)
    assert calls == [1]  # no second calibration pass
    assert sorted(second) == sorted(first)
    for name in first:
        np.testing.assert_array_equal(second[name], first[name])


def test_calibration_io_flag_validation(ckpt, tmp_path):
    """calibration_in/out without a quantize mode (silently-ignored flags)
    and in+out together (nothing fresh to write) both fail fast."""
    imgdir = str(tmp_path / "imgs")
    os.makedirs(imgdir)
    base = dict(
        checkpoint_filepath=ckpt, image_folder=imgdir,
        output_folder=str(tmp_path / "out"), number_classes=2,
        number_channels=1, batch_size=2, dtype="float32", base_features=2)
    with pytest.raises(ValueError, match="require"):
        inference(InferenceConfig(calibration_in="x.json", **base))
    with pytest.raises(ValueError, match="one or the other"):
        inference(InferenceConfig(quantize="int8", calibration_in="a.json",
                                  calibration_out="b.json", **base))
