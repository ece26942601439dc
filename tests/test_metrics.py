"""Segmentation metric tests against hand-computed values."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpuseg.ops.metrics import (
    confusion_matrix,
    iou_from_confusion,
    segmentation_metrics,
)


def test_confusion_matrix():
    pred = jnp.asarray([[0, 1], [1, 1]])
    true = jnp.asarray([[0, 1], [0, 1]])
    cm = np.asarray(confusion_matrix(pred, true, 2))
    # truth 0: predicted 0 once, 1 once; truth 1: predicted 1 twice
    np.testing.assert_array_equal(cm, [[1, 1], [0, 2]])


def test_iou():
    cm = jnp.asarray([[1.0, 1.0], [0.0, 2.0]])
    iou = np.asarray(iou_from_confusion(cm))
    # class0: tp=1, fp=0, fn=1 -> 1/2 ; class1: tp=2, fp=1, fn=0 -> 2/3
    np.testing.assert_allclose(iou, [0.5, 2 / 3])


def test_perfect_prediction():
    pred = jnp.asarray(np.random.default_rng(0).integers(0, 3, (2, 8, 8)))
    m = segmentation_metrics(pred, pred, 3)
    assert float(m["mean_iou"]) == 1.0
    assert float(m["pixel_accuracy"]) == 1.0
    np.testing.assert_allclose(np.asarray(m["dice"]), 1.0)


def test_absent_class_excluded_from_miou():
    pred = jnp.zeros((1, 4, 4), jnp.int32)
    true = jnp.zeros((1, 4, 4), jnp.int32)
    m = segmentation_metrics(pred, true, 3)  # classes 1,2 absent everywhere
    assert float(m["mean_iou"]) == 1.0


def test_logits_and_onehot_inputs():
    logits = jnp.asarray(np.random.default_rng(1).normal(size=(1, 8, 8, 3)), jnp.float32)
    labels = jnp.asarray(np.eye(3)[np.random.default_rng(2).integers(0, 3, (1, 8, 8))],
                         jnp.float32)
    m = segmentation_metrics(logits, labels, 3)
    assert 0.0 <= float(m["mean_iou"]) <= 1.0
    assert np.asarray(m["confusion"]).sum() == 64


def test_evaluate_folder(tmp_path):
    from tpuseg.ops.metrics import evaluate_folder
    from tpuseg.utils.imagio import imwrite

    (tmp_path / "pred").mkdir()
    (tmp_path / "true").mkdir()
    rng = np.random.default_rng(3)
    for i in range(3):
        t = rng.integers(0, 2, (32, 32)).astype(np.uint8)
        p = t.copy()
        p[:8] = 1 - p[:8]  # corrupt a quarter
        imwrite(str(tmp_path / "true" / f"m{i}.tif"), t)
        imwrite(str(tmp_path / "pred" / f"m{i}.tif"), p)
    res = evaluate_folder(str(tmp_path / "pred"), str(tmp_path / "true"), 2)
    assert res["num_images"] == 3
    assert abs(res["pixel_accuracy"] - 0.75) < 0.02
    assert 0.4 < res["mean_iou"] < 0.75


def test_evaluate_folder_streams_bigtiff_pairs(tmp_path):
    """BigTIFF mask pairs stream tile-by-tile with identical scores to the
    in-RAM path (the whole-slide streaming-inference output format)."""
    from tpuseg.ops.metrics import evaluate_folder
    from tpuseg.utils import bigtiff
    from tpuseg.utils.imagio import imwrite

    rng = np.random.default_rng(4)
    t = rng.integers(0, 3, (300, 260)).astype(np.uint8)
    p = t.copy()
    p[:100] = (p[:100] + 1) % 3

    for sub in ("pred_bt", "true_bt", "pred_pl", "true_pl"):
        (tmp_path / sub).mkdir()
    bigtiff.write_bigtiff(str(tmp_path / "pred_bt" / "m.tif"), p, tile=(64, 64))
    bigtiff.write_bigtiff(str(tmp_path / "true_bt" / "m.tif"), t, tile=(64, 64))
    imwrite(str(tmp_path / "pred_pl" / "m.png"), p)
    imwrite(str(tmp_path / "true_pl" / "m.png"), t)

    streamed = evaluate_folder(str(tmp_path / "pred_bt"), str(tmp_path / "true_bt"), 3)
    in_ram = evaluate_folder(str(tmp_path / "pred_pl"), str(tmp_path / "true_pl"), 3)
    assert streamed == in_ram


def test_evaluate_folder_excludes_void_labels(tmp_path):
    """Labels outside [0, num_classes) (e.g. the 255 void convention) are
    excluded from the counts — the same semantics one-hot encoding gives
    the on-device confusion matrix."""
    from tpuseg.ops.metrics import evaluate_folder
    from tpuseg.utils.imagio import imwrite

    (tmp_path / "pred").mkdir()
    (tmp_path / "true").mkdir()
    t = np.zeros((16, 16), np.uint8)
    t[:8] = 255  # void half
    p = np.zeros((16, 16), np.uint8)
    p[:8] = 1  # predictions on void pixels must not count
    imwrite(str(tmp_path / "pred" / "m.tif"), p)
    imwrite(str(tmp_path / "true" / "m.tif"), t)
    res = evaluate_folder(str(tmp_path / "pred"), str(tmp_path / "true"), 2)
    assert res["pixel_accuracy"] == 1.0  # only the labeled half scored


def test_evaluate_folder_falls_back_on_foreign_bigtiff(tmp_path, monkeypatch):
    """BigTIFF dialects our reader rejects (strip layout, LZW, ...) fall
    back to imread instead of aborting the evaluation."""
    from tpuseg.ops import metrics
    from tpuseg.utils import bigtiff

    rng = np.random.default_rng(5)
    t = rng.integers(0, 2, (40, 40)).astype(np.uint8)
    (tmp_path / "pred").mkdir()
    (tmp_path / "true").mkdir()
    bigtiff.write_bigtiff(str(tmp_path / "pred" / "m.tif"), t, tile=(16, 16))
    bigtiff.write_bigtiff(str(tmp_path / "true" / "m.tif"), t, tile=(16, 16))

    def boom(*a, **k):
        raise IOError("unsupported compression 5")

    monkeypatch.setattr(metrics, "_stream_confusion", boom)
    res = metrics.evaluate_folder(str(tmp_path / "pred"), str(tmp_path / "true"), 2)
    assert res["pixel_accuracy"] == 1.0 and res["num_images"] == 1


def test_evaluate_folder_shape_mismatch_is_not_swallowed(tmp_path):
    """A transposed prediction mask must raise, not silently score through
    the dialect fallback's ravel (ADVICE r2): the streaming IOError->imread
    retry path must not catch geometry errors."""
    from tpuseg.ops.metrics import _bincount_cm, evaluate_folder
    from tpuseg.utils import bigtiff

    rng = np.random.default_rng(3)
    pred_dir, truth_dir = tmp_path / "pred", tmp_path / "truth"
    pred_dir.mkdir(), truth_dir.mkdir()
    # equal pixel counts, transposed shapes — the silent-corruption case
    bigtiff.write_bigtiff(str(pred_dir / "m.tif"),
                          rng.integers(0, 2, (48, 32)).astype(np.uint8), tile=(16, 16))
    bigtiff.write_bigtiff(str(truth_dir / "m.tif"),
                          rng.integers(0, 2, (32, 48)).astype(np.uint8), tile=(16, 16))
    with pytest.raises(ValueError, match="shape mismatch"):
        evaluate_folder(str(pred_dir), str(truth_dir), num_classes=2)
    with pytest.raises(ValueError, match="shape mismatch"):
        _bincount_cm(np.zeros((4, 6), np.int32), np.zeros((6, 4), np.int32), 2)


def test_bincount_cm_allows_trailing_singleton_channel():
    """(H,W) vs (H,W,1) pairs are benign (imread preserves HWC1) and must
    score identically to the squeezed pair — only true geometry mismatches
    raise."""
    from tpuseg.ops.metrics import _bincount_cm

    rng = np.random.default_rng(0)
    a = rng.integers(0, 2, (16, 24)).astype(np.int32)
    cm = _bincount_cm(a, a[..., None], 2)
    np.testing.assert_array_equal(cm, _bincount_cm(a, a, 2))


def test_confusion_matrix_exact_above_fp24():
    """fp32 accumulation stops incrementing at 2^24; the chunked int32
    accumulation must count a >16.7M-pixel class exactly (review r3)."""
    import jax.numpy as jnp

    from tpuseg.ops.metrics import confusion_matrix

    n = (1 << 24) + 77
    pred = jnp.zeros((n,), jnp.int32)
    true = jnp.zeros((n,), jnp.int32)
    cm = np.asarray(confusion_matrix(pred, true, 2))
    assert cm.dtype.kind == "i"
    assert cm[0, 0] == n
    assert cm.sum() == n


def test_confusion_matrix_chunk_padding_neutral():
    """Chunk padding must contribute zero counts for sizes straddling the
    chunk boundary (review r3)."""
    import jax.numpy as jnp

    from tpuseg.ops import metrics as M

    rng = np.random.default_rng(0)
    for n in (1, M._CM_CHUNK - 1, M._CM_CHUNK, M._CM_CHUNK + 1):
        p = rng.integers(0, 3, n)
        t = rng.integers(0, 3, n)
        cm = np.asarray(M.confusion_matrix(jnp.asarray(p), jnp.asarray(t), 3))
        np.testing.assert_array_equal(cm, M._bincount_cm(p, t, 3))


def test_evaluate_folder_reports_unmatched(tmp_path, capsys):
    """A partial prediction set must be named, not silently scored as the
    corpus (review r3)."""
    import numpy as np

    from tpuseg.ops.metrics import evaluate_folder
    from tpuseg.utils.imagio import imwrite

    pred, truth = tmp_path / "pred", tmp_path / "truth"
    pred.mkdir(), truth.mkdir()
    m = np.zeros((32, 32), np.uint8)
    imwrite(str(pred / "a.tif"), m)
    imwrite(str(truth / "a.tif"), m)
    imwrite(str(truth / "b.tif"), m)  # truth with no prediction
    r = evaluate_folder(str(pred), str(truth), num_classes=2)
    assert r["num_images"] == 1
    assert r["num_unmatched_pred"] == 0 and r["num_unmatched_truth"] == 1
    assert "NOT scored" in capsys.readouterr().out


def test_corrupt_tile_normalizes_to_ioerror(tmp_path):
    """A mid-file decode failure raises IOError (the foreign-dialect signal
    that engages imread fallbacks), not raw zlib.error (review r3)."""
    import numpy as np

    from tpuseg.utils.bigtiff import BigTiffReader, write_bigtiff

    fp = str(tmp_path / "x.tif")
    img = np.random.default_rng(0).integers(0, 255, (128, 128)).astype(np.uint8)
    write_bigtiff(fp, img, tile=(64, 64))
    with BigTiffReader(fp) as r:
        off = int(r._offsets[0])
    data = bytearray(open(fp, "rb").read())
    data[off:off + 8] = b"\xff" * 8  # corrupt the first tile's stream
    open(fp, "wb").write(bytes(data))
    with BigTiffReader(fp) as r:
        with pytest.raises(IOError):
            r.read_region(0, 0, 64, 64)
