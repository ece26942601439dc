"""Segmentation quality metrics, computed on device.

The reference tracks only CCE loss and categorical accuracy (train.py:105-108).
Segmentation work reports mIoU, and BASELINE.md's parity bar is "mIoU parity
on the bundled corpus" — so the framework carries a jit-friendly confusion
matrix with IoU/Dice/pixel-accuracy derived from it.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


# per-chunk pixel count: each cell's fp32 partial stays < 2^24, so every
# increment is exact before the int32 accumulation across chunks
_CM_CHUNK = 1 << 22


def confusion_matrix(pred: jax.Array, true: jax.Array, num_classes: int) -> jax.Array:
    """[num_classes, num_classes] int32 counts; rows = truth, cols = pred.
    Implemented as a one-hot matmul (MXU) rather than scatter (gather/scatter
    is the slow path on TPU). The matmul runs in fp32 per <=2^22-pixel chunk
    (counts stay exactly representable) and accumulates across chunks in
    int32 — a single fp32 accumulation would silently stop counting at 2^24
    pixels of one class (review r3). Inputs beyond ~2e9 total pixels belong
    on the host streaming path (evaluate_folder)."""
    pred = pred.reshape(-1).astype(jnp.int32)
    true = true.reshape(-1).astype(jnp.int32)
    n = pred.shape[0]
    cm0 = jnp.zeros((num_classes, num_classes), jnp.int32)
    if n == 0:
        return cm0
    chunk = min(n, _CM_CHUNK)
    k = -(-n // chunk)
    # padded pixels get out-of-range labels -> all-zero one-hot rows, so
    # they drop out of the counts with no correction term
    pad = k * chunk - n
    pred = jnp.pad(pred, (0, pad), constant_values=num_classes)
    true = jnp.pad(true, (0, pad), constant_values=num_classes)

    def body(cm, pt):
        p, t = pt
        pred_oh = jax.nn.one_hot(p, num_classes, dtype=jnp.float32)
        true_oh = jax.nn.one_hot(t, num_classes, dtype=jnp.float32)
        part = jnp.einsum("nt,np->tp", true_oh, pred_oh,
                          preferred_element_type=jnp.float32)
        return cm + part.astype(jnp.int32), None

    cm, _ = jax.lax.scan(body, cm0, (pred.reshape(k, chunk), true.reshape(k, chunk)))
    return cm


def iou_from_confusion(cm: jax.Array) -> jax.Array:
    """Per-class IoU; classes absent from both pred and truth get IoU 0."""
    tp = jnp.diagonal(cm)
    fp = jnp.sum(cm, axis=0) - tp
    fn = jnp.sum(cm, axis=1) - tp
    denom = tp + fp + fn
    return jnp.where(denom > 0, tp / jnp.maximum(denom, 1.0), 0.0)


def segmentation_metrics(logits_or_pred: jax.Array, labels: jax.Array,
                         num_classes: int) -> Dict[str, jax.Array]:
    """logits [N,H,W,C] (argmaxed here) or int predictions [N,H,W]; labels
    one-hot [N,H,W,C] or int [N,H,W]."""
    pred = (jnp.argmax(logits_or_pred, axis=-1)
            if logits_or_pred.ndim == 4 else logits_or_pred)
    true = jnp.argmax(labels, axis=-1) if labels.ndim == 4 else labels
    cm = confusion_matrix(pred, true, num_classes)
    iou = iou_from_confusion(cm)
    present = (jnp.sum(cm, axis=1) + jnp.sum(cm, axis=0)) > 0
    miou = jnp.sum(jnp.where(present, iou, 0.0)) / jnp.maximum(jnp.sum(present), 1)
    tp = jnp.diagonal(cm)
    dice_denom = 2 * tp + (jnp.sum(cm, axis=0) - tp) + (jnp.sum(cm, axis=1) - tp)
    dice = jnp.where(dice_denom > 0, 2 * tp / jnp.maximum(dice_denom, 1.0), 0.0)
    return {
        "confusion": cm,
        "iou": iou,
        "mean_iou": miou,
        "dice": dice,
        "pixel_accuracy": jnp.sum(tp) / jnp.maximum(jnp.sum(cm), 1.0),
    }


def _bincount_cm(pred, true, num_classes):
    """Exact integer confusion counts on host (rows = truth, cols = pred) —
    the streaming accumulator; identical counts to :func:`confusion_matrix`,
    including its semantics for labels outside [0, num_classes): such pixels
    (e.g. the common 255 void/ignore convention) are excluded from the
    counts, exactly as one-hot encoding drops them."""
    import numpy as np

    p = np.asarray(pred)
    t = np.asarray(true)
    # trailing singleton channels are benign: imread preserves HW vs HWC1
    # (utils/imagio), and both ravel to identically-paired pixel streams
    if p.ndim == 3 and p.shape[-1] == 1:
        p = p[..., 0]
    if t.ndim == 3 and t.shape[-1] == 1:
        t = t[..., 0]
    if p.shape != t.shape:
        # ravelling equal-sized but differently-shaped masks (e.g. a
        # transposed HxW) would silently mis-pair pixels
        raise ValueError(f"mask shape mismatch: pred {p.shape} vs true {t.shape}")
    p = p.ravel().astype(np.int64)
    t = t.ravel().astype(np.int64)
    valid = (p >= 0) & (p < num_classes) & (t >= 0) & (t < num_classes)
    if not valid.all():
        p, t = p[valid], t[valid]
    return np.bincount(t * num_classes + p,
                       minlength=num_classes * num_classes
                       ).reshape(num_classes, num_classes)


def _stream_confusion(pred_fp: str, truth_fp: str, num_classes: int):
    """Confusion matrix of one mask pair, accumulated tile-by-tile from two
    tiled BigTIFFs without materializing either — scores whole-slide masks
    larger than host RAM (the streaming inference path's output). Returns
    the file's counts (accumulated locally so a mid-file failure leaves the
    caller's total untouched)."""
    import numpy as np

    from tpuseg.utils.bigtiff import BigTiffReader

    cm = np.zeros((num_classes, num_classes), np.float64)
    with BigTiffReader(pred_fp, tile_cache=1) as pr, \
            BigTiffReader(truth_fp, tile_cache=1) as tr:
        # the sweep walks pred's grid; when the truth grid differs, each
        # pred region spans several truth tiles, so a 1-slot LRU would
        # re-inflate them ~4x — one truth-tile row bounds memory and
        # removes the redundant decodes (review r3)
        tr.set_cache_size(tr.tiles_across + 2)
        if (pr.height, pr.width) != (tr.height, tr.width):
            # ValueError, NOT IOError: evaluate_folder's dialect fallback
            # catches IOError and would retry via imread, silently scoring
            # mis-paired pixels (ADVICE r2) — a geometry mismatch is a data
            # error, not a format problem
            raise ValueError(f"mask shape mismatch: {pred_fp} {pr.shape} vs "
                             f"{truth_fp} {tr.shape}")
        th, tw = pr.tile_height, pr.tile_width
        for ty in range(pr.tiles_down):
            for tx in range(pr.tiles_across):
                y0, x0 = ty * th, tx * tw
                h = min(th, pr.height - y0)
                w = min(tw, pr.width - x0)
                cm += _bincount_cm(pr.read_region(y0, x0, h, w),
                                   tr.read_region(y0, x0, h, w), num_classes)
    return cm


def evaluate_folder(pred_folder: str, truth_folder: str, num_classes: int) -> Dict[str, float]:
    """Host-side corpus evaluation: accumulate the confusion matrix over
    matching mask files in two folders (e.g. inference output vs ground
    truth), then derive mIoU/Dice/accuracy. Pairs where both files are
    tiled BigTIFF stream tile-by-tile, so whole-slide masks larger than
    host RAM score without being materialized."""
    import os

    import numpy as np

    from tpuseg.utils.bigtiff import is_bigtiff
    from tpuseg.utils.imagio import imread

    preds = sorted(os.listdir(pred_folder))
    files = [f for f in preds if os.path.exists(os.path.join(truth_folder, f))]
    if not files:
        raise IOError(f"no matching mask files between {pred_folder} and {truth_folder}")
    # a partial prediction set (inference crashed mid-corpus) must not
    # silently score as the corpus mIoU — name the asymmetry (review r3)
    unmatched_pred = len(preds) - len(files)
    matched = set(files)
    unmatched_truth = sum(1 for f in os.listdir(truth_folder) if f not in matched)
    if unmatched_pred or unmatched_truth:
        print(f"WARNING: scoring {len(files)} matched pairs; "
              f"{unmatched_pred} prediction file(s) and {unmatched_truth} "
              f"truth file(s) have no counterpart and are NOT scored")
    cm_total = np.zeros((num_classes, num_classes), np.float64)
    for fn in files:
        pred_fp = os.path.join(pred_folder, fn)
        truth_fp = os.path.join(truth_folder, fn)
        if is_bigtiff(pred_fp) and is_bigtiff(truth_fp):
            try:
                cm_total += _stream_confusion(pred_fp, truth_fp, num_classes)
                continue
            except IOError:
                # foreign BigTIFF dialect (strip layout, LZW, ...): fall
                # back to imread, whose imageio/cv2 backends handle those
                pass
        pred = np.asarray(imread(pred_fp)).astype(np.int32)
        true = np.asarray(imread(truth_fp)).astype(np.int32)
        cm_total += _bincount_cm(pred, true, num_classes)
    # pure numpy: float64-exact above 2^24 pixels, and the evaluate CLI
    # never initializes a device backend just to divide a KxK matrix
    # (review r3; the jnp path also demoted the counts to float32)
    tp = np.diag(cm_total)
    denom = cm_total.sum(axis=1) + cm_total.sum(axis=0) - tp
    iou = np.where(denom > 0, tp / np.maximum(denom, 1.0), 0.0)
    present = (cm_total.sum(axis=1) + cm_total.sum(axis=0)) > 0
    miou = float(iou[present].mean()) if present.any() else 0.0
    return {
        "mean_iou": miou,
        "per_class_iou": [float(v) for v in iou],
        "pixel_accuracy": float(np.trace(cm_total) / max(cm_total.sum(), 1.0)),
        "num_images": len(files),
        "num_unmatched_pred": unmatched_pred,
        "num_unmatched_truth": unmatched_truth,
    }
