"""Post-training int8 quantization of the U-Net forward (serving fast path).

The reference has no quantized path — its inference runs the full Keras
fp32 graph (``/root/reference/UNet/inference.py:105``).  On TPU v5e the MXU
runs int8 matmuls at ~2x the bf16 rate, and a measured device-resident A/B
(BASELINE.md round 3) shows int8 convolutions 1.3-1.5x faster than bf16 at
the U-Net's shapes, so an int8 inference engine is a genuine serving win.

The engine is **int8-resident**: activations stay int8 *between* blocks,
not just inside the conv.

- **BN folding.** At inference BatchNorm is the per-channel affine
  ``y = x*s + t`` with ``s = gamma/sqrt(var+eps)``, ``t = beta - mean*s``
  (Keras inference semantics, ref model.py:36 with use_running_average).
  Folded once on the host at load time.
- **Every edge carries (int8 tensor, per-channel scale vector).**  Each
  block's epilogue (dequant + bias + ReLU + folded BN) re-quantizes to the
  block's calibrated output range *in the same fused pass* — a first
  int8-between-convs build left the quantize steps as standalone
  ``clamp_convert`` passes over the big C=64 tensors and they cost ~25% of
  device time (trace in BASELINE.md); emitting int8 from the epilogue
  removes them and halves the HBM bytes of every inter-block tensor.
- **Per-channel input scales fold into the weights** at trace time:
  ``conv(x, w) = conv(x_q, round(w * sx[cin] / wscale)) * wscale[cout]``.
  This is what makes skip concatenation free — the two int8 branches keep
  their own scales and the consuming conv's folded weights absorb them,
  instead of re-quantizing either branch to a shared scale.
- **Max-pool runs on int8 directly** (quantization is monotone, so pool
  and quantize commute); scale vectors pass through unchanged.
- **Activation ranges** are calibrated per block output from a handful of
  normalized images: the |activation| percentile (default 99.9 — clipping
  the outlier tail spends the 127 codes on the bulk of the distribution),
  mean-aggregated across images.  Max-aggregation regrows the outlier tail
  as images are added (measured: mIoU 0.980 -> 0.963 from 4 -> 20 images)
  and exact max-abs calibration costs ~2.5 mIoU points; the shipped
  recipe measures *at* fp parity (BASELINE.md sweep).
- ``fp_blocks`` runs named convs in bf16 on dequantized input — by
  default ``enc1a`` (its input is the raw z-scored image; 8-bit-ing uint16
  microscopy data before the first feature extraction is the one
  measurably harmful site) and ``head`` (logits feed argmax directly).
  Both are FLOP-trivial.

The quantized ``predict_fn`` has the same ``NHWC batch -> int32 labels``
contract as :func:`tpuseg.infer.tiled.make_predict_fn`, so the whole tiled /
streaming / batched-small-image machinery (and its program caches) runs it
unchanged.  int8 x int8 convolutions accumulate in int32 on the MXU —
exact for every layer (K*Cin*127^2 < 2^31 at any practical width).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.models.unet import (
    _BN_EPSILON,
    POOLING_STRIDE,
    UNet,
)

# Ordered block names of the reference graph (model.py:85-146); the walker
# below encodes the topology, this list the parameter inventory.
CONV_BLOCKS = (
    "enc1a", "enc1b", "enc2a", "enc2b", "enc3a", "enc3b", "enc4a", "enc4b",
    "bottlenecka", "bottleneckb",
    "dec4a", "dec4b", "dec3a", "dec3b", "dec2a", "dec2b", "dec1a", "dec1b",
    "head",
)
DECONV_BLOCKS = ("dec4up", "dec3up", "dec2up", "dec1up")

# Serving defaults, set by the held-out-corpus sweep in BASELINE.md.
DEFAULT_FP_BLOCKS = ("enc1a", "head")
DEFAULT_PERCENTILE = 99.9

# Calibration key for the network input (the z-scored image itself) — only
# consumed when enc1a is quantized.
INPUT_TAP = "input"


def _bn_affine(bn_params, bn_stats):
    """Folded inference-BN: (s, t) with y = x*s + t (ref model.py:36)."""
    s = bn_params["scale"] / np.sqrt(np.asarray(bn_stats["var"]) + _BN_EPSILON)
    t = bn_params["bias"] - bn_stats["mean"] * s
    return np.asarray(s, np.float32), np.asarray(t, np.float32)


def fold_variables(variables) -> Dict[str, Dict[str, np.ndarray]]:
    """Flax train-state variables -> per-block folded inference params.

    Conv blocks: ``{"w": (kh,kw,cin,cout) f32, "b": (cout,), "s", "t"}``;
    deconv blocks: same minus ``b`` (the reference's deconv bias is a dead
    parameter — see models/unet.py DeconvBlock).
    """
    params = variables["params"]
    stats = variables["batch_stats"]
    folded: Dict[str, Dict[str, np.ndarray]] = {}
    for name in CONV_BLOCKS:
        s, t = _bn_affine(params[name]["bn"], stats[name]["bn"])
        folded[name] = {
            "w": np.asarray(params[name]["conv"]["kernel"], np.float32),
            "b": np.asarray(params[name]["conv"]["bias"], np.float32),
            "s": s, "t": t,
        }
    for name in DECONV_BLOCKS:
        s, t = _bn_affine(params[name]["bn"], stats[name]["bn"])
        folded[name] = {
            "w": np.asarray(params[name]["deconv"]["kernel"], np.float32),
            "s": s, "t": t,
        }
    return folded


def quantize_weight(w: np.ndarray, in_scales: np.ndarray
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Per-output-channel symmetric int8 with the input activation scales
    folded in: ``conv(x_int8, wq) * wscale[cout] ~= conv(x, w)`` where
    ``x = x_int8 * in_scales[cin]``.  Returns ``(wq int8, wscale f32)``.
    """
    w_folded = w * np.asarray(in_scales, np.float32)[:, None]  # (cin, cout) bcast
    amax = np.max(np.abs(w_folded.reshape(-1, w.shape[-1])), axis=0)
    wscale = np.where(amax > 0, amax, 1.0).astype(np.float32) / 127.0
    wq = np.clip(np.round(w_folded / wscale), -127, 127).astype(np.int8)
    return wq, wscale


def _unet_walk(x, conv_block, deconv_block, pool, concat):
    """The reference graph topology (model.py:85-146) over abstract blocks
    and edge ops, shared by the fp-folded forward (calibration/parity), the
    int8-resident forward, and static scale propagation.  Dropout is
    inference-identity.
    """

    def pair(name, x):
        return conv_block(f"{name}b", conv_block(f"{name}a", x))

    enc1 = pair("enc1", x)
    enc2 = pair("enc2", pool(enc1))
    enc3 = pair("enc3", pool(enc2))
    enc4 = pair("enc4", pool(enc3))
    bott = pair("bottleneck", pool(enc4))

    def up(x, skip, name):
        x = deconv_block(f"{name}up", x)
        # concat order (skip, up), model.py:117
        return pair(name, concat(skip, x))

    dec4 = up(bott, enc4, "dec4")
    dec3 = up(dec4, enc3, "dec3")
    dec2 = up(dec3, enc2, "dec2")
    dec1 = up(dec2, enc1, "dec1")
    return conv_block("head", dec1)


def _maxpool(x):
    """MaxPool 2x2/2 (model.py:50-53); valid for fp and int8 payloads."""
    init = jnp.asarray(-128, x.dtype) if x.dtype == jnp.int8 else -jnp.inf
    return jax.lax.reduce_window(
        x, init, jax.lax.max,
        (1, POOLING_STRIDE, POOLING_STRIDE, 1),
        (1, POOLING_STRIDE, POOLING_STRIDE, 1), "VALID")


def _conv_fp(x, w, dtype):
    return jax.lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def _conv_s8(x, wq):
    return jax.lax.conv_general_dilated(
        x, wq, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def _shuffle(y):
    """Depth-to-space for the pixel_shuffle deconv (models/unet.py DeconvBlock)."""
    b, h, w, _ = y.shape
    s = POOLING_STRIDE
    feats = y.shape[-1] // (s * s)
    y = y.reshape(b, h, w, s, s, feats)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * s, w * s, feats)


# --- space-to-depth blocking of the C=64 edge stages (int8_blocked mode) ---
#
# int8 NHWC tensors with C=64 pad the 128-lane tile dimension 2x, so the four
# edge passes (enc1a/enc1b/dec1a/dec1b) stream twice their logical bytes and
# cap the MXU at half output-lane occupancy — the build-2 trace puts >40% of
# int8 device time there (BASELINE.md). Blocking runs those stages on dense
# (H/2, W/2, 4C) tensors: 3x3 convs inflate FLOPs exactly 4x (structurally-
# zero taps), but dec1up collapses to a dense 1x1 conv (no inflation), pool1
# becomes a phase-max, and the head is a block-diagonal 1x1 — and every edge
# tensor halves its HBM bytes. The bf16 *training* trade was measured and
# rejected (FLOP inflation cancels the bandwidth win, BASELINE.md round 2
# #3); the int8 *serving* trade is measured separately (VERDICT r3 item 2).
#
# Phase convention everywhere: p = dy*2 + dx, blocked channel = p*C + c
# (phase-major), matching what depth-to-space reshape semantics produce.

def _s2d(x):
    """Space-to-depth: (B, H, W, C) -> (B, H/2, W/2, 4C), phase-major."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def _d2s(x):
    """Depth-to-space: (B, h, w, 4C) -> (B, 2h, 2w, C), phase-major."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, c)


def _block_weight(w: np.ndarray, cin_groups: Tuple[int, ...]) -> np.ndarray:
    """Blocked equivalent of an odd conv kernel: ``conv(x, w) == d2s(conv(
    s2d(x), wb))`` with SAME padding on both sides (the extra padded original
    rows/cols land on structurally-zero taps, so borders stay exact).

    ``cin_groups`` describes the concat structure of the input channels:
    each group is independently phase-major in the blocked layout (a blocked
    concat of two s2d tensors keeps each group's phases together), so the
    blocked input index of (phase pi, original ci in group g) is
    ``4*start_g + pi*size_g + (ci - start_g)``.
    """
    kh, kw, cin, cout = w.shape
    if kh % 2 != 1 or kw % 2 != 1:
        raise ValueError(f"blocking expects odd kernels, got {kh}x{kw}")
    entries = []
    for po_y in range(2):
        for po_x in range(2):
            po = po_y * 2 + po_x
            for ky in range(kh):
                for kx in range(kw):
                    iy = po_y + ky - kh // 2  # original row offset from 2i
                    ix = po_x + kx - kw // 2
                    entries.append((iy // 2, ix // 2, iy % 2 * 2 + ix % 2,
                                    ky, kx, po))
    qy_min = min(e[0] for e in entries)
    qx_min = min(e[1] for e in entries)
    KH = max(e[0] for e in entries) - qy_min + 1
    KW = max(e[1] for e in entries) - qx_min + 1
    # SAME alignment requires the blocked kernel centered and odd
    assert KH % 2 == 1 and KW % 2 == 1 and qy_min == -(KH // 2) \
        and qx_min == -(KW // 2), (KH, KW, qy_min, qx_min)
    starts = np.concatenate([[0], np.cumsum(cin_groups)])
    assert starts[-1] == cin, (cin_groups, cin)

    def bidx(pi: int, ci: int) -> int:
        g = int(np.searchsorted(starts, ci, side="right")) - 1
        return int(4 * starts[g] + pi * cin_groups[g] + (ci - starts[g]))

    wb = np.zeros((KH, KW, 4 * cin, 4 * cout), np.float32)
    for (qy, qx, pi, ky, kx, po) in entries:
        for ci in range(cin):
            wb[qy - qy_min, qx - qx_min, bidx(pi, ci),
               po * cout:(po + 1) * cout] = w[ky, kx, ci]
    return wb


def _block_weight_deconv(w: np.ndarray, impl: str) -> np.ndarray:
    """Blocked 2x stride-2 deconv == a dense 1x1 conv emitting phase-major
    blocked channels: ``conv_transpose(x, w, s=2) == d2s(conv1x1(x, wb))``.

    conv_transpose places ``x[i,j] @ w[1-dy, 1-dx]`` at output phase
    (dy, dx) (lax SAME k2s2 semantics, pinned numerically in
    tests/test_quant.py); pixel_shuffle's 1x1 kernel already emits
    phase-major channels (the _shuffle reshape order), so it passes through.
    """
    if impl == "pixel_shuffle":
        return np.asarray(w)
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (POOLING_STRIDE, POOLING_STRIDE), (kh, kw)
    wb = np.zeros((1, 1, cin, 4 * cout), w.dtype)
    for dy in range(2):
        for dx in range(2):
            po = dy * 2 + dx
            wb[0, 0, :, po * cout:(po + 1) * cout] = w[1 - dy, 1 - dx]
    return wb


def _deconv(x, w, impl, acc_dtype):
    if impl == "pixel_shuffle":
        # 1x1 conv to 4*features + depth-to-space (models/unet.py DeconvBlock)
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=acc_dtype)
        return _shuffle(y)
    return jax.lax.conv_transpose(
        x, w, (POOLING_STRIDE, POOLING_STRIDE), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc_dtype)


def _folded_walk(fold_dev, x, deconv_impl, dtype, tap=None):
    """The BN-folded fp forward over the reference graph; ``tap(name, y)``
    (if given) observes every block output.  The single source of the
    folded block math — both the parity-anchored logits fn and calibration
    run exactly this graph, so the ranges are always calibrated on the
    graph being served.
    """

    def conv_block(name, x):
        p = fold_dev[name]
        y = jnp.maximum(_conv_fp(x, p["w"], dtype) + p["b"], 0.0)
        y = (y * p["s"] + p["t"]).astype(dtype)
        if tap is not None:
            tap(name, y)
        return y

    def deconv_block(name, x):
        p = fold_dev[name]
        y = _deconv(x.astype(dtype), p["w"].astype(dtype), deconv_impl,
                    jnp.float32)
        y = (y * p["s"] + p["t"]).astype(dtype)
        if tap is not None:
            tap(name, y)
        return y

    def concat(a, b):
        return jnp.concatenate([a, b], axis=-1)

    return _unet_walk(x, conv_block, deconv_block, _maxpool, concat)


def make_folded_logits_fn(folded: Dict[str, Dict[str, np.ndarray]],
                          deconv_impl: str = "conv_transpose",
                          dtype=jnp.float32) -> Callable[[jax.Array], jax.Array]:
    """The folded-fp forward: BN-folded affines over the reference graph,
    no quantization.  ``make_folded_logits_fn(fold_variables(v))(x)`` equals
    ``model.apply(v, x, train=False)`` (pinned in tests/test_quant.py) —
    the correctness anchor the int8 engine is diffed against.
    """
    fold_dev = jax.tree_util.tree_map(jnp.asarray, dict(folded))

    @jax.jit
    def logits_fn(x):
        out = _folded_walk(fold_dev, x.astype(dtype), deconv_impl, dtype)
        return out.astype(jnp.float32)

    return logits_fn


def calibrate(folded: Dict[str, Dict[str, np.ndarray]],
              images: Iterable[np.ndarray],
              deconv_impl: str = "conv_transpose",
              percentile: float = DEFAULT_PERCENTILE) -> Dict[str, float]:
    """Per-block *output* magnitude ranges (plus the network input's under
    ``INPUT_TAP``) over z-score-normalized calibration images.

    Runs the folded-fp forward once per image (f32 for faithful ranges) and
    records the given percentile of |activations| at every block output —
    the int8 clip range of the edge that block emits.  Percentile ranges
    are mean-aggregated across images, exact-max (percentile=100) ranges
    max-aggregated (see the module docstring for the measured why).
    Images are HW/HWC float arrays already normalized the way inference
    normalizes them (data/preprocess.zscore semantics); shapes need not
    match — mismatched images are center-cropped (larger) or reflect-padded
    (smaller) to the first image's x16-padded geometry, so the taps program
    traces and compiles exactly once (the full U-Net costs 25-60 s per
    distinct shape on a TPU; per-image compiles would turn a handful of
    calibration images into minutes of startup — review r3).
    """
    fold_dev = jax.tree_util.tree_map(jnp.asarray, dict(folded))
    if not 0.0 < percentile <= 100.0:
        raise ValueError(f"percentile must be in (0, 100], got {percentile}")

    def rng(x):
        if percentile >= 100.0:
            return jnp.max(jnp.abs(x))
        return jnp.percentile(jnp.abs(x).ravel(), percentile)

    @jax.jit
    def taps_fn(x):
        taps = {INPUT_TAP: rng(x)}
        _folded_walk(fold_dev, x, deconv_impl, jnp.float32,
                     tap=lambda name, y: taps.__setitem__(name, rng(y)))
        return taps

    # the serving graph's input-geometry contract, shared with inference
    # (one definition — review r3): reflect-pad to x16, HW -> HWC
    from tpuseg.infer.tiled import _pad_to_multiple

    per_image: Dict[str, List[float]] = {}
    canon: Optional[Tuple[int, int]] = None
    for img in images:
        arr = np.asarray(img, np.float32)
        if canon is not None and arr.shape[:2] != canon:
            ch, cw = canon
            y0 = max(0, (arr.shape[0] - ch) // 2)
            x0 = max(0, (arr.shape[1] - cw) // 2)
            arr = arr[y0:y0 + ch, x0:x0 + cw]
            if arr.shape[0] < ch or arr.shape[1] < cw:
                pad = [(0, ch - arr.shape[0]), (0, cw - arr.shape[1])]
                pad += [(0, 0)] * (arr.ndim - 2)
                # reflect caps pad width at dim-1; fall back for tiny images
                mode = "reflect" if (pad[0][1] < arr.shape[0]
                                     and pad[1][1] < arr.shape[1]) else "edge"
                arr = np.pad(arr, pad, mode=mode)
        arr, _, _ = _pad_to_multiple(arr)
        canon = canon or arr.shape[:2]
        taps = jax.device_get(taps_fn(jnp.asarray(arr[None])))
        for k, v in taps.items():
            per_image.setdefault(k, []).append(float(v))
    if not per_image:
        raise ValueError("calibration needs at least one image")
    agg = max if percentile >= 100.0 else (lambda vs: sum(vs) / len(vs))
    return {k: agg(vs) for k, vs in per_image.items()}


_CALIBRATION_FORMAT = "tpuseg-int8-calibration-v1"


def save_act_ranges(path: str, act_ranges: Dict[str, float],
                    percentile: Optional[float] = None) -> None:
    """Persist calibrated activation ranges as JSON (VERDICT r4 item 9).

    Fleets and repeat runs hand the file back via :func:`load_act_ranges`
    (``--calibration_out`` / ``--calibration_in`` on the inference CLI) and
    skip the calibration forward passes entirely; audits can diff scale
    drift between checkpoints.  The file is one flat ``{block: range}``
    dict plus provenance (format tag, the percentile that produced it).

    The write is atomic (temp file + ``os.replace``): every host of a
    ``--multihost`` fleet calibrates identically and may hand the SAME
    shared-folder path to ``--calibration_out``, so concurrent writers (or
    a host killed mid-dump) must never leave a torn file that a later
    ``--calibration_in`` run rejects (review r5)."""
    import json
    import os
    import tempfile

    doc = json.dumps({
        "format": _CALIBRATION_FORMAT,
        "percentile": percentile,
        "act_ranges": {k: float(v) for k, v in act_ranges.items()},
    }, indent=2, sort_keys=True) + "\n"
    fd, tmp = tempfile.mkstemp(
        dir=os.path.dirname(os.path.abspath(path)) or ".",
        prefix=os.path.basename(path) + ".", suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            f.write(doc)
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def load_act_ranges(path: str,
                    expect_percentile: Optional[float] = None
                    ) -> Dict[str, float]:
    """Inverse of :func:`save_act_ranges`; validates the format tag and the
    block-name key set so a stale file from a different model topology fails
    loudly here instead of as a KeyError deep inside the traced walk.

    ``expect_percentile``: the run's configured ``--calibration_percentile``.
    Loaded scales embed the percentile that PRODUCED them, so a differing
    configured value would otherwise be silently ignored — warn instead
    (review r5)."""
    import json

    with open(path) as f:
        doc = json.load(f)
    if not isinstance(doc, dict) or doc.get("format") != _CALIBRATION_FORMAT:
        raise ValueError(
            f"{path} is not a tpuseg int8 calibration file "
            f'(expected format tag "{_CALIBRATION_FORMAT}")')
    saved_pct = doc.get("percentile")
    if (expect_percentile is not None and saved_pct is not None
            and float(saved_pct) != float(expect_percentile)):
        print(f"WARNING: {path} was calibrated at percentile {saved_pct}; "
              f"the configured --calibration_percentile {expect_percentile} "
              "is ignored when loading persisted scales — recalibrate "
              "without --calibration_in to change the clip recipe")
    ranges = {k: float(v) for k, v in doc["act_ranges"].items()}
    expected = set(CONV_BLOCKS) | set(DECONV_BLOCKS) | {INPUT_TAP}
    missing = expected - set(ranges)
    unknown = set(ranges) - expected
    if missing or unknown:
        raise ValueError(
            f"{path} does not match the U-Net block set: "
            f"missing={sorted(missing)} unknown={sorted(unknown)}")
    return ranges


def _quantized_raw_fn(folded: Dict[str, Dict[str, np.ndarray]],
                      act_ranges: Dict[str, float],
                      fp_blocks: Sequence[str],
                      deconv_impl: str,
                      dtype,
                      blocked_edges: bool,
                      blocked_head_override: Optional[Callable] = None,
                      ) -> Callable[[jax.Array], jax.Array]:
    """The (unjitted) int8-resident forward shared by the logits and predict
    entry points.  Returns plain f32 logits ``(B, H, W, ncls)``, or — with
    ``blocked_edges`` — phase-major blocked logits ``(B, H/2, W/2, 4*ncls)``
    (callers depth-to-space the logits, or argmax per phase first).

    ``blocked_head_override``, when set, replaces the blocked head stage:
    it is called with the dec1b edge ``(int8 activations, static scale
    vector)`` and its return value becomes the walk's return value — the
    hook the Pallas head+argmax kernel plugs into (infer/head_kernel.py).
    """
    unknown = set(fp_blocks) - set(CONV_BLOCKS) - set(DECONV_BLOCKS)
    if unknown:
        # a typo here would otherwise silently QUANTIZE the block it was
        # meant to keep in fp — observable only as an mIoU drop (review r3)
        raise ValueError(
            f"fp_blocks entries not in the U-Net block set: {sorted(unknown)}; "
            f"valid names: {CONV_BLOCKS + DECONV_BLOCKS}")
    fold_dev = jax.tree_util.tree_map(jnp.asarray, dict(folded))

    def out_scale(name) -> np.float32:
        return np.float32(max(act_ranges[name], 1e-12) / 127.0)

    def emit(y, name, cout):
        """Fused epilogue tail: requantize to the block's output range."""
        so = out_scale(name)
        q = jnp.clip(jnp.round(y / so), -127, 127).astype(jnp.int8)
        return q, np.full(cout, so, np.float32)

    def dequant(x, sv):
        return (x.astype(jnp.float32) * jnp.asarray(sv)).astype(dtype)

    def quantize_input(batch):
        """On-the-fly int8 quantization of the fp network input — the one
        INPUT_TAP codepath shared by the dense and blocked walks (their
        bitwise-identity contract depends on it staying single-sourced)."""
        si = np.float32(max(act_ranges[INPUT_TAP], 1e-12) / 127.0)
        q = jnp.clip(jnp.round(batch.astype(jnp.float32) / si),
                     -127, 127).astype(jnp.int8)
        return q, si

    def conv_block(name, edge):
        x, sv = edge
        p = fold_dev[name]
        w = folded[name]["w"]
        if name in fp_blocks:
            xf = x if sv is None else dequant(x, sv)
            y = _conv_fp(xf, p["w"], dtype)
        else:
            if sv is None:  # quantize the fp network input on the fly
                x, si = quantize_input(x)
                sv = np.full(w.shape[-2], si, np.float32)
            wq, wscale = quantize_weight(w, sv)
            y = _conv_s8(x, jnp.asarray(wq)).astype(jnp.float32) * wscale
        y = jnp.maximum(y + p["b"], 0.0) * p["s"] + p["t"]
        if name == "head":
            return y.astype(jnp.float32)
        return emit(y, name, w.shape[-1])

    def deconv_block(name, edge):
        x, sv = edge
        p = fold_dev[name]
        w = folded[name]["w"]
        cout = w.shape[-1] if deconv_impl != "pixel_shuffle" \
            else w.shape[-1] // (POOLING_STRIDE * POOLING_STRIDE)
        if name in fp_blocks:
            xf = x if sv is None else dequant(x, sv)
            y = _deconv(xf.astype(dtype), p["w"].astype(dtype), deconv_impl,
                        jnp.float32)
        elif deconv_impl == "pixel_shuffle":
            # dequantize per flattened 4*feats channel BEFORE depth-to-space
            # (the shuffle scatters channel groups into spatial positions,
            # so per-channel scales don't survive it)
            wq, wscale = quantize_weight(w, sv)
            y32 = _conv_s8(x, jnp.asarray(wq))
            y = _shuffle(y32.astype(jnp.float32) * wscale)
        else:
            wq, wscale = quantize_weight(w, sv)
            y = _deconv(x, jnp.asarray(wq), deconv_impl, jnp.int32)
            y = y.astype(jnp.float32) * wscale
        y = y * p["s"] + p["t"]
        return emit(y, name, cout)

    def pool(edge):
        x, sv = edge
        return _maxpool(x), sv  # quantization is monotone: pool commutes

    def concat(a, b):
        (xa, sa), (xb, sb) = a, b
        # branches keep their own scales; the consumer's folded weights
        # absorb the concatenated per-channel scale vector
        return jnp.concatenate([xa, xb], axis=-1), np.concatenate([sa, sb])

    if not blocked_edges:
        def logits_fn(batch):
            return _unet_walk((batch, None), conv_block, deconv_block, pool,
                              concat)
        return logits_fn

    # ---- blocked-edge walk: the C=64 stages run on dense (H/2, W/2, 4C)
    # tensors, the pyramid middle (enc2 .. dec2) runs the plain closures ----

    def blocked_conv_block(name, edge, cin_groups):
        x, sv = edge
        w = folded[name]["w"]
        wb = _block_weight(w, cin_groups)
        b4 = jnp.asarray(np.tile(folded[name]["b"], 4))
        s4 = jnp.asarray(np.tile(folded[name]["s"], 4))
        t4 = jnp.asarray(np.tile(folded[name]["t"], 4))
        if name in fp_blocks:
            xf = x if sv is None else dequant(x, sv)
            y = _conv_fp(xf, jnp.asarray(wb), dtype)
        else:
            wq, wscale = quantize_weight(wb, sv)
            y = _conv_s8(x, jnp.asarray(wq)).astype(jnp.float32) * wscale
        y = jnp.maximum(y + b4, 0.0) * s4 + t4
        if name == "head":
            return y.astype(jnp.float32)  # blocked logits
        return emit(y, name, 4 * w.shape[-1])

    def blocked_deconv_block(name, edge):
        """Dense (H/2) input -> blocked output via a 1x1 conv: zero FLOP
        inflation AND dense lanes on both sides (the one stage blocking
        makes strictly cheaper)."""
        x, sv = edge
        w = folded[name]["w"]
        s4 = jnp.asarray(np.tile(folded[name]["s"], 4))
        t4 = jnp.asarray(np.tile(folded[name]["t"], 4))
        if name in fp_blocks:
            xf = x if sv is None else dequant(x, sv)
            wb = _block_weight_deconv(np.asarray(w, np.float32), deconv_impl)
            y = _conv_fp(xf, jnp.asarray(wb), dtype).astype(jnp.float32)
            cout4 = wb.shape[-1]
        else:
            # quantize the DENSE kernel first, then reorder its int8 codes
            # into blocked layout: the per-output-channel amax then spans
            # all 2x2 taps exactly as in the dense engine, so the blocked
            # path stays arithmetically identical to it (per-phase amax
            # would be finer — different codes, different pixels)
            wq, wscale = quantize_weight(w, sv)
            wqb = _block_weight_deconv(wq, deconv_impl)
            if deconv_impl != "pixel_shuffle":
                wscale = np.tile(wscale, 4)
            y = _conv_s8(x, jnp.asarray(wqb)).astype(jnp.float32) * wscale
            cout4 = wqb.shape[-1]
        y = y * s4 + t4
        return emit(y, name, cout4)

    def phase_max(edge):
        """pool1 on the blocked layout: max over the 4 phases per blocked
        pixel — exactly maxpool 2x2/2, with the reduce_window replaced by a
        chain of static lane-dim slices and elementwise maxima (a 5-D
        reshape+reduce compiled to a reduce in a layout the consuming conv
        rejects — an extra full-tensor copy, traced at ~2% of blocked device
        time). Valid on int8 payloads because every phase shares the
        block's scalar output scale."""
        x, sv = edge
        c = x.shape[-1] // 4
        y = jnp.maximum(jnp.maximum(x[..., :c], x[..., c:2 * c]),
                        jnp.maximum(x[..., 2 * c:3 * c], x[..., 3 * c:]))
        return y, sv[:c]

    def blocked_logits_fn(batch):
        nc = batch.shape[-1]
        if "enc1a" in fp_blocks:
            edge = (_s2d(batch).astype(dtype), None)
        else:
            q, si = quantize_input(batch)
            edge = (_s2d(q), np.full(4 * nc, si, np.float32))
        f = folded["enc1b"]["w"].shape[2]  # base feature width
        enc1 = blocked_conv_block(
            "enc1b", blocked_conv_block("enc1a", edge, (nc,)), (f,))
        x = phase_max(enc1)

        def pair(name, x):
            return conv_block(f"{name}b", conv_block(f"{name}a", x))

        enc2 = pair("enc2", x)
        enc3 = pair("enc3", pool(enc2))
        enc4 = pair("enc4", pool(enc3))
        bott = pair("bottleneck", pool(enc4))
        dec4 = pair("dec4", concat(enc4, deconv_block("dec4up", bott)))
        dec3 = pair("dec3", concat(enc3, deconv_block("dec3up", dec4)))
        dec2 = pair("dec2", concat(enc2, deconv_block("dec2up", dec3)))
        up1 = blocked_deconv_block("dec1up", dec2)
        cat = (jnp.concatenate([enc1[0], up1[0]], axis=-1),
               np.concatenate([enc1[1], up1[1]]))
        d1 = blocked_conv_block(
            "dec1b", blocked_conv_block("dec1a", cat, (f, f)), (f,))
        if blocked_head_override is not None:
            return blocked_head_override(*d1)
        return blocked_conv_block("head", d1, (f,))

    return blocked_logits_fn


def make_quantized_logits_fn(folded: Dict[str, Dict[str, np.ndarray]],
                             act_ranges: Dict[str, float],
                             fp_blocks: Sequence[str] = DEFAULT_FP_BLOCKS,
                             deconv_impl: str = "conv_transpose",
                             dtype=jnp.bfloat16,
                             blocked_edges: bool = False,
                             ) -> Callable[[jax.Array], jax.Array]:
    """Jitted NHWC batch -> f32 logits through the int8-resident graph.

    Every inter-block edge is ``(int8 tensor, static per-channel scale
    vector)``; weight folding/quantization runs on the static scales at
    trace time (numpy — the int8 weights compile in as program constants).
    Blocks in ``fp_blocks`` run their conv in ``dtype`` on dequantized
    input but still emit int8 from their epilogue.  The head emits f32
    logits (its epilogue feeds argmax / softmax, never another conv).

    ``blocked_edges`` runs the C=64 edge stages space-to-depth-blocked on
    dense (H/2, W/2, 4C) tensors (see the blocking section above); logits
    are depth-to-spaced back, so the contract is unchanged.
    """
    raw = _quantized_raw_fn(folded, act_ranges, fp_blocks, deconv_impl,
                            dtype, blocked_edges)

    @jax.jit
    def logits_fn(batch):
        out = raw(batch)
        return _d2s(out) if blocked_edges else out

    return logits_fn


def make_quantized_predict_fn(folded, act_ranges,
                              fp_blocks: Sequence[str] = DEFAULT_FP_BLOCKS,
                              deconv_impl: str = "conv_transpose",
                              dtype=jnp.bfloat16,
                              blocked_edges: bool = False,
                              ) -> Callable[[jax.Array], jax.Array]:
    """Serving entry point: jitted NHWC batch -> int32 argmax labels.

    Same contract as ``tiled.make_predict_fn`` so every inference engine
    (tiled, streaming, batched small images) runs the int8 path unchanged.
    With ``blocked_edges`` the argmax runs per phase on the blocked logits
    and only the int32 labels are depth-to-spaced — the full-resolution f32
    logits tensor is never materialized.  On TPU the blocked head + argmax
    + depth-to-space run as a transposed ``dot_general`` (infer/
    head_kernel.py): the conv-formulated head materializes 16x-lane-padded
    blocked logits, the transposed dot keeps phase-classes on a major dim
    and writes only unpadded label lanes (78.6 vs 78.2 MP/s, BASELINE.md
    round 4 — small because XLA already output-fuses the 1x1 head into
    dec1b's conv).  CPU keeps the XLA conv formulation, so the CPU-mesh
    equality tests pin the engine contract; ``TPUSEG_HEAD`` selects
    xla/tdot/pallas explicitly (the Pallas kernel is the measured-rejected
    variant: its row-major operand requirement re-layouts the whole dec1
    chain, 55.6 MP/s).
    """
    override = None
    if blocked_edges:
        from tpuseg.infer.head_kernel import (blocked_head_argmax,
                                              head_kernel_eligible)

        w = folded["head"]["w"]  # [1, 1, feats, ncls]
        feats, ncls = w.shape[2], w.shape[3]
        if head_kernel_eligible(ncls):
            wb = _block_weight(w, (feats,))  # [1, 1, 4f, 4ncls]
            b4 = np.tile(folded["head"]["b"], 4).astype(np.float32)
            s4 = np.tile(folded["head"]["s"], 4).astype(np.float32)
            t4 = np.tile(folded["head"]["t"], 4).astype(np.float32)
            fp = "head" in fp_blocks

            def override(x, sv):
                if fp:
                    wt = jnp.asarray(wb[0, 0].T, dtype)
                    epi = np.stack([b4, s4, t4, np.ones_like(b4)])
                    return blocked_head_argmax(x, sv, wt, epi, ncls, fp=True)
                wq, wscale = quantize_weight(wb, sv)
                epi = np.stack([b4, s4, t4, wscale.astype(np.float32)])
                return blocked_head_argmax(x, sv, jnp.asarray(wq[0, 0].T),
                                           epi, ncls, fp=False)

    raw = _quantized_raw_fn(folded, act_ranges, fp_blocks, deconv_impl,
                            dtype, blocked_edges,
                            blocked_head_override=override)

    @jax.jit
    def predict(batch):
        out = raw(batch)
        if not blocked_edges:
            return jnp.argmax(out, axis=-1).astype(jnp.int32)
        if override is not None:
            return out  # the kernel already returned dense int32 labels
        b, h, w_, c4 = out.shape
        lbl = jnp.argmax(out.reshape(b, h, w_, 4, c4 // 4), axis=-1)
        # lbl is (b, h, w, 4) = blocked labels with C=1 per phase
        return _d2s(lbl.astype(jnp.int32))[..., 0]

    return predict


def quantized_predict_from_checkpoint(
        model: UNet, variables, calib_images: List[np.ndarray],
        fp_blocks: Sequence[str] = DEFAULT_FP_BLOCKS,
        percentile: float = DEFAULT_PERCENTILE,
        blocked_edges: bool = False):
    """One-call serving path: fold, calibrate, build the int8 predict_fn."""
    folded = fold_variables(variables)
    ranges = calibrate(folded, calib_images, deconv_impl=model.deconv_impl,
                       percentile=percentile)
    return make_quantized_predict_fn(folded, ranges, fp_blocks=fp_blocks,
                                     deconv_impl=model.deconv_impl,
                                     blocked_edges=blocked_edges)
