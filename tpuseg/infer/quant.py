"""Post-training int8 quantization of the U-Net forward (serving fast path).

The reference has no quantized path — its inference runs the full Keras
fp32 graph (``/root/reference/UNet/inference.py:105``).  On TPU v5e the MXU
runs int8 matmuls at ~2x the bf16 rate, and a measured device-resident A/B
(BASELINE.md round 3) shows int8 convolutions 1.3-1.5x faster than bf16 at
the U-Net's shapes, so an int8 inference engine is a genuine serving win
that GPUs-era frameworks leave on the table.

Scheme (standard symmetric PTQ, chosen for its zero-copy epilogues):

- **BN folding.** At inference BatchNorm is the per-channel affine
  ``y = x*s + t`` with ``s = gamma/sqrt(var+eps)``, ``t = beta - mean*s``
  (Keras inference semantics, ref model.py:36 with use_running_average).
  Folded once on the host at load time.
- **Weights**: per-output-channel symmetric int8,
  ``wq = round(w / wscale)``, ``wscale = max|w[..., c]| / 127``.
- **Activations**: per-conv-input symmetric int8 scales calibrated from
  max-|x| over a handful of representative (z-score-normalized) images.
- **Compute**: int8 x int8 convolutions accumulate in int32 on the MXU
  (exact: K*Cin*127^2 < 2^31 for every layer of any practical width), then
  a fused fp epilogue dequantizes (``* in_scale*wscale``), adds the conv
  bias, applies ReLU and the folded BN affine, and re-quantizes for the
  next conv.  Elementwise epilogues fuse into XLA's surrounding passes;
  int8 activations also halve the HBM bytes of the bandwidth-bound C=64
  stages.
- ``fp_blocks`` keeps named blocks in bf16 — by default the first conv
  (``enc1a``), whose input is the z-scored raw image: quantizing a uint16
  microscopy image to 8 bits before the first feature extraction is the
  one place PTQ measurably hurts, and the conv is FLOP-trivial anyway.

The quantized ``predict_fn`` has the same ``NHWC batch -> int32 labels``
contract as :func:`tpuseg.infer.tiled.make_predict_fn`, so the whole tiled /
streaming / batched-small-image machinery (and its program caches) runs it
unchanged.  Argmax is taken over the quantized logits; quality parity is
measured as mask agreement + mIoU on the bundled corpus (BASELINE.md).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, List, Sequence

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

# Serving defaults, set by the held-out-corpus sweep in BASELINE.md:
# enc1a stays fp because its input is the raw z-scored image (8-bit-ing a
# uint16 microscopy image before the first feature extraction is the one
# measurably harmful site) and the head because its logits feed argmax
# directly — both are FLOP-trivial (Cin*Cout of 1*64 and 64*classes).
DEFAULT_FP_BLOCKS = ("enc1a", "head")
DEFAULT_PERCENTILE = 99.9


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


def _unet_walk(x, conv_block, deconv_block):
    """The reference graph topology (model.py:85-146) over abstract blocks.

    ``conv_block(name, x)`` / ``deconv_block(name, x)`` supply the math —
    folded-fp for calibration, int8 for serving — so both paths share one
    encoding of the architecture.  Dropout is inference-identity.
    """

    def pair(name, x):
        return conv_block(f"{name}b", conv_block(f"{name}a", x))

    def pool(x):
        # MaxPool 2x2/2 (model.py:50-53)
        return jax.lax.reduce_window(
            x, -jnp.inf if x.dtype != jnp.int8 else jnp.int8(-128), jax.lax.max,
            (1, POOLING_STRIDE, POOLING_STRIDE, 1),
            (1, POOLING_STRIDE, POOLING_STRIDE, 1), "VALID")

    enc1 = pair("enc1", x)
    enc2 = pair("enc2", pool(enc1))
    enc3 = pair("enc3", pool(enc2))
    enc4 = pair("enc4", pool(enc3))
    bott = pair("bottleneck", pool(enc4))

    def up(x, skip, name):
        x = deconv_block(f"{name}up", x)
        # concat order (skip, up), model.py:117
        return pair(name, jnp.concatenate([skip, x], axis=-1))

    dec4 = up(bott, enc4, "dec4")
    dec3 = up(dec4, enc3, "dec3")
    dec2 = up(dec3, enc2, "dec2")
    dec1 = up(dec2, enc1, "dec1")
    return conv_block("head", dec1)


def _conv_fp(x, w, dtype):
    return jax.lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def _deconv(x, w, impl, acc_dtype):
    if impl == "pixel_shuffle":
        # 1x1 conv to 4*features + depth-to-space (models/unet.py DeconvBlock)
        b, h, w_, _ = x.shape
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=acc_dtype)
        s = POOLING_STRIDE
        feats = y.shape[-1] // (s * s)
        y = y.reshape(b, h, w_, s, s, feats)
        return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * s, w_ * s, feats)
    return jax.lax.conv_transpose(
        x, w, (POOLING_STRIDE, POOLING_STRIDE), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc_dtype)


def calibrate(folded: Dict[str, Dict[str, np.ndarray]],
              images: Iterable[np.ndarray],
              deconv_impl: str = "conv_transpose",
              percentile: float = 100.0) -> Dict[str, float]:
    """Per-block input range over z-score-normalized calibration images.

    Runs the folded-fp forward once per image (f32 for faithful ranges) and
    records each conv/deconv input's magnitude range — the given percentile
    of |x| (default 99.9: clipping the outlier tail spends the 127 int8
    codes on the bulk of the distribution), or exact max-|x| at 100.  The
    serving scale is ``range / 127``.  Across calibration images,
    percentile ranges are **averaged** (a max would re-grow toward the
    outlier tail as images are added — measured on the NIST corpus: max-
    aggregated p99.9 degrades mIoU 0.980 -> 0.963 going from 4 to 20
    calibration images, mean-aggregated stays at parity; BASELINE.md) and
    max ranges are max-aggregated (the true global max).  Images are
    HW/HWC float arrays already normalized the way inference normalizes
    them (data/preprocess.zscore semantics); shapes need not match — each
    runs as its own batch of one.
    """
    fold_dev = jax.tree_util.tree_map(jnp.asarray, dict(folded))
    if not 0.0 < percentile <= 100.0:
        raise ValueError(f"percentile must be in (0, 100], got {percentile}")

    def tap(x):
        if percentile >= 100.0:
            return jnp.max(jnp.abs(x))
        return jnp.percentile(jnp.abs(x).ravel(), percentile)

    @jax.jit
    def taps_fn(x):
        taps = {}

        def conv_block(name, x):
            p = fold_dev[name]
            taps[name] = tap(x)
            y = jnp.maximum(_conv_fp(x, p["w"], jnp.float32) + p["b"], 0.0)
            return y * p["s"] + p["t"]

        def deconv_block(name, x):
            p = fold_dev[name]
            taps[name] = tap(x)
            y = _deconv(x.astype(jnp.float32), p["w"].astype(jnp.float32),
                        deconv_impl, jnp.float32)
            return y * p["s"] + p["t"]

        _unet_walk(x, conv_block, deconv_block)
        return taps

    per_image: Dict[str, List[float]] = {}
    for img in images:
        arr = np.asarray(img, np.float32)
        if arr.ndim == 2:
            arr = arr[..., None]
        pad_y = (-arr.shape[0]) % 16
        pad_x = (-arr.shape[1]) % 16
        if pad_y or pad_x:
            arr = np.pad(arr, ((0, pad_y), (0, pad_x), (0, 0)), mode="reflect")
        taps = jax.device_get(taps_fn(jnp.asarray(arr[None])))
        for k, v in taps.items():
            per_image.setdefault(k, []).append(float(v))
    if not per_image:
        raise ValueError("calibration needs at least one image")
    agg = max if percentile >= 100.0 else (lambda vs: sum(vs) / len(vs))
    return {k: agg(vs) for k, vs in per_image.items()}


def quantize_params(folded: Dict[str, Dict[str, np.ndarray]],
                    act_ranges: Dict[str, float],
                    fp_blocks: Sequence[str] = DEFAULT_FP_BLOCKS):
    """Folded params + activation ranges -> the serving parameter pytree.

    Quantized block: ``{"wq": int8, "wscale": f32[cout], "in_scale": f32,
    ("b",) "s", "t"}``; blocks named in ``fp_blocks`` keep ``{"w", ...}``
    and run in bf16.
    """
    q: Dict[str, Dict[str, np.ndarray]] = {}
    for name, p in folded.items():
        out = {"s": p["s"], "t": p["t"]}
        if "b" in p:
            out["b"] = p["b"]
        if name in fp_blocks:
            out["w"] = p["w"]
        else:
            w = p["w"]
            amax = np.max(np.abs(w.reshape(-1, w.shape[-1])), axis=0)
            wscale = np.where(amax > 0, amax, 1.0).astype(np.float32) / 127.0
            out["wq"] = np.clip(np.round(w / wscale), -127, 127).astype(np.int8)
            out["wscale"] = wscale
            out["in_scale"] = np.float32(max(act_ranges[name], 1e-12) / 127.0)
        q[name] = out
    return q


def make_quantized_logits_fn(qparams, deconv_impl: str = "conv_transpose",
                             dtype=jnp.bfloat16) -> Callable[[jax.Array], jax.Array]:
    """Jitted NHWC batch -> f32 logits through the int8 graph (the quantized
    analog of ``model.apply``; softmax it for the reference's probability
    contract, argmax it for masks — `make_quantized_predict_fn` does the
    latter on device)."""
    qp = jax.tree_util.tree_map(jnp.asarray, dict(qparams))

    def _q(x, scale):
        return jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                        -127, 127).astype(jnp.int8)

    def _epilogue(y, p, relu):
        if relu:
            y = jnp.maximum(y + p["b"], 0.0)
        return (y * p["s"] + p["t"]).astype(dtype)

    def conv_block(name, x):
        p = qp[name]
        if "w" in p:  # fp block
            y = _conv_fp(x, p["w"], dtype).astype(jnp.float32)
        else:
            yq = jax.lax.conv_general_dilated(
                _q(x, p["in_scale"]), p["wq"], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            y = yq.astype(jnp.float32) * (p["in_scale"] * p["wscale"])
        return _epilogue(y, p, relu=True)

    def deconv_block(name, x):
        p = qp[name]
        if "w" in p:
            y = _deconv(x.astype(dtype), p["w"].astype(dtype),
                        deconv_impl, jnp.float32).astype(jnp.float32)
        else:
            yq = _deconv(_q(x, p["in_scale"]), p["wq"], deconv_impl, jnp.int32)
            y = yq.astype(jnp.float32) * (p["in_scale"] * p["wscale"])
        return _epilogue(y, p, relu=False)

    @jax.jit
    def logits_fn(batch):
        out = _unet_walk(batch.astype(dtype), conv_block, deconv_block)
        return out.astype(jnp.float32)

    return logits_fn


def make_quantized_predict_fn(qparams, deconv_impl: str = "conv_transpose",
                              dtype=jnp.bfloat16) -> Callable[[jax.Array], jax.Array]:
    """Serving entry point: jitted NHWC batch -> int32 argmax labels.

    Same contract as ``tiled.make_predict_fn`` so every inference engine
    (tiled, streaming, batched small images) runs the int8 path unchanged.
    """
    logits_fn = make_quantized_logits_fn(qparams, deconv_impl, dtype)

    @jax.jit
    def predict(batch):
        return jnp.argmax(logits_fn(batch), axis=-1).astype(jnp.int32)

    return predict


def quantized_predict_from_checkpoint(
        model: UNet, variables, calib_images: List[np.ndarray],
        fp_blocks: Sequence[str] = DEFAULT_FP_BLOCKS,
        percentile: float = DEFAULT_PERCENTILE):
    """One-call serving path: fold, calibrate, quantize, build predict_fn."""
    folded = fold_variables(variables)
    ranges = calibrate(folded, calib_images, deconv_impl=model.deconv_impl,
                       percentile=percentile)
    qparams = quantize_params(folded, ranges, fp_blocks=fp_blocks)
    return make_quantized_predict_fn(qparams, deconv_impl=model.deconv_impl)
