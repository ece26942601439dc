"""TPU-native U-Net in Flax.

Re-implements the network in the reference ``UNet/model.py:85-146`` with a
TPU-first layout:

- **NHWC** internally (TPU/XLA preferred); the reference runs NCHW
  (model.py:35 ``data_format='channels_first'``).  The external contract is
  preserved by :func:`apply_nchw`, which accepts/returns the reference's
  tensor layout.
- **bfloat16 compute / float32 params+stats** by default (MXU-friendly);
  pass ``dtype=jnp.float32`` for bit-accurate parity testing.
- Static shapes under ``jit``: H and W must be multiples of
  ``SIZE_FACTOR=16`` (reference model.py:25, imagereader.py:136-139).

Parity-critical quirks reproduced exactly (see SURVEY.md §2.2):

- every conv block is Conv(3x3, same) -> **ReLU -> BatchNorm** — i.e. the
  non-standard activation-before-norm ordering of model.py:28-37;
- the deconv block is ConvTranspose(2x2, stride 2, same, linear) -> BN
  (model.py:39-48);
- Dropout(0.5) after the 4th encoder block and the bottleneck
  (model.py:105, 112);
- the 1x1 classification head also goes through the conv block, so the
  "logits" receive ReLU **and** BatchNorm before softmax (model.py:136);
- BatchNorm uses the Keras defaults momentum=0.99, epsilon=1e-3;
- kernels init with glorot_uniform / zero bias (Keras Conv2D defaults).

**Intentional divergence — BatchNorm is sync-BN under data parallelism.**
The reference's MirroredStrategy replicates the graph per GPU, so each
replica computes BN batch statistics over its *local* shard only
(train.py:57 + model.py:36: plain Keras BatchNormalization, not
SyncBatchNormalization). tpuseg shards the batch with GSPMD, so every
``nn.BatchNorm`` reduces over the *global* batch — cross-replica (sync)
batch norm. This is a deliberate commitment, not an accident:

- statistically it is strictly better (stats over N*B samples instead of
  B; at the reference's own per-GPU batch of 8, local stats are noisy);
- single-device runs are bit-identical between the two semantics, so all
  parity tests are unaffected;
- the collective cost is priced and negligible: each of the 23 BN layers
  all-reduces 2 per-channel f32 vectors in the forward (~55 KB/step total
  for the base-64 model — about 0.04% of the ~124 MB gradient all-reduce)
  plus the matching backward cotangent reductions (~107 KB/step overall).
  Measured numbers and the byte model live in BASELINE.md; the semantics
  and per-layer collective presence are pinned by
  tests/test_parallel.py::test_batchnorm_stats_are_global_batch and
  ::test_batchnorm_sync_collectives_in_compiled_step.

A per-replica-BN parity mode is deliberately not offered: it would require
shard_map-wrapping every BN to hide the batch axis from GSPMD, and the only
thing it would reproduce is the reference's noisier statistics.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

SIZE_FACTOR = 16  # ref model.py:25
RADIUS = 96  # ref model.py:26
BASELINE_FEATURE_DEPTH = 64  # ref model.py:20
KERNEL_SIZE = 3  # ref model.py:21
DECONV_KERNEL_SIZE = 2  # ref model.py:22
POOLING_STRIDE = 2  # ref model.py:23

# Keras layer defaults the reference inherits implicitly.
_BN_MOMENTUM = 0.99
_BN_EPSILON = 1e-3
_KERNEL_INIT = nn.initializers.glorot_uniform()


class ConvBlock(nn.Module):
    """Conv(kxk, same, stride 1) -> ReLU -> BatchNorm (ref model.py:28-37)."""

    features: int
    kernel: int = KERNEL_SIZE
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=1,
            padding="SAME",
            kernel_init=_KERNEL_INIT,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        x = nn.relu(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=_BN_MOMENTUM,
            epsilon=_BN_EPSILON,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bn",
        )(x)
        return x


class DeconvBlock(nn.Module):
    """ConvTranspose(2x2, stride 2, same, linear) -> BatchNorm (ref model.py:39-48).

    A 2x2/stride-2 transposed conv writes each output pixel from exactly one
    input pixel, so it is the same function family as a 1x1 conv to 4*features
    followed by depth-to-space — a pure MXU matmul instead of the transposed-
    conv lowering. ``impl='pixel_shuffle'`` selects that form (identical
    parameter count and expressiveness; different parameter layout).

    No bias in either impl: BatchNorm directly follows the linear deconv, so
    a per-channel constant shift cancels exactly (BN subtracts the batch
    mean) — the reference's Keras ConvTranspose bias is a dead parameter
    whose gradient is identically zero (verified numerically; it stays at
    its zero init forever, so dropping it is function- and
    checkpoint-value-preserving). Measured cost of keeping it: ~3 ms/step
    of pure zero-computing reduction passes at 512x512 batch 8.
    """

    features: int
    dtype: Any = jnp.bfloat16
    impl: str = "conv_transpose"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        if self.impl not in ("conv_transpose", "pixel_shuffle"):
            # a typo used to fall into the conv_transpose else-branch
            # silently, building the wrong variant (and a checkpoint whose
            # kernel shape fails to load under the intended impl later)
            raise ValueError(
                f"deconv impl must be 'conv_transpose' or 'pixel_shuffle', "
                f"got {self.impl!r}")
        if self.impl == "pixel_shuffle":
            b, h, w, _ = x.shape
            x = nn.Conv(
                self.features * POOLING_STRIDE * POOLING_STRIDE,
                (1, 1),
                use_bias=False,
                kernel_init=_KERNEL_INIT,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="deconv",
            )(x)
            s = POOLING_STRIDE
            x = x.reshape(b, h, w, s, s, self.features)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * s, w * s, self.features)
        else:
            x = nn.ConvTranspose(
                self.features,
                (DECONV_KERNEL_SIZE, DECONV_KERNEL_SIZE),
                strides=(POOLING_STRIDE, POOLING_STRIDE),
                padding="SAME",
                use_bias=False,
                kernel_init=_KERNEL_INIT,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="deconv",
            )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=_BN_MOMENTUM,
            epsilon=_BN_EPSILON,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bn",
        )(x)
        return x


def _pool(x: jax.Array) -> jax.Array:
    """MaxPool 2x2 stride 2 (ref model.py:50-53)."""
    return nn.max_pool(x, (POOLING_STRIDE, POOLING_STRIDE), strides=(POOLING_STRIDE, POOLING_STRIDE))


class UNet(nn.Module):
    """The reference U-Net graph (model.py:85-146), NHWC, 4 down / 4 up levels.

    ``__call__`` takes NHWC input and returns NHWC **logits** (pre-softmax);
    the reference emits softmax probabilities — use :meth:`probabilities`
    (or ``jax.nn.softmax`` on the logits) where the reference contract is
    needed.  Keeping logits as the primary output lets the loss use a fused
    ``log_softmax`` and lets inference argmax skip softmax entirely
    (argmax-equivariant), both TPU wins.
    """

    num_classes: int
    base_features: int = BASELINE_FEATURE_DEPTH
    dtype: Any = jnp.bfloat16
    deconv_impl: str = "conv_transpose"  # or "pixel_shuffle" (see DeconvBlock)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if x.ndim != 4:
            raise ValueError(f"UNet expects NHWC input, got shape {x.shape}")
        if x.shape[1] % SIZE_FACTOR or x.shape[2] % SIZE_FACTOR:
            # same contract the reference enforces at imagereader.py:136-139
            raise ValueError(
                f"Input H,W must be multiples of {SIZE_FACTOR} to allow integer "
                f"sized downscaled feature maps; got H={x.shape[1]}, W={x.shape[2]}"
            )
        dt = self.dtype
        x = x.astype(dt)
        f = self.base_features

        def conv_pair(x, feats, name):
            x = ConvBlock(feats, dtype=dt, name=f"{name}a")(x, train)
            x = ConvBlock(feats, dtype=dt, name=f"{name}b")(x, train)
            return x

        # Encoder (ref model.py:87-112)
        enc1 = conv_pair(x, f, "enc1")
        enc2 = conv_pair(_pool(enc1), 2 * f, "enc2")
        enc3 = conv_pair(_pool(enc2), 4 * f, "enc3")
        enc4 = conv_pair(_pool(enc3), 8 * f, "enc4")
        enc4 = nn.Dropout(0.5, deterministic=not train, name="drop4")(enc4)

        bott = conv_pair(_pool(enc4), 16 * f, "bottleneck")
        bott = nn.Dropout(0.5, deterministic=not train, name="drop5")(bott)

        # Decoder (ref model.py:114-134); concat order is (skip, up) on the
        # channel axis, matching model.py:117 `_concat(conv_4, deconv_4)`.
        def up(x, skip, feats, name):
            x = DeconvBlock(feats, dtype=dt, impl=self.deconv_impl, name=f"{name}up")(x, train)
            x = jnp.concatenate([skip, x], axis=-1)
            x = conv_pair(x, feats, name)
            return x

        dec4 = up(bott, enc4, 8 * f, "dec4")
        dec3 = up(dec4, enc3, 4 * f, "dec3")
        dec2 = up(dec3, enc2, 2 * f, "dec2")
        dec1 = up(dec2, enc1, f, "dec1")

        # 1x1 head through the full conv block (ReLU+BN included), ref model.py:136.
        logits = ConvBlock(self.num_classes, kernel=1, dtype=dt, name="head")(dec1, train)
        return logits.astype(jnp.float32)

    def probabilities(self, x: jax.Array, train: bool = False) -> jax.Array:
        """Reference-contract output: softmax over the class axis (model.py:142)."""
        return jax.nn.softmax(self.__call__(x, train=train), axis=-1)


def apply_nchw(model: UNet, variables, images_nchw: jax.Array, **kwargs) -> jax.Array:
    """Reference-layout entry point: NCHW in, NHWC softmax out (model.py:73, 139-142)."""
    x = jnp.transpose(images_nchw, (0, 2, 3, 1))
    logits = model.apply(variables, x, **kwargs)
    return jax.nn.softmax(logits, axis=-1)


def init_variables(
    model: UNet, rng: jax.Array, num_channels: int, spatial: Sequence[int] = (SIZE_FACTOR, SIZE_FACTOR)
):
    """Initialize params/batch_stats with a minimal dummy NHWC batch."""
    dummy = jnp.zeros((1, spatial[0], spatial[1], num_channels), jnp.float32)
    return model.init({"params": rng}, dummy, train=False)
