"""Loss and metric ops, reproducing the reference's TF/Keras semantics.

Reference behavior (UNet/model.py:77, 204-228):

- ``CategoricalCrossentropy(from_logits=False, label_smoothing=s,
  reduction=NONE)`` applied to the softmax output vs one-hot labels gives a
  per-pixel loss ``[N, H, W]``;
- per-replica scaling: ``reduce_sum(axis=0) / global_batch_size`` then
  ``reduce_mean`` over H,W (model.py:213-215), summed across replicas
  (model.py:233). Summed over the full data-parallel batch this is exactly
  ``mean_{N,H,W}``, which is what we compute — one scalar, identical
  gradients, no cross-replica bookkeeping needed under SPMD.

TPU-first choice: the canonical path takes **logits** and uses a fused,
numerically-stable ``log_softmax`` (XLA fuses it into the preceding matmul's
epilogue). This also matches what the reference *actually executes*: its
loss runs inside ``@tf.function`` (model.py:203 graph mode), where Keras's
``backend.categorical_crossentropy`` detects the preceding Softmax op and
takes the logits fast path — exact ``log_softmax``, not the clipped form.
``softmax -> clip(1e-7) -> log`` (Keras *eager* backend semantics, which
the reference never uses for training) is kept as :func:`cce_from_probs`
for parity tests; the two agree to float32 round-off whenever no
probability hits the clip boundary.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_KERAS_EPSILON = 1e-7  # tf.keras.backend.epsilon()


def smooth_labels(labels: jax.Array, label_smoothing: float) -> jax.Array:
    """Keras label smoothing: y*(1-s) + s/num_classes (losses.py in Keras)."""
    if label_smoothing:
        num_classes = labels.shape[-1]
        labels = labels * (1.0 - label_smoothing) + label_smoothing / num_classes
    return labels


def cce_from_logits(logits: jax.Array, labels_onehot: jax.Array, label_smoothing: float = 0.0) -> jax.Array:
    """Per-pixel categorical cross-entropy [N,H,W] from raw logits."""
    labels = smooth_labels(labels_onehot.astype(jnp.float32), label_smoothing)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.sum(labels * logp, axis=-1)


def cce_from_probs(probs: jax.Array, labels_onehot: jax.Array, label_smoothing: float = 0.0) -> jax.Array:
    """Keras-exact per-pixel CCE from probabilities (renormalize, clip, log)."""
    labels = smooth_labels(labels_onehot.astype(jnp.float32), label_smoothing)
    p = probs.astype(jnp.float32)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    p = jnp.clip(p, _KERAS_EPSILON, 1.0 - _KERAS_EPSILON)
    return -jnp.sum(labels * jnp.log(p), axis=-1)


def reference_scalar_loss(per_pixel: jax.Array, global_batch_size: int) -> jax.Array:
    """model.py:213-215 scaling: sum over N / global_batch, then mean over H,W.

    When ``per_pixel`` covers the full global batch (SPMD), this equals the
    cross-replica-summed reference loss.
    """
    loss = jnp.sum(per_pixel, axis=0) / global_batch_size
    return jnp.mean(loss)


def categorical_accuracy(logits_or_probs: jax.Array, labels_onehot: jax.Array) -> jax.Array:
    """tf.keras.metrics.CategoricalAccuracy over all pixels (train.py:106-108).

    argmax is softmax-equivariant, so logits and probabilities give the same
    result — another reason the model emits logits.
    """
    pred = jnp.argmax(logits_or_probs, axis=-1)
    true = jnp.argmax(labels_onehot, axis=-1)
    return jnp.mean((pred == true).astype(jnp.float32))
