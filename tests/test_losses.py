"""Loss/metric parity tests vs the Keras semantics the reference relies on."""

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.ops.losses import (
    categorical_accuracy,
    cce_from_logits,
    cce_from_probs,
    reference_scalar_loss,
)


def _rand(shape, key, scale=1.0):
    return jax.random.normal(jax.random.PRNGKey(key), shape) * scale


def _onehot(key, n, h, w, c):
    labels = jax.random.randint(jax.random.PRNGKey(key), (n, h, w), 0, c)
    return jax.nn.one_hot(labels, c)


def test_logits_and_probs_paths_agree():
    logits = _rand((2, 8, 8, 3), 0, scale=2.0)
    labels = _onehot(1, 2, 8, 8, 3)
    a = cce_from_logits(logits, labels)
    b = cce_from_probs(jax.nn.softmax(logits, axis=-1), labels)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_numpy_reference_formula():
    """Cross-check against a direct numpy transcription of Keras CCE."""
    logits = np.asarray(_rand((1, 4, 4, 5), 2))
    labels = np.asarray(_onehot(3, 1, 4, 4, 5))
    p = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    p = np.clip(p / p.sum(-1, keepdims=True), 1e-7, 1 - 1e-7)
    expect = -(labels * np.log(p)).sum(-1)
    got = np.asarray(cce_from_logits(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_label_smoothing_matches_keras_formula():
    logits = _rand((1, 4, 4, 4), 4)
    labels = _onehot(5, 1, 4, 4, 4)
    s = 0.1
    smoothed = np.asarray(labels) * (1 - s) + s / 4
    logp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    expect = -(smoothed * logp).sum(-1)
    got = np.asarray(cce_from_logits(logits, labels, label_smoothing=s))
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_reference_scalar_loss_scaling():
    """sum over N / global_batch then mean over HW == reference model.py:211-215."""
    per_pixel = _rand((4, 8, 8), 6) ** 2
    got = reference_scalar_loss(per_pixel, 4)
    expect = np.asarray(per_pixel).sum(0).__truediv__(4).mean()
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-6)
    # with global batch == N it's just the mean
    np.testing.assert_allclose(np.asarray(got), np.asarray(per_pixel).mean(), rtol=1e-6)


def test_categorical_accuracy():
    logits = jnp.asarray(
        [[[[0.9, 0.1], [0.2, 0.8]],
          [[0.6, 0.4], [0.3, 0.7]]]]
    )  # predictions: 0,1 / 0,1
    labels = jnp.asarray(
        [[[[1, 0], [0, 1]],
          [[0, 1], [0, 1]]]], dtype=jnp.float32
    )  # truth: 0,1 / 1,1
    acc = categorical_accuracy(logits, labels)
    np.testing.assert_allclose(np.asarray(acc), 3 / 4)
