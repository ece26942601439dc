"""Export a tpuseg checkpoint as a reference TensorFlow checkpoint.

The inverse of :mod:`tpuseg.utils.tf_import`: builds the reference Keras
graph (UNet/model.py:85-146), loads the tpuseg Flax weights into it with
the proven conventions (tests/test_tf_parity.py), and writes a
``tf.train.Checkpoint(optimizer, model)`` with the reference's object
graph (train.py:96) — so a tpuseg-trained model drops into the
reference's ``inference.py`` (restored via model.py:81-83). Together with
the importer this makes migration a two-way street.

Schema caveat: ``tf.train.Checkpoint`` variable paths follow the
*installed* Keras' object graph — ``model/layer_with_weights-K/...``
under Keras 2 (TF <= 2.15) vs ``model/_operations/K/...`` under Keras 3
(TF >= 2.16) — and a restore only matches variables written under the
same major (``expect_partial()`` silently restores nothing otherwise).
Run this exporter under the same TF/Keras generation as the reference
deployment that will consume the checkpoint; the export prints which
schema it wrote (the importer accepts both).

Weight conventions (the exact inverse of tf_import.py):

- Conv2D kernel/bias: copied as-is ((kh, kw, ci, co) in both);
- Conv2DTranspose kernel: flax (kh, kw, in, out) ->
  ``flip(k.transpose(0, 1, 3, 2), (0, 1))`` (Keras' gradient-of-conv
  layout, spatially 180°-rotated); bias written as the zero vector the
  reference's training leaves it at (its gradient vanishes through BN);
- BatchNorm: scale/bias/mean/var -> gamma/beta/moving_mean/moving_variance.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from tpuseg.utils.tf_import import block_sequence


def build_reference_keras_unet(num_classes: int, channels: int,
                               base_features: int = 64):
    """The reference graph (model.py:85-146) in Keras, channels_last.

    Layout does not change the math — the reference's channels_first is a
    GPU performance choice (model.py:35); TF restores this checkpoint
    positionally by object graph, not by layout.
    """
    import tensorflow as tf

    L = tf.keras.layers
    features = [base_features * m for m in (1, 2, 4, 8, 16)]
    inp = tf.keras.Input(shape=(None, None, channels))

    def conv_block(x, f, k=3):
        x = L.Conv2D(f, k, padding="same", activation="relu")(x)  # model.py:28-37
        return L.BatchNormalization(axis=-1)(x)

    skips = []
    x = inp
    for f in features[:-1]:
        x = conv_block(conv_block(x, f), f)
        if f == features[-2]:
            x = L.Dropout(0.5)(x)  # model.py:105
        skips.append(x)
        x = L.MaxPool2D(2)(x)  # model.py:50-53
    x = conv_block(conv_block(x, features[-1]), features[-1])
    x = L.Dropout(0.5)(x)  # model.py:112
    for f, skip in zip(reversed(features[:-1]), reversed(skips)):
        x = L.Conv2DTranspose(f, 2, strides=2, padding="same")(x)  # model.py:39-48
        x = L.BatchNormalization(axis=-1)(x)
        x = L.Concatenate(axis=-1)([skip, x])  # model.py:55-58
        x = conv_block(conv_block(x, f), f)
    x = conv_block(x, num_classes, k=1)  # model.py:136 (BN'd 1x1 head)
    out = L.Softmax(axis=-1)(x)  # model.py:142
    return tf.keras.Model(inp, out)


def load_tpuseg_into_keras(kmodel, params: Dict, batch_stats: Dict) -> None:
    """Assign tpuseg Flax weights into the Keras reference model, matching
    weighted layers positionally in the reference's build order."""
    import tensorflow as tf

    # exclude transposes explicitly: under Keras 2 (the reference's era)
    # Conv2DTranspose subclasses Conv2D, so a bare isinstance(l, Conv2D)
    # would also collect the 4 deconv layers and shift every positional
    # assignment after dec4a (review r3); Keras 3 has no such subclassing
    convs = [l for l in kmodel.layers
             if isinstance(l, tf.keras.layers.Conv2D)
             and not isinstance(l, tf.keras.layers.Conv2DTranspose)]
    deconvs = [l for l in kmodel.layers
               if isinstance(l, tf.keras.layers.Conv2DTranspose)]
    bns = [l for l in kmodel.layers
           if isinstance(l, tf.keras.layers.BatchNormalization)]
    ci = di = 0
    for i, (block, kind) in enumerate(block_sequence()):
        p, s = params[block], batch_stats[block]
        if kind == "deconv":
            kern = np.asarray(p["deconv"]["kernel"], np.float32)
            deconvs[di].set_weights([
                np.flip(kern.transpose(0, 1, 3, 2), axis=(0, 1)),
                np.zeros(kern.shape[-1], np.float32),
            ])
            di += 1
        else:
            convs[ci].set_weights([np.asarray(p["conv"]["kernel"], np.float32),
                                   np.asarray(p["conv"]["bias"], np.float32)])
            ci += 1
        bns[i].set_weights([
            np.asarray(p["bn"]["scale"], np.float32),
            np.asarray(p["bn"]["bias"], np.float32),
            np.asarray(s["bn"]["mean"], np.float32),
            np.asarray(s["bn"]["var"], np.float32),
        ])
    assert ci == len(convs) and di == len(deconvs)


def export_reference_checkpoint(checkpoint_path: str, output_prefix: str,
                                number_classes: int, number_channels: int,
                                base_features: int = 64,
                                learning_rate: float = 3e-4) -> str:
    """tpuseg orbax checkpoint -> reference ``tf.train.Checkpoint`` written
    at ``output_prefix`` (use it as the reference's ``checkpoint_filepath``).
    Returns the written prefix."""
    import jax
    import tensorflow as tf

    from tpuseg.models.unet import UNet
    from tpuseg.train.steps import create_train_state
    from tpuseg.utils.checkpoint import restore_train_state

    model = UNet(num_classes=number_classes, base_features=base_features)
    template = create_train_state(model, jax.random.PRNGKey(0),
                                  number_channels, learning_rate)
    state = restore_train_state(checkpoint_path, template)

    kmodel = build_reference_keras_unet(number_classes, number_channels,
                                        base_features)
    load_tpuseg_into_keras(kmodel, jax.device_get(state.params),
                           jax.device_get(state.batch_stats))

    # the reference's exact object graph: train.py:96
    ckpt = tf.train.Checkpoint(
        optimizer=tf.keras.optimizers.Adam(learning_rate=learning_rate),
        model=kmodel)
    prefix = ckpt.write(output_prefix)

    keras_major = int(str(getattr(tf.keras, "__version__", "2")).split(".")[0])
    schema = ("model/_operations/K (Keras 3, restores in TF >= 2.16)"
              if keras_major >= 3 else
              "model/layer_with_weights-K (Keras 2, restores in TF <= 2.15)")
    print(f"Checkpoint schema: {schema} — a reference deployment on the "
          "other Keras major will silently restore nothing "
          "(expect_partial); re-export under its TF version if so.")
    return prefix
