"""Numerical parity vs the reference's own runtime (TensorFlow/Keras).

Builds the reference architecture (SURVEY.md §2.2; UNet/model.py:85-146) in
Keras, loads the tpuseg Flax parameters into it, and compares per-pixel
softmax outputs in float32. This pins down every TF quirk the rebuild must
honor: ReLU-before-BN ordering, the BN'd 1x1 head, Keras BatchNorm epsilon,
concat order, and transposed-conv weight conventions.

Keras runs channels_last here (TF's CPU conv kernels don't implement NCHW);
layout doesn't change the math — the reference's channels_first is a GPU
performance choice (model.py:35).
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpuseg.models.unet import UNet, init_variables  # noqa: E402

FEATURES = [8, 16, 32, 64, 128]  # narrow model: fast, same structure


def build_keras_unet(num_classes: int, channels: int):
    """The reference graph, NHWC, parameterized like tpuseg's UNet."""
    L = tf.keras.layers
    inp = tf.keras.Input(shape=(None, None, channels))

    def conv_block(x, f, k=3):
        x = L.Conv2D(f, k, padding="same", activation="relu")(x)
        return L.BatchNormalization(axis=-1)(x)

    skips = []
    x = inp
    for f in FEATURES[:-1]:
        x = conv_block(conv_block(x, f), f)
        if f == FEATURES[-2]:
            x = L.Dropout(0.5)(x)
        skips.append(x)
        x = L.MaxPool2D(2)(x)
    x = conv_block(conv_block(x, FEATURES[-1]), FEATURES[-1])
    x = L.Dropout(0.5)(x)
    for f, skip in zip(reversed(FEATURES[:-1]), reversed(skips)):
        x = L.Conv2DTranspose(f, 2, strides=2, padding="same")(x)
        x = L.BatchNormalization(axis=-1)(x)
        x = L.Concatenate(axis=-1)([skip, x])
        x = conv_block(conv_block(x, f), f)
    x = conv_block(x, num_classes, k=1)
    out = L.Softmax(axis=-1)(x)
    return tf.keras.Model(inp, out)


def _block_names():
    """tpuseg block names in the graph order Keras builds them."""
    encoder = ["enc1", "enc2", "enc3", "enc4", "bottleneck"]
    names = []
    for b in encoder:
        names += [f"{b}a", f"{b}b"]
    for b in ["dec4", "dec3", "dec2", "dec1"]:
        names += [f"{b}up", f"{b}a", f"{b}b"]
    names.append("head")
    return names


def _load_flax_into_keras(kmodel, params, batch_stats):
    """Match conv/bn/deconv layers in build order to tpuseg blocks."""
    convs = [l for l in kmodel.layers if isinstance(l, tf.keras.layers.Conv2D)]
    deconvs = [l for l in kmodel.layers if isinstance(l, tf.keras.layers.Conv2DTranspose)]
    bns = [l for l in kmodel.layers if isinstance(l, tf.keras.layers.BatchNormalization)]
    ci = di = 0
    for i, name in enumerate(_block_names()):
        p = params[name]
        s = batch_stats[name]
        if name.endswith("up"):
            kern = np.asarray(p["deconv"]["kernel"])  # flax: (kh, kw, in, out)
            # tpuseg drops the deconv bias (BN cancels it; its gradient is
            # identically zero so reference checkpoints keep it at 0) — feed
            # Keras the zero vector it expects.
            bias = np.zeros(kern.shape[-1], np.float32)
            # keras Conv2DTranspose: (kh, kw, out, in) in the gradient-of-conv
            # convention — spatially 180°-rotated relative to flax's
            # fractionally-strided-conv kernel (verified empirically)
            deconvs[di].set_weights(
                [np.flip(kern.transpose(0, 1, 3, 2), axis=(0, 1)), bias])
            di += 1
        else:
            convs[ci].set_weights([np.asarray(p["conv"]["kernel"]),
                                   np.asarray(p["conv"]["bias"])])
            ci += 1
        bns[i].set_weights([
            np.asarray(p["bn"]["scale"]), np.asarray(p["bn"]["bias"]),
            np.asarray(s["bn"]["mean"]), np.asarray(s["bn"]["var"]),
        ])
    assert ci == len(convs) and di == len(deconvs)


def test_flax_matches_keras_reference():
    rng = np.random.default_rng(0)
    model = UNet(num_classes=3, base_features=FEATURES[0], dtype=jnp.float32)
    variables = init_variables(model, jax.random.PRNGKey(42), num_channels=2,
                               spatial=(32, 32))
    import flax

    variables = flax.core.unfreeze(variables)
    # randomize BN statistics/affines so normalization actually bites
    variables["batch_stats"] = jax.tree.map(
        lambda x: jnp.asarray(rng.uniform(0.5, 1.5, x.shape), jnp.float32),
        variables["batch_stats"])
    for block in variables["params"].values():
        if "bn" in block:
            block["bn"]["scale"] = jnp.asarray(
                rng.uniform(0.5, 1.5, block["bn"]["scale"].shape), jnp.float32)
            block["bn"]["bias"] = jnp.asarray(
                rng.uniform(-0.5, 0.5, block["bn"]["bias"].shape), jnp.float32)

    kmodel = build_keras_unet(3, 2)
    _load_flax_into_keras(kmodel, variables["params"], variables["batch_stats"])

    x = rng.normal(size=(1, 64, 64, 2)).astype(np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False,
                                  method=UNet.probabilities))
    theirs = kmodel(tf.constant(x), training=False).numpy()

    assert ours.shape == theirs.shape == (1, 64, 64, 3)
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-3)
