"""tpuseg -> reference TF checkpoint exporter (inverse of tf_import).

Proves the migration loop closes: a tpuseg checkpoint exported with
tf_export and re-imported with tf_import reproduces the exact weights, and
the exported Keras model (the reference's own runtime) matches the tpuseg
model per-pixel.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpuseg.models.unet import UNet  # noqa: E402
from tpuseg.train.steps import create_train_state  # noqa: E402
from tpuseg.utils.checkpoint import restore_model_variables, save_checkpoint  # noqa: E402
from tpuseg.utils.tf_export import (build_reference_keras_unet,  # noqa: E402
                                    export_reference_checkpoint)
from tpuseg.utils.tf_import import import_reference_checkpoint  # noqa: E402

BASE = 8  # narrow model: fast, same structure


def _random_state(rng):
    model = UNet(num_classes=3, base_features=BASE, dtype=jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(13), num_channels=2,
                               learning_rate=3e-4)
    # randomize BN statistics/affines so normalization bites in comparisons
    state = state.replace(
        batch_stats=jax.tree.map(
            lambda x: jnp.asarray(rng.uniform(0.5, 1.5, x.shape), jnp.float32),
            state.batch_stats))
    return model, state


def test_export_import_roundtrip_is_exact(tmp_path):
    rng = np.random.default_rng(11)
    model, state = _random_state(rng)
    src = str(tmp_path / "tpuseg_ckpt")
    save_checkpoint(src, state)

    prefix = str(tmp_path / "tf" / "ckpt")
    export_reference_checkpoint(src, prefix, number_classes=3,
                                number_channels=2, base_features=BASE)

    back = str(tmp_path / "tpuseg_back")
    geometry = import_reference_checkpoint(prefix, back)
    assert geometry == {"number_channels": 2, "base_features": BASE,
                        "number_classes": 3}

    template = create_train_state(model, jax.random.PRNGKey(0), 2, 3e-4)
    variables = restore_model_variables(back, template)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        {"params": state.params, "batch_stats": state.batch_stats},
        {"params": variables["params"], "batch_stats": variables["batch_stats"]})


def test_exported_keras_model_matches_tpuseg(tmp_path):
    rng = np.random.default_rng(12)
    model, state = _random_state(rng)
    src = str(tmp_path / "tpuseg_ckpt")
    save_checkpoint(src, state)
    prefix = str(tmp_path / "tf" / "ckpt")
    export_reference_checkpoint(src, prefix, number_classes=3,
                                number_channels=2, base_features=BASE)

    # restore exactly the way the reference serves checkpoints (model.py:81-83)
    kmodel = build_reference_keras_unet(3, 2, BASE)
    ckpt = tf.train.Checkpoint(optimizer=tf.keras.optimizers.Adam(), model=kmodel)
    ckpt.restore(prefix).expect_partial()

    x = rng.normal(size=(1, 64, 64, 2)).astype(np.float32)
    ours = np.asarray(model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(x), train=False, method=UNet.probabilities))
    theirs = kmodel(tf.constant(x), training=False).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-3)
