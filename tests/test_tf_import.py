"""Reference-checkpoint importer round trip (VERDICT r1 item 7).

Builds the reference architecture in Keras (the same builder the parity
test uses), saves it exactly the way the reference does —
``tf.train.Checkpoint(optimizer, model).write(...)`` (train.py:96) — then
imports it with tpuseg.utils.tf_import and checks per-pixel softmax parity
between the reference runtime and the tpuseg model with the imported
weights.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.test_tf_parity import FEATURES, build_keras_unet  # noqa: E402
from tpuseg.models.unet import UNet  # noqa: E402
from tpuseg.train.steps import create_train_state  # noqa: E402
from tpuseg.utils.tf_import import import_reference_checkpoint  # noqa: E402
from tpuseg.utils.checkpoint import restore_model_variables  # noqa: E402


def test_reference_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(7)
    kmodel = build_keras_unet(num_classes=3, channels=2)
    kmodel(tf.zeros((1, 32, 32, 2)))  # build variables

    # randomize BN affines/statistics so normalization bites in the compare
    for layer in kmodel.layers:
        if isinstance(layer, tf.keras.layers.BatchNormalization):
            g, b, m, v = layer.get_weights()
            layer.set_weights([
                rng.uniform(0.5, 1.5, g.shape).astype(np.float32),
                rng.uniform(-0.5, 0.5, b.shape).astype(np.float32),
                rng.uniform(-0.5, 0.5, m.shape).astype(np.float32),
                rng.uniform(0.5, 1.5, v.shape).astype(np.float32),
            ])

    # the reference save path: train.py:96, 181-184
    ckpt = tf.train.Checkpoint(optimizer=tf.keras.optimizers.Adam(), model=kmodel)
    tf_path = str(tmp_path / "checkpoint" / "ckpt")
    ckpt.write(tf_path)

    out = str(tmp_path / "tpuseg_ckpt")
    geometry = import_reference_checkpoint(tf_path, out)
    assert geometry == {"number_channels": 2, "base_features": FEATURES[0],
                        "number_classes": 3}

    model = UNet(num_classes=3, base_features=FEATURES[0], dtype=jnp.float32)
    template = create_train_state(model, jax.random.PRNGKey(0), 2, 3e-4)
    variables = restore_model_variables(out, template)

    x = rng.normal(size=(1, 64, 64, 2)).astype(np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False,
                                  method=UNet.probabilities))
    theirs = kmodel(tf.constant(x), training=False).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-3)


def test_import_rejects_non_reference_checkpoint(tmp_path):
    ckpt = tf.train.Checkpoint(thing=tf.Variable([1.0]))
    path = str(tmp_path / "bogus")
    ckpt.write(path)
    with pytest.raises(IOError, match="not a reference UNet checkpoint"):
        import_reference_checkpoint(path, str(tmp_path / "out"))


def test_import_accepts_checkpoint_directory(tmp_path):
    kmodel = build_keras_unet(num_classes=2, channels=1)
    kmodel(tf.zeros((1, 32, 32, 1)))
    ckpt = tf.train.Checkpoint(optimizer=tf.keras.optimizers.Adam(), model=kmodel)
    ckpt_dir = tmp_path / "checkpoint"
    ckpt.write(str(ckpt_dir / "ckpt"))
    geometry = import_reference_checkpoint(str(ckpt_dir), str(tmp_path / "out"))
    assert geometry["number_classes"] == 2
