"""Train/eval step tests: loss decreases, warmup lr is recompile-free, BN flows."""

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.models.unet import UNet
from tpuseg.train.steps import create_train_state, make_jitted_steps


def _toy_batch(key, n=2, h=32, w=32, c=1, classes=2):
    kimg, klbl = jax.random.split(jax.random.PRNGKey(key))
    img = jax.random.normal(kimg, (n, h, w, c))
    # learnable signal: class = 1 where image > 0
    lbl = (img[..., 0] > 0).astype(jnp.int32)
    return img, jax.nn.one_hot(lbl, classes)


def test_train_step_decreases_loss():
    model = UNet(num_classes=2, base_features=4, dtype=jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), num_channels=1, learning_rate=1e-3)
    tstep, estep = make_jitted_steps(model)
    img, lbl = _toy_batch(1)
    first = None
    for _ in range(12):
        state, metrics = tstep(state, img, lbl)
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["loss"]) < first
    assert int(state.step) == 12


def test_lr_change_does_not_recompile():
    model = UNet(num_classes=2, base_features=4, dtype=jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), num_channels=1, learning_rate=3e-4)
    tstep, _ = make_jitted_steps(model)
    img, lbl = _toy_batch(2)
    state, _ = tstep(state, img, lbl)
    compiles_before = tstep._cache_size()
    state = state.replace(lr=jnp.asarray(3e-5, jnp.float32))  # warmup (train.py:129)
    state, _ = tstep(state, img, lbl)
    assert tstep._cache_size() == compiles_before


def test_eval_step_is_deterministic():
    model = UNet(num_classes=2, base_features=4, dtype=jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), num_channels=1, learning_rate=1e-3)
    _, estep = make_jitted_steps(model)
    img, lbl = _toy_batch(3)
    m1 = estep(state, img, lbl)
    m2 = estep(state, img, lbl)
    np.testing.assert_array_equal(np.asarray(m1["loss"]), np.asarray(m2["loss"]))


def test_adam_matches_keras_defaults():
    """Keras Adam eps is 1e-7 (model.py:79 uses defaults); optax default is 1e-8."""
    from tpuseg.train.steps import make_optimizer

    tx = make_optimizer()
    state = tx.init({"w": jnp.zeros((2,))})
    assert state.hyperparams["learning_rate"] == 0.0
