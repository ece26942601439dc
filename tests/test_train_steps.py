"""Train/eval step tests: loss decreases, warmup lr is recompile-free, BN flows."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def test_adam_update_matches_live_keras():
    """keras_adam reproduces tf.keras Adam's update rule step for step —
    epsilon applied to the UNCORRECTED sqrt(v_t) (optimizer_v2 semantics;
    optax.adam corrects v first, ~31.6x smaller effective eps at step 1 —
    review r3). Driven against a live tf.keras optimizer."""
    tf = pytest.importorskip("tensorflow")

    from tpuseg.train.steps import keras_adam

    lr = 3e-4
    w0 = np.array([0.5, -1.25, 2.0], np.float32)
    grads = [np.array(g, np.float32) for g in
             ([1e-4, -2.0, 0.3], [5e-5, 1.0, -0.3], [1e-3, 0.5, 0.0])]

    var = tf.Variable(w0)
    ktx = tf.keras.optimizers.Adam(learning_rate=lr, epsilon=1e-7)
    for g in grads:
        ktx.apply_gradients([(tf.constant(g), var)])
    want = var.numpy()

    tx = keras_adam(lr)
    params = {"w": jnp.asarray(w0)}
    opt_state = tx.init(params)
    for g in grads:
        updates, opt_state = tx.update({"w": jnp.asarray(g)}, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
    got = np.asarray(params["w"])

    np.testing.assert_allclose(got, want, rtol=0, atol=2e-6)


def test_train_step_does_not_mutate_input_state():
    """Eager (un-jitted) train_step must not write into the caller's
    opt_state.hyperparams (review r3)."""
    from tpuseg.train.steps import make_optimizer, train_step

    model = UNet(num_classes=2, base_features=4, dtype=jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), 1, learning_rate=0.5)
    tx = make_optimizer()
    before = float(state.opt_state.hyperparams["learning_rate"])
    img = jnp.zeros((2, 16, 16, 1), jnp.float32)
    lbl = jax.nn.one_hot(jnp.zeros((2, 16, 16), jnp.int32), 2)
    new_state, _ = train_step(model, tx, state, img, lbl)
    assert float(state.opt_state.hyperparams["learning_rate"]) == before
    assert float(new_state.opt_state.hyperparams["learning_rate"]) == 0.5


def test_deconv_impl_typo_fails_fast():
    """An unknown deconv_impl used to silently build conv_transpose
    (review r3)."""
    model = UNet(num_classes=2, base_features=4, deconv_impl="pixel-shuffle")
    with pytest.raises(ValueError, match="pixel_shuffle"):
        model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 16, 16, 1), jnp.float32), train=False)
