"""AsyncCheckpointWriter: the saved snapshot must be immune to the training
loop donating the state's buffers immediately after the save is requested."""

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.models.unet import UNet
from tpuseg.train.steps import create_train_state, make_jitted_steps
from tpuseg.utils.checkpoint import AsyncCheckpointWriter, restore_train_state


def test_async_save_is_donation_safe(tmp_path):
    model = UNet(num_classes=2, base_features=2, dtype=jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), 1, 1e-2)
    tstep, _ = make_jitted_steps(model)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 1))
    lbl = jax.nn.one_hot((img[..., 0] > 0).astype(jnp.int32), 2)

    state, _ = tstep(state, img, lbl)
    saved_step = int(state.step)
    saved_leaf = np.asarray(jax.tree.leaves(state.params)[0]).copy()

    writer = AsyncCheckpointWriter()
    path = str(tmp_path / "ck")
    writer.save(path, state)
    # immediately trample the donated buffers with more steps
    for _ in range(5):
        state, _ = tstep(state, img, lbl)
    writer.wait()

    template = create_train_state(model, jax.random.PRNGKey(9), 1, 1e-2)
    restored = restore_train_state(path, template)
    assert int(restored.step) == saved_step
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(restored.params)[0]), saved_leaf)
    # and the live state genuinely moved on
    assert int(state.step) == saved_step + 5
