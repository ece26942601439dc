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


def test_async_save_failure_surfaces(tmp_path, monkeypatch):
    """A failed background write must re-raise at wait() (or the next
    save()), not vanish into the thread (review r3): a swallowed error lets
    training finish 'successfully' with a stale or missing checkpoint."""
    import pytest

    from tpuseg.utils import checkpoint as ckpt_mod

    model = UNet(num_classes=2, base_features=2, dtype=jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), 1, 1e-2)

    def boom(path, tree):
        raise OSError("disk full")

    monkeypatch.setattr(ckpt_mod, "save_checkpoint", boom)
    writer = AsyncCheckpointWriter()
    writer.save(str(tmp_path / "ck"), state)
    with pytest.raises(RuntimeError, match="checkpoint write failed"):
        writer.wait()
    # the error does not re-raise twice
    writer.wait()


def test_multihost_save_routes_to_primary(tmp_path, monkeypatch):
    """With process_count > 1 only process 0 writes (concurrent orbax
    force-saves into one shared directory corrupt the checkpoint); the
    non-primary save is a no-op after participating in any gather
    (review r3)."""
    import os

    from tpuseg.utils import checkpoint as ckpt_mod

    model = UNet(num_classes=2, base_features=2, dtype=jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), 1, 1e-2)
    path = str(tmp_path / "ck")

    calls = []
    monkeypatch.setattr(AsyncCheckpointWriter, "_write_host_tree",
                        staticmethod(lambda p, tree: calls.append(p)))
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 1)

    writer = AsyncCheckpointWriter()
    writer.save(path, state)
    writer.wait()
    assert calls == [] and not os.path.exists(path)
    # the synchronous saver takes the same early-out
    ckpt_mod.save_checkpoint(path, state)
    assert not os.path.exists(path)

    monkeypatch.setattr(jax, "process_index", lambda: 0)
    writer.save(path, state)
    writer.wait()
    assert calls == [path]
