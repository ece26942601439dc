"""U-Net architecture tests: shapes, parameter structure, reference quirks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuseg.models.unet import UNet, apply_nchw, init_variables


@pytest.fixture(scope="module")
def small_model():
    model = UNet(num_classes=2, dtype=jnp.float32)
    variables = init_variables(model, jax.random.PRNGKey(0), num_channels=1, spatial=(32, 32))
    return model, variables


def test_output_shape_nhwc(small_model):
    model, variables = small_model
    x = jnp.zeros((2, 32, 48, 1))
    logits = model.apply(variables, x, train=False)
    assert logits.shape == (2, 32, 48, 2)
    assert logits.dtype == jnp.float32


def test_softmax_head_sums_to_one(small_model):
    model, variables = small_model
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 1))
    probs = model.apply(variables, x, train=False, method=UNet.probabilities)
    np.testing.assert_allclose(np.sum(np.asarray(probs), axis=-1), 1.0, atol=1e-5)


def test_nchw_reference_contract(small_model):
    """apply_nchw matches the reference's NCHW-in / NHWC-softmax-out contract."""
    model, variables = small_model
    x_nchw = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 32, 32))
    probs = apply_nchw(model, variables, x_nchw)
    assert probs.shape == (1, 32, 32, 2)
    np.testing.assert_allclose(np.sum(np.asarray(probs), axis=-1), 1.0, atol=1e-5)


def test_any_x16_shape_works(small_model):
    """Reference serves any H,W multiple of 16 (model.py:73); each shape is a
    separate XLA compilation, but all must be valid."""
    model, variables = small_model
    for h, w in [(16, 16), (64, 32)]:
        out = model.apply(variables, jnp.zeros((1, h, w, 1)), train=False)
        assert out.shape == (1, h, w, 2)


def test_channel_progression(small_model):
    """Encoder doubles features 64->1024 like model.py:88-111."""
    _, variables = small_model
    params = variables["params"]
    assert params["enc1a"]["conv"]["kernel"].shape[-1] == 64
    assert params["enc2a"]["conv"]["kernel"].shape[-1] == 128
    assert params["enc3a"]["conv"]["kernel"].shape[-1] == 256
    assert params["enc4a"]["conv"]["kernel"].shape[-1] == 512
    assert params["bottlenecka"]["conv"]["kernel"].shape[-1] == 1024
    assert params["dec1b"]["conv"]["kernel"].shape[-1] == 64
    # 1x1 head with BN — the reference quirk (model.py:136)
    assert params["head"]["conv"]["kernel"].shape == (1, 1, 64, 2)
    assert "bn" in params["head"]


def test_head_is_relu_then_bn(small_model):
    """The head's BN beta can push 'logits' negative even after ReLU —
    evidence the quirky ReLU->BN head ordering is present."""
    model, variables = small_model
    # With ReLU before BN (fresh BN: scale=1, bias=0, zero stats), outputs are
    # the normalized ReLU'd convs; just assert logits are not all >= 0 after
    # perturbing BN mean upward, which only matters if BN follows ReLU.
    import flax

    variables = flax.core.unfreeze(variables)
    variables["batch_stats"]["head"]["bn"]["mean"] = (
        variables["batch_stats"]["head"]["bn"]["mean"] + 5.0
    )
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 32, 32, 1))
    logits = model.apply(variables, x, train=False)
    assert np.asarray(logits).min() < 0.0


def test_dropout_active_in_train_mode(small_model):
    model, variables = small_model
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 32, 32, 1))
    out1, _ = model.apply(variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(5)},
                          mutable=["batch_stats"])
    out2, _ = model.apply(variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(6)},
                          mutable=["batch_stats"])
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_batch_stats_update_in_train(small_model):
    model, variables = small_model
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 32, 32, 1)) * 3 + 1
    _, updates = model.apply(variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(8)},
                             mutable=["batch_stats"])
    old = variables["batch_stats"]["enc1a"]["bn"]["mean"]
    new = updates["batch_stats"]["enc1a"]["bn"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))


def test_param_count_matches_reference_arch():
    """Independent recomputation of the parameter count of model.py:85-146."""
    model = UNet(num_classes=2, dtype=jnp.float32)
    variables = init_variables(model, jax.random.PRNGKey(0), num_channels=1)
    n_params = sum(np.prod(p.shape) for p in jax.tree.leaves(variables["params"]))

    def conv(cin, cout, k, bias=True):
        return k * k * cin * cout + (cout if bias else 0) + 2 * cout  # kernel (+bias) + bn scale/beta

    expect = 0
    cin = 1
    for f in [64, 128, 256, 512, 1024]:
        expect += conv(cin, f, 3) + conv(f, f, 3)
        cin = f
    for f in [512, 256, 128, 64]:
        # deconv + bn; no deconv bias — BN cancels it (see DeconvBlock)
        expect += conv(cin, f, 2, bias=False)
        expect += conv(2 * f, f, 3) + conv(f, f, 3)
        cin = f
    expect += conv(64, 2, 1)
    assert n_params == expect
