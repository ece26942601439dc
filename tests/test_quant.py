"""Int8 post-training quantization (infer/quant.py).

Three contracts: (1) the folded-fp graph walk is the Flax model (BN folding
+ topology parity), (2) the int8 path preserves segmentation outputs on a
trained model to high agreement, (3) calibration/quantization round-trips
shapes and scales sanely.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuseg.infer.quant import (
    CONV_BLOCKS,
    DECONV_BLOCKS,
    calibrate,
    fold_variables,
    make_quantized_logits_fn,
    make_quantized_predict_fn,
    quantize_params,
    quantized_predict_from_checkpoint,
)
from tpuseg.models.unet import UNet, init_variables

ALL_BLOCKS = CONV_BLOCKS + DECONV_BLOCKS


def _model_and_vars(impl="conv_transpose", feats=4):
    model = UNet(num_classes=2, base_features=feats, dtype=jnp.float32,
                 deconv_impl=impl)
    variables = init_variables(model, jax.random.PRNGKey(0), num_channels=1)
    # random-ish batch stats so BN folding is non-trivial (init is mean=0/var=1)
    def jitter(path, x):
        name = "/".join(str(p.key) for p in path)
        rng = np.random.default_rng(abs(hash(name)) % 2**32)
        if name.endswith("mean"):
            return jnp.asarray(rng.normal(0, 0.3, x.shape), x.dtype)
        return jnp.asarray(rng.uniform(0.5, 2.0, x.shape), x.dtype)

    stats = jax.tree_util.tree_map_with_path(jitter, variables["batch_stats"])
    return model, {"params": variables["params"], "batch_stats": stats}


@pytest.mark.parametrize("impl", ["conv_transpose", "pixel_shuffle"])
def test_folded_fp_walk_matches_model_apply(impl):
    """BN fold + _unet_walk == model.apply(train=False) in f32 (both deconv
    impls): proves the quantized engine mirrors the reference graph
    (model.py:85-146) before any quantization enters."""
    model, variables = _model_and_vars(impl)
    x = jnp.asarray(np.random.default_rng(1).normal(0, 1, (2, 48, 32, 1)),
                    jnp.float32)
    want = model.apply(variables, x, train=False)

    folded = fold_variables(variables)
    qp = quantize_params(folded, {}, fp_blocks=ALL_BLOCKS)  # no ranges needed
    got = make_quantized_logits_fn(qp, deconv_impl=impl, dtype=jnp.float32)(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_int8_preserves_trained_masks():
    """Train a tiny model on a separable synthetic task, then int8-quantize:
    masks must agree with the fp predictor nearly everywhere and recover the
    true labels equally well."""
    from tpuseg.infer.tiled import make_predict_fn
    from tpuseg.train.steps import create_train_state, make_jitted_steps

    model = UNet(num_classes=2, base_features=4, dtype=jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), num_channels=1,
                               learning_rate=3e-3)
    tstep, _ = make_jitted_steps(model)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(0, 1, (4, 64, 64, 1)), jnp.float32)
    lbl = jax.nn.one_hot((img[..., 0] > 0).astype(jnp.int32), 2)
    for _ in range(150):
        state, metrics = tstep(state, img, lbl)
    assert float(metrics["accuracy"]) > 0.9  # the task trained

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    test = jnp.asarray(rng.normal(0, 1, (2, 64, 64, 1)), jnp.float32)
    fp_mask = np.asarray(make_predict_fn(model, variables)(test))

    calib = [np.asarray(img[i]) for i in range(2)]
    qpredict = quantized_predict_from_checkpoint(model, variables, calib)
    q_mask = np.asarray(qpredict(test))

    assert q_mask.shape == fp_mask.shape and q_mask.dtype == np.int32
    agreement = (q_mask == fp_mask).mean()
    assert agreement > 0.97, f"int8/fp mask agreement {agreement:.4f}"
    # quantization must not degrade accuracy vs the fp predictor (the toy
    # model's absolute generalization is irrelevant here)
    truth = np.asarray(test[..., 0] > 0, np.int32)
    assert (q_mask == truth).mean() > (fp_mask == truth).mean() - 0.02


def test_quantize_params_structure():
    """Weight scales are per-output-channel max/127; fp_blocks keep fp
    weights; activation scales come from the calibration ranges."""
    _, variables = _model_and_vars()
    folded = fold_variables(variables)
    ranges = calibrate(folded, [np.random.default_rng(2).normal(0, 1, (48, 48))])
    assert set(ranges) == set(ALL_BLOCKS)
    assert all(v > 0 for v in ranges.values())

    qp = quantize_params(folded, ranges, fp_blocks=("enc1a",))
    assert "w" in qp["enc1a"] and "wq" not in qp["enc1a"]
    blk = qp["enc2a"]
    assert blk["wq"].dtype == np.int8
    w = folded["enc2a"]["w"]
    assert blk["wscale"].shape == (w.shape[-1],)
    np.testing.assert_allclose(
        blk["wscale"], np.abs(w.reshape(-1, w.shape[-1])).max(axis=0) / 127.0)
    # max-magnitude weight per channel quantizes to +-127 exactly
    assert np.all(np.abs(blk["wq"]).max(axis=(0, 1, 2)) == 127)
    assert blk["in_scale"] == np.float32(ranges["enc2a"] / 127.0)


def test_quantized_predict_slots_into_tiled_engine():
    """The int8 predict_fn runs the existing halo-tiled engine unchanged and
    agrees with the fp engine's tiled mask (both produce the same labels on
    a trained-free random model within near-tie noise)."""
    from tpuseg.infer.tiled import inference_tiled, make_predict_fn

    model, variables = _model_and_vars()
    img = np.random.default_rng(3).normal(0, 1, (200, 170)).astype(np.float32)
    fp_fn = make_predict_fn(model, variables)
    folded = fold_variables(variables)
    qp = quantize_params(folded, calibrate(folded, [img]))
    q_fn = make_quantized_predict_fn(qp)

    fp_mask = inference_tiled(img, fp_fn, tile_size=96, radius=16, batch_size=2)
    q_mask = inference_tiled(img, q_fn, tile_size=96, radius=16, batch_size=2)
    assert q_mask.shape == fp_mask.shape == (200, 170)
    assert (q_mask == fp_mask).mean() > 0.9  # random model: near-tie flips only
