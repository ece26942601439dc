"""Int8 post-training quantization (infer/quant.py).

Contracts: (1) the BN-folded fp graph walk IS the Flax model, (2) the
int8-resident path preserves segmentation outputs on a trained model to
high agreement, (3) weight quantization folds per-channel input scales
correctly, (4) the quantized predict_fn slots into the tiled engine.
"""

import zlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuseg.infer.quant import (
    CONV_BLOCKS,
    DECONV_BLOCKS,
    INPUT_TAP,
    calibrate,
    fold_variables,
    make_folded_logits_fn,
    make_quantized_logits_fn,
    make_quantized_predict_fn,
    quantize_weight,
    quantized_predict_from_checkpoint,
)
from tpuseg.models.unet import UNet, init_variables

ALL_BLOCKS = CONV_BLOCKS + DECONV_BLOCKS


def _model_and_vars(impl="conv_transpose", feats=4):
    model = UNet(num_classes=2, base_features=feats, dtype=jnp.float32,
                 deconv_impl=impl)
    variables = init_variables(model, jax.random.PRNGKey(0), num_channels=1)
    # random-ish batch stats so BN folding is non-trivial (init is mean=0/var=1).
    # crc32, NOT hash(): str hashing is salted per-process (PYTHONHASHSEED),
    # which made the 0.15 quant-error threshold flake run-to-run.
    def jitter(path, x):
        name = "/".join(str(p.key) for p in path)
        rng = np.random.default_rng(zlib.crc32(name.encode()))
        if name.endswith("mean"):
            return jnp.asarray(rng.normal(0, 0.3, x.shape), x.dtype)
        return jnp.asarray(rng.uniform(0.5, 2.0, x.shape), x.dtype)

    stats = jax.tree_util.tree_map_with_path(jitter, variables["batch_stats"])
    return model, {"params": variables["params"], "batch_stats": stats}


@pytest.mark.parametrize("impl", ["conv_transpose", "pixel_shuffle"])
def test_folded_fp_walk_matches_model_apply(impl):
    """BN fold + _unet_walk == model.apply(train=False) in f32 (both deconv
    impls): proves the engine mirrors the reference graph (model.py:85-146)
    before any quantization enters."""
    model, variables = _model_and_vars(impl)
    x = jnp.asarray(np.random.default_rng(1).normal(0, 1, (2, 48, 32, 1)),
                    jnp.float32)
    want = model.apply(variables, x, train=False)
    got = make_folded_logits_fn(fold_variables(variables), deconv_impl=impl)(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("impl", ["conv_transpose", "pixel_shuffle"])
def test_int8_logits_track_fp_logits(impl):
    """The int8-resident forward tracks the fp logits closely on a random
    model (both deconv impls, incl. the dequant-before-shuffle path)."""
    model, variables = _model_and_vars(impl)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (2, 48, 32, 1)), jnp.float32)
    folded = fold_variables(variables)
    want = np.asarray(make_folded_logits_fn(folded, deconv_impl=impl)(x))
    ranges = calibrate(folded, [rng.normal(0, 1, (48, 32))], deconv_impl=impl,
                       percentile=100.0)
    got = np.asarray(make_quantized_logits_fn(folded, ranges,
                                              deconv_impl=impl)(x))
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 0.15
    assert np.corrcoef(got.ravel(), want.ravel())[0, 1] > 0.99


def test_int8_preserves_trained_masks():
    """Train a tiny model on a separable synthetic task, then int8-quantize:
    masks must agree with the fp predictor nearly everywhere and not lose
    accuracy against the true labels."""
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


def test_quantize_weight_folds_input_scales():
    """conv(x_q, wq) * wscale reconstructs conv(x, w) when x = x_q * sx —
    the identity that makes mixed-scale skip concatenation free."""
    rng = np.random.default_rng(0)
    w = rng.normal(0, 1, (3, 3, 6, 8)).astype(np.float32)
    sx = rng.uniform(0.01, 0.2, 6).astype(np.float32)
    wq, wscale = quantize_weight(w, sx)
    assert wq.dtype == np.int8 and wscale.shape == (8,)
    # max-magnitude folded weight per output channel uses the full int8 range
    assert np.all(np.abs(wq).max(axis=(0, 1, 2)) == 127)
    xq = rng.integers(-127, 128, (1, 16, 16, 6)).astype(np.float32)
    x = xq * sx

    def conv(a, k):
        return jax.lax.conv_general_dilated(
            jnp.asarray(a), jnp.asarray(k), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    want = np.asarray(conv(x, w))
    got = np.asarray(conv(xq, wq.astype(np.float32))) * wscale
    err = np.abs(got - want).max() / np.abs(want).max()
    assert err < 0.02  # weight-rounding error only


def test_calibrate_returns_all_taps():
    _, variables = _model_and_vars()
    folded = fold_variables(variables)
    ranges = calibrate(folded, [np.random.default_rng(2).normal(0, 1, (48, 48))])
    assert set(ranges) == set(ALL_BLOCKS) | {INPUT_TAP}
    assert all(v > 0 for v in ranges.values())


def test_quantized_predict_slots_into_tiled_engine():
    """The int8 predict_fn runs the existing halo-tiled engine unchanged and
    agrees with the fp engine's tiled mask (random model: near-tie flips
    only)."""
    from tpuseg.infer.tiled import inference_tiled, make_predict_fn

    model, variables = _model_and_vars()
    img = np.random.default_rng(3).normal(0, 1, (200, 170)).astype(np.float32)
    fp_fn = make_predict_fn(model, variables)
    folded = fold_variables(variables)
    q_fn = make_quantized_predict_fn(folded, calibrate(folded, [img]))

    fp_mask = inference_tiled(img, fp_fn, tile_size=96, radius=16, batch_size=2)
    q_mask = inference_tiled(img, q_fn, tile_size=96, radius=16, batch_size=2)
    assert q_mask.shape == fp_mask.shape == (200, 170)
    assert (q_mask == fp_mask).mean() > 0.9  # random model: near-tie flips only


def test_fp_blocks_typo_fails_fast():
    """A misspelled fp_blocks entry must raise, not silently quantize the
    block it was meant to keep in fp (review r3)."""
    _, variables = _model_and_vars()
    folded = fold_variables(variables)
    ranges = calibrate(folded, [np.random.default_rng(4).normal(0, 1, (48, 48))])
    with pytest.raises(ValueError, match="enc1A"):
        make_quantized_predict_fn(folded, ranges, fp_blocks=("enc1A", "head"))


def test_calibrate_mixed_shapes_share_one_geometry():
    """Mismatched calibration images are cropped/padded to the first image's
    geometry (one trace/compile instead of one per shape — review r3); tiny
    images that reflect cannot pad still work via the edge fallback."""
    _, variables = _model_and_vars()
    folded = fold_variables(variables)
    rng = np.random.default_rng(5)
    images = [rng.normal(0, 1, (48, 48)),     # canonical
              rng.normal(0, 1, (80, 64)),     # larger: center-cropped
              rng.normal(0, 1, (20, 20))]     # smaller than pad width: edge
    ranges = calibrate(folded, images)
    assert set(ranges) == set(ALL_BLOCKS) | {INPUT_TAP}
    assert all(v > 0 for v in ranges.values())
    # equal-shape calibration is unchanged by the canonicalization path
    single = calibrate(folded, [images[0]])
    both = calibrate(folded, [images[0], images[0]])
    assert single == pytest.approx(both)


def test_block_weight_conv_equivalence():
    """d2s(conv(s2d(x), block(w))) == conv(x, w) with SAME padding, f32 —
    the structurally-zero taps keep borders exact (quant.py blocking
    section)."""
    from jax import lax

    from tpuseg.infer.quant import _block_weight, _d2s, _s2d

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (2, 12, 8, 6)), jnp.float32)
    w = rng.normal(0, 1, (3, 3, 6, 5)).astype(np.float32)
    want = lax.conv_general_dilated(
        x, jnp.asarray(w), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    wb = _block_weight(w, (6,))
    got = _d2s(lax.conv_general_dilated(
        _s2d(x), jnp.asarray(wb), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # concat-grouped input channels: same conv, input channels laid out as
    # two phase-major groups (the dec1a skip/up concat structure)
    xa, xb = x[..., :4], x[..., 4:]
    cat_blocked = jnp.concatenate([_s2d(xa), _s2d(xb)], axis=-1)
    wb2 = _block_weight(w, (4, 2))
    got2 = _d2s(lax.conv_general_dilated(
        cat_blocked, jnp.asarray(wb2), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_block_weight_deconv_equivalence():
    """d2s(conv1x1(x, block_deconv(w))) == conv_transpose(x, w, stride 2,
    SAME) — pins the lax phase mapping (w[1-dy, 1-dx]) numerically."""
    from jax import lax

    from tpuseg.infer.quant import _block_weight_deconv, _d2s

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(0, 1, (1, 5, 7, 6)), jnp.float32)
    w = rng.normal(0, 1, (2, 2, 6, 3)).astype(np.float32)
    want = lax.conv_transpose(x, jnp.asarray(w), (2, 2), "SAME",
                              dimension_numbers=("NHWC", "HWIO", "NHWC"))
    wb = _block_weight_deconv(w, "conv_transpose")
    got = _d2s(lax.conv_general_dilated(
        x, jnp.asarray(wb), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("impl", ["conv_transpose", "pixel_shuffle"])
def test_blocked_edges_fully_quantized_is_bit_identical(impl):
    """With every block quantized (fp_blocks=()), the blocked-edge engine is
    arithmetically identical to the dense int8 path: int8xint8->int32 convs
    are exact, the blocked weights quantize to the same codes (each original
    weight appears exactly once per blocked output channel and the scale
    vectors are uniform per phase), and the epilogues apply the same f32
    values — so the labels must match BITWISE."""
    model, variables = _model_and_vars(impl)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(0, 1, (2, 48, 32, 1)), jnp.float32)
    folded = fold_variables(variables)
    ranges = calibrate(folded, [rng.normal(0, 1, (48, 32))], deconv_impl=impl)
    dense = make_quantized_predict_fn(folded, ranges, fp_blocks=(),
                                      deconv_impl=impl, dtype=jnp.float32)
    blocked = make_quantized_predict_fn(folded, ranges, fp_blocks=(),
                                        deconv_impl=impl, dtype=jnp.float32,
                                        blocked_edges=True)
    np.testing.assert_array_equal(np.asarray(blocked(x)), np.asarray(dense(x)))


def test_blocked_edges_default_fp_blocks_track_dense():
    """With the shipped fp_blocks (enc1a/head run fp), blocked and dense
    differ only by f32 summation order inside the fp convs: logits stay
    close and labels agree almost everywhere."""
    model, variables = _model_and_vars()
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(0, 1, (2, 48, 32, 1)), jnp.float32)
    folded = fold_variables(variables)
    ranges = calibrate(folded, [rng.normal(0, 1, (48, 32))])
    dense_logits = np.asarray(make_quantized_logits_fn(
        folded, ranges, dtype=jnp.float32)(x))
    blocked_logits = np.asarray(make_quantized_logits_fn(
        folded, ranges, dtype=jnp.float32, blocked_edges=True)(x))
    np.testing.assert_allclose(blocked_logits, dense_logits,
                               rtol=1e-3, atol=1e-3)
    dense_m = np.asarray(make_quantized_predict_fn(
        folded, ranges, dtype=jnp.float32)(x))
    blocked_m = np.asarray(make_quantized_predict_fn(
        folded, ranges, dtype=jnp.float32, blocked_edges=True)(x))
    assert blocked_m.shape == dense_m.shape and blocked_m.dtype == np.int32
    assert (blocked_m == dense_m).mean() > 0.999


@pytest.mark.parametrize("impl", ["pallas", "tdot"])
def test_head_kernel_matches_xla_blocked_head(monkeypatch, impl):
    """Both head+argmax implementations (infer/head_kernel.py; Pallas in
    interpret mode on CPU, tdot everywhere) agree with the XLA blocked
    head: bit-identical labels for the quantized head (int8 x int8
    accumulates exactly in int32), argmax-equal up to genuine f32
    near-ties for the shipped fp head."""
    from tpuseg.infer import head_kernel

    model, variables = _model_and_vars()
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(0, 1, (2, 48, 32, 1)), jnp.float32)
    folded = fold_variables(variables)
    ranges = calibrate(folded, [rng.normal(0, 1, (48, 32))])

    def masks(fp_blocks):
        xla = make_quantized_predict_fn(folded, ranges, fp_blocks=fp_blocks,
                                        dtype=jnp.float32,
                                        blocked_edges=True)(x)
        monkeypatch.setattr(head_kernel, "_HEAD_MODE", impl)
        try:
            pk = make_quantized_predict_fn(folded, ranges,
                                           fp_blocks=fp_blocks,
                                           dtype=jnp.float32,
                                           blocked_edges=True)(x)
        finally:
            monkeypatch.setattr(head_kernel, "_HEAD_MODE", "auto")
        return np.asarray(xla), np.asarray(pk)

    xla_q, pk_q = masks(())  # quantized head: exact accumulation
    assert pk_q.shape == (2, 48, 32) and pk_q.dtype == np.int32
    np.testing.assert_array_equal(pk_q, xla_q)

    xla_fp, pk_fp = masks(("enc1a", "head"))  # shipped default: fp head
    assert pk_fp.shape == xla_fp.shape
    assert (pk_fp == xla_fp).mean() > 0.999


@pytest.mark.parametrize("impl", ["pallas", "tdot"])
def test_head_kernel_class_counts_vs_numpy(monkeypatch, impl):
    """Kernel-level contract for ncls in {3, 5} (odd sublane counts, argmax
    loop depth > 1): labels equal a pure-numpy evaluation of the blocked
    head + first-max argmax + phase reassembly."""
    from tpuseg.infer import head_kernel

    monkeypatch.setattr(head_kernel, "_HEAD_MODE", impl)
    rng = np.random.default_rng(11)
    for ncls in (3, 5):
        b, h, w, c4 = 2, 6, 10, 16
        x = jnp.asarray(rng.integers(-127, 128, (b, h, w, c4)), jnp.int8)
        sv = rng.uniform(0.01, 0.1, (c4,)).astype(np.float32)
        wt = rng.normal(0, 0.3, (4 * ncls, c4)).astype(np.float32)
        epi = rng.normal(0, 1, (4, 4 * ncls)).astype(np.float32)

        got = np.asarray(head_kernel.blocked_head_argmax(
            x, sv, jnp.asarray(wt), epi, ncls, fp=True))

        xf = np.asarray(x, np.float32) * sv  # dequant
        y = xf @ wt.T  # [b, h, w, 4*ncls]
        y = np.maximum(y + epi[0], 0.0) * epi[1] + epi[2]
        lbl = np.argmax(y.reshape(b, h, w, 4, ncls), axis=-1)  # [b,h,w,4]
        dense = lbl.reshape(b, h, w, 2, 2).transpose(0, 1, 3, 2, 4)
        dense = dense.reshape(b, 2 * h, 2 * w).astype(np.int32)

        assert got.shape == (b, 2 * h, 2 * w)
        np.testing.assert_array_equal(got, dense)


def test_act_ranges_roundtrip(tmp_path):
    """save_act_ranges -> load_act_ranges is the identity on the scale dict
    (VERDICT r4 item 9: persisted calibration for fleets / repeat runs /
    scale-drift audits)."""
    from tpuseg.infer.quant import load_act_ranges, save_act_ranges

    _, variables = _model_and_vars()
    folded = fold_variables(variables)
    ranges = calibrate(folded, [np.random.default_rng(7).normal(0, 1, (48, 48))])
    p = str(tmp_path / "cal.json")
    save_act_ranges(p, ranges, percentile=99.9)
    assert load_act_ranges(p) == ranges

    # and the loaded scales build a predict_fn bit-identical to the original
    x = np.random.default_rng(8).normal(0, 1, (1, 48, 48, 1)).astype(np.float32)
    a = make_quantized_predict_fn(folded, ranges)(jnp.asarray(x))
    b = make_quantized_predict_fn(folded, load_act_ranges(p))(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_act_ranges_load_rejects_bad_files(tmp_path):
    """A non-calibration JSON or a stale file from a different topology
    fails loudly at load, not as a KeyError inside the traced walk."""
    import json

    from tpuseg.infer.quant import load_act_ranges, save_act_ranges

    p = str(tmp_path / "notcal.json")
    with open(p, "w") as f:
        json.dump({"hello": 1}, f)
    with pytest.raises(ValueError, match="not a tpuseg int8 calibration"):
        load_act_ranges(p)

    ranges = {k: 1.0 for k in ALL_BLOCKS + (INPUT_TAP,)}
    del ranges["dec2a"]
    ranges["not_a_block"] = 2.0
    p2 = str(tmp_path / "wrongkeys.json")
    save_act_ranges(p2, ranges)
    with pytest.raises(ValueError, match="does not match the U-Net block set"):
        load_act_ranges(p2)


def test_head_mode_env_reread_and_forced_pallas_warns(monkeypatch, capsys):
    """TPUSEG_HEAD is re-read per call (setting it after tpuseg imports
    works), and forcing pallas past the validated class cap warns instead
    of silently bypassing it (ADVICE r4)."""
    from tpuseg.infer import head_kernel

    monkeypatch.setenv("TPUSEG_HEAD", "xla")
    assert not head_kernel.head_kernel_eligible(2)
    monkeypatch.setenv("TPUSEG_HEAD", "tdot")
    assert head_kernel.head_kernel_eligible(2)
    capsys.readouterr()
    monkeypatch.setenv("TPUSEG_HEAD", "pallas")
    assert head_kernel.head_kernel_eligible(
        head_kernel._MAX_KERNEL_CLASSES + 1)
    assert "unvalidated" in capsys.readouterr().out
    # within the envelope: forced pallas stays silent
    assert head_kernel.head_kernel_eligible(2)
    assert capsys.readouterr().out == ""


def test_act_ranges_load_warns_on_percentile_mismatch(tmp_path, capsys):
    """--calibration_in silently supersedes --calibration_percentile; the
    load warns when the file's recorded percentile differs from the
    configured one, and stays quiet when they agree (review r5)."""
    from tpuseg.infer.quant import INPUT_TAP, load_act_ranges, save_act_ranges

    ranges = {k: 1.0 for k in ALL_BLOCKS + (INPUT_TAP,)}
    p = str(tmp_path / "cal.json")
    save_act_ranges(p, ranges, percentile=99.9)

    capsys.readouterr()
    assert load_act_ranges(p, expect_percentile=100.0) == ranges
    assert "calibrated at percentile 99.9" in capsys.readouterr().out

    assert load_act_ranges(p, expect_percentile=99.9) == ranges
    assert "calibrated at percentile" not in capsys.readouterr().out
    # no expectation passed -> no warning either
    assert load_act_ranges(p) == ranges
    assert "calibrated at percentile" not in capsys.readouterr().out
