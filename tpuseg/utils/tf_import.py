"""Import a reference TensorFlow checkpoint into tpuseg.

The reference's deliverable artifacts are ``tf.train.Checkpoint(optimizer,
model)`` directories written on test-loss improvement (train.py:96,
181-184) and restored with ``expect_partial()`` for inference
(model.py:81-83). This module reads those checkpoints variable-by-variable
(no TF graph rebuild needed) and emits a tpuseg orbax checkpoint so a
reference-trained model can be served by ``tpuseg.cli.inference`` directly.

Weight conventions (proven by tests/test_tf_parity.py in the flax->keras
direction; inverted here):

- Conv2D kernel: (kh, kw, ci, co) in both Keras and flax — copied as-is;
- Conv2DTranspose kernel: Keras stores (kh, kw, co, ci) in the
  gradient-of-conv convention, spatially 180°-rotated relative to flax's
  fractionally-strided-conv kernel -> ``flip(k, (0,1)).transpose(0,1,3,2)``;
- Conv2DTranspose bias: dropped — its gradient is identically zero through
  the following BatchNorm, so reference training leaves it at the zero
  init (see models/unet.py DeconvBlock); asserted ~0 on import;
- BatchNorm gamma/beta -> bn.scale/bn.bias (params); moving_mean/
  moving_variance -> bn.mean/bn.var (batch_stats).

Checkpoint variable paths follow tf.train.Checkpoint's object graph. Two
schemas exist in the wild and both are supported:

- Keras 2 (the reference's TF 2.0-2.15 era):
  ``model/layer_with_weights-{K}/{attr}/.ATTRIBUTES/VARIABLE_VALUE``
- Keras 3 (TF >= 2.16):
  ``model/_operations/{K}/{attr}/.ATTRIBUTES/VARIABLE_VALUE`` (kernel is
  spelled ``_kernel``)

In both, K follows the reference's build order (model.py:85-146) — conv/BN
pairs through the encoder, deconv/BN + conv/BN pairs through the decoder,
then the 1x1 head block — so weighted layers are matched positionally.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

import numpy as np

_VAR_RE = re.compile(
    r"model/(?:layer_with_weights-|_operations/)(\d+)/(_?\w+)/\.ATTRIBUTES/VARIABLE_VALUE$")


def block_sequence() -> List[Tuple[str, str]]:
    """(block_name, kind) for every weighted conv/deconv layer, in the
    reference's Keras build order; each is followed by its BatchNorm."""
    seq: List[Tuple[str, str]] = []
    for b in ["enc1", "enc2", "enc3", "enc4", "bottleneck"]:
        seq += [(f"{b}a", "conv"), (f"{b}b", "conv")]
    for b in ["dec4", "dec3", "dec2", "dec1"]:
        seq += [(f"{b}up", "deconv"), (f"{b}a", "conv"), (f"{b}b", "conv")]
    seq.append(("head", "conv"))
    return seq


def _ckpt_sort_key(fp: str):
    """Numeric-suffix order for ``*.index`` files: lexicographic sort puts
    'ckpt-9' after 'ckpt-12' and would silently import the older checkpoint
    (review r3)."""
    m = re.search(r"(\d+)\.index$", fp)
    return (int(m.group(1)) if m else -1, fp)


def load_reference_checkpoint(ckpt_path: str) -> Tuple[Dict, Dict]:
    """Read a reference TF checkpoint into (params, batch_stats) pytrees
    matching tpuseg's UNet variable structure."""
    import tensorflow as tf

    if tf.io.gfile.isdir(ckpt_path):
        # .save() leaves a 'checkpoint' metadata file; the reference uses
        # .write() (train.py:183) which doesn't — fall back to the .index
        # prefix in that case
        latest = tf.train.latest_checkpoint(ckpt_path)
        if latest is None:
            import glob
            import os

            indexes = sorted(glob.glob(os.path.join(ckpt_path, "*.index")),
                             key=_ckpt_sort_key)
            if not indexes:
                raise IOError(f"no TF checkpoint found under {ckpt_path}")
            latest = indexes[-1][:-len(".index")]
        ckpt_path = latest
    reader = tf.train.load_checkpoint(ckpt_path)

    # group variables by weighted-layer index; normalize Keras 3's _kernel
    by_layer: Dict[int, Dict[str, str]] = {}
    for name, _ in tf.train.list_variables(ckpt_path):
        m = _VAR_RE.match(name)
        if m:
            by_layer.setdefault(int(m.group(1)), {})[m.group(2).lstrip("_")] = name
    ordered = [by_layer[i] for i in sorted(by_layer)
               if "kernel" in by_layer[i] or "gamma" in by_layer[i]]

    seq = block_sequence()
    if len(ordered) != 2 * len(seq):
        raise IOError(
            f"found {len(ordered)} weighted layers, expected {2 * len(seq)} — "
            "not a reference UNet checkpoint "
            "(tf.train.Checkpoint(optimizer, model), model.py:81-83)?")

    def get(layer: Dict[str, str], attr: str) -> np.ndarray:
        if attr not in layer:
            raise IOError(f"weighted layer missing '{attr}' (has {sorted(layer)}) — "
                          "not a reference UNet checkpoint?")
        return np.asarray(reader.get_tensor(layer[attr]))

    params: Dict = {}
    stats: Dict = {}
    layers = iter(ordered)
    for block, kind in seq:
        wl = next(layers)
        if kind == "conv":
            params[block] = {"conv": {"kernel": get(wl, "kernel"),
                                      "bias": get(wl, "bias")}}
        else:
            kern = get(wl, "kernel")  # keras: (kh, kw, out, in), rotated
            flax_kern = np.flip(kern, axis=(0, 1)).transpose(0, 1, 3, 2)
            if "bias" in wl:
                bias = get(wl, "bias")
                if np.abs(bias).max() > 1e-6:
                    raise ValueError(
                        f"{block} deconv bias is non-zero (max "
                        f"{np.abs(bias).max():.3e}) — expected identically "
                        "zero (its gradient vanishes through BatchNorm); "
                        "refusing a lossy import")
            params[block] = {"deconv": {"kernel": flax_kern}}
        bn = next(layers)
        params[block]["bn"] = {"scale": get(bn, "gamma"), "bias": get(bn, "beta")}
        stats[block] = {"bn": {"mean": get(bn, "moving_mean"),
                               "var": get(bn, "moving_variance")}}
    return params, stats


def import_reference_checkpoint(ckpt_path: str, output_dir: str,
                                learning_rate: float = 3e-4) -> dict:
    """Full import: read the TF checkpoint, validate against a freshly
    initialized tpuseg UNet of the inferred geometry, and write an orbax
    checkpoint usable by cli.inference / --resume_checkpoint. Returns the
    inferred geometry."""
    import jax
    import jax.numpy as jnp

    from tpuseg.models.unet import UNet
    from tpuseg.train.steps import create_train_state
    from tpuseg.utils.checkpoint import save_checkpoint

    params, stats = load_reference_checkpoint(ckpt_path)
    enc1a = params["enc1a"]["conv"]["kernel"]
    geometry = {
        "number_channels": int(enc1a.shape[2]),
        "base_features": int(enc1a.shape[3]),
        "number_classes": int(params["head"]["conv"]["kernel"].shape[3]),
    }

    model = UNet(num_classes=geometry["number_classes"],
                 base_features=geometry["base_features"])
    state = create_train_state(model, jax.random.PRNGKey(0),
                               geometry["number_channels"], learning_rate)

    # structural + shape validation against the template before overwriting
    def check(template, imported, what):
        ta = jax.tree.map(lambda x: tuple(x.shape), template)
        tb = jax.tree.map(lambda x: tuple(x.shape), imported)
        if ta != tb:
            raise ValueError(f"imported {what} tree does not match the UNet "
                             f"template:\n{ta}\nvs\n{tb}")

    as_jnp = lambda tree: jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), tree)
    imported_params = as_jnp(params)
    imported_stats = as_jnp(stats)
    check(state.params, imported_params, "params")
    check(state.batch_stats, imported_stats, "batch_stats")

    state = state.replace(params=imported_params, batch_stats=imported_stats)
    save_checkpoint(output_dir, state)
    return geometry
