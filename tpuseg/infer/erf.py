"""Empirical receptive field (ERF) radius probe.

Re-implements ``UNet.estimate_radius`` (model.py:165-202): feed Gaussian
noise, build a Dirac-at-center MAE loss against the model's own (frozen)
softmax output, take the gradient **with respect to the input image**, and
measure the spatial support of that gradient.  The measured radius sets the
tiled-inference halo (inference.py:54-58).

Differences from the reference, both behavior-preserving:
- the reference runs the forward 10x and uses only the last tape
  (model.py:175-184); inference-mode forwards are deterministic, so we run
  the one that matters;
- ``jax.grad`` of the summed per-pixel MAE replaces GradientTape on a
  non-scalar loss (TF sums the components, so the gradients agree).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg import RADIUS, SIZE_FACTOR
from tpuseg.models.unet import UNet


def _round_radius(x: float) -> int:
    """Round up to the next multiple of SIZE_FACTOR (model.py:160-163)."""
    return int(SIZE_FACTOR * np.ceil(float(x) / SIZE_FACTOR))


def estimate_radius(
    model: UNet,
    variables,
    num_channels: int,
    rng: Optional[np.random.Generator] = None,
    eps: float = 1e-8,
) -> int:
    """Measure the ERF radius; falls back to the theoretical RADIUS=96 when
    the gradient support is degenerate (model.py:195-197)."""
    n = 2 * RADIUS
    if rng is None:
        rng = np.random.default_rng()
    img = jnp.asarray(rng.normal(size=(1, n, n, num_channels)), jnp.float32)
    mid = n // 2

    def loss_fn(x):
        softmax = jax.nn.softmax(model.apply(variables, x, train=False), axis=-1)
        # desired pattern: softmax with the center pixel's probabilities
        # flipped to 1-p (model.py:179-181), treated as a constant target
        target = jax.lax.stop_gradient(
            softmax.at[0, mid, mid, :].set(1.0 - softmax[0, mid, mid, :]))
        # Keras MAE(reduction=NONE) -> per-pixel mean over classes; the tape
        # gradient of the non-scalar sums it
        return jnp.sum(jnp.mean(jnp.abs(target - softmax), axis=-1))

    grads = jax.grad(loss_fn)(img)
    grad_img = np.abs(np.asarray(grads[0]))  # H, W, C
    if num_channels > 1:
        grad_img = grad_img.mean(axis=-1)
    else:
        grad_img = grad_img.squeeze(-1)

    print(f"Theoretical RF: {RADIUS}")
    vec = np.maximum(grad_img.max(axis=0), grad_img.max(axis=1))
    idx = np.nonzero(vec > eps)[0]
    if len(idx) < 2:
        radius = RADIUS
        print(f"ERF based radius detection failed, defaulting to theoretical radius: {radius}")
    else:
        erf = int((idx.max() - idx.min()) / 2)
        radius = _round_radius(erf)
        print(f'computed radius : "{radius}"')
    return radius
