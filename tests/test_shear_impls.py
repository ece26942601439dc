"""All three shear implementations must agree to float32 precision (CPU: Pallas
variants run in interpret mode, exercising the exact TPU code path)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpuseg.ops.warp import _apply_shear_x


@pytest.fixture()
def data():
    img = jnp.asarray(np.random.default_rng(0).random((2, 32, 64)), jnp.float32)
    off = jnp.asarray(np.random.default_rng(1).uniform(-8, 8, (2, 32)), jnp.float32)
    return img, off


@pytest.mark.parametrize("mode", ["roll", "dma"])
def test_pallas_variants_match_barrel(monkeypatch, data, mode):
    from tpuseg.ops import warp

    img, off = data
    baseline = np.asarray(_apply_shear_x(img, off))  # barrel (default)
    # the knob is resolved at import (env reads at trace time desync from
    # jit caches); eager tests override the module constant directly
    monkeypatch.setattr(warp, "_SHEAR_MODE", mode)
    alt = np.asarray(_apply_shear_x(img, off))
    # fma/fusion ordering differs between implementations: float32-equal
    np.testing.assert_allclose(alt, baseline, rtol=1e-6, atol=1e-7)
