"""MXU-native batched affine warp: Paeth shears (Pallas) + separable resample.

The obvious way to warp on an accelerator — per-pixel bilinear gather — is
hostile to this TPU: the gather HLO compiles for minutes and runs at
~15 ms/(8x512² images) per tap pass (measured; gathers execute on the
scalar/vector path, not the MXU). This module re-expresses the reference's
augmentation affine (rotate about center, then corner-anchored scale +
integer translate; augment.py:160-174) in hardware-native primitives:

1. **rotation** = exact rot90^k (θ reduced to [-45°, 45°]) followed by the
   Paeth three-shear decomposition: with the inverse-map convention
   ``out[r,c] = in[r, c + a(r-cy)]`` (x-shear) and
   ``out[r,c] = in[r + b(c-cx), c]`` (y-shear),
   R⁻¹(θ) = X(a)·Y(b)·X(a) with a = -tan(θ/2), b = sin(θ).
   Each shear shifts every row (column) by a per-row constant — a dynamic
   slice, not a gather — implemented as a Pallas kernel whose per-row
   offsets arrive via scalar prefetch;
2. **scale + translate** is separable, so it runs as two small batched
   einsums with per-sample [S,S] bilinear weight matrices built from
   broadcasted iotas — pure MXU work, no gathers anywhere.

Boundary handling is numpy-pad-'reflect' (mirror) everywhere, matching the
reference's skimage calls. The sequential two-stage resampling (rotate pass,
then scale pass) also matches the reference; the shears add one more
resample inside the rotation stage — an interpolation difference only.

This warp requires square images (rot90 would change a non-square shape);
callers with non-square tiles reflect-pad to square, warp, and crop —
see tpuseg.aug.device (the round-1 gather-warp fallback is gone: gathers
ran ~18x slower on this backend).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS_PER_PROGRAM = 8

# Shear implementation knob, resolved ONCE at import: reading the env var at
# trace time silently desyncs from jit caches (a program compiled under the
# old value keeps serving after the env changes — an A/B that toggles the
# var mid-process would measure the wrong kernel; review r3). Set it before
# importing tpuseg, or monkeypatch warp._SHEAR_MODE in eager tests.
_SHEAR_MODE = os.environ.get("TPUSEG_SHEAR", "barrel")


def _mirror_float(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Continuous numpy-'reflect' fold of coordinates into [0, size-1]."""
    if size <= 1:
        return jnp.zeros_like(x)
    period = 2.0 * (size - 1)
    x = jnp.abs(x)
    x = jnp.mod(x, period)
    return jnp.where(x > size - 1, period - x, x)


# ---------------------------------------------------------------------------
# Pallas shear kernel: out[n, h, :] = (1-f[n,h]) * img[n, h, s[n,h] : s+W]
#                                   +    f[n,h]  * img[n, h, s+1 : s+1+W]
# ---------------------------------------------------------------------------

def _shear_kernel(shift_ref, frac_ref, img_ref, out_ref, scratch, sems):
    """Mosaic forbids vector loads at dynamic lane offsets, but the DMA
    engine copies from arbitrary offsets — so each row's two shifted reads
    are async HBM->VMEM DMAs, all started before any is awaited."""
    n = pl.program_id(0)
    hb = pl.program_id(1)
    w = out_ref.shape[2]

    def row_dma(slot, r, extra):
        h = hb * _ROWS_PER_PROGRAM + r
        return pltpu.make_async_copy(
            img_ref.at[n, h, pl.ds(shift_ref[n, h] + extra, w)],
            scratch.at[slot, r],
            sems.at[slot, r],
        )

    for r in range(_ROWS_PER_PROGRAM):
        row_dma(0, r, 0).start()
        row_dma(1, r, 1).start()
    for r in range(_ROWS_PER_PROGRAM):
        h = hb * _ROWS_PER_PROGRAM + r
        f = frac_ref[n, h]
        row_dma(0, r, 0).wait()
        row_dma(1, r, 1).wait()
        out_ref[0, pl.ds(r, 1), :] = (
            scratch[0, pl.ds(r, 1), :] * (1.0 - f) + scratch[1, pl.ds(r, 1), :] * f)


def _shear_rows_barrel(img_padded: jnp.ndarray, shift: jnp.ndarray, frac: jnp.ndarray,
                       out_width: int) -> jnp.ndarray:
    """Barrel-shifter shear: log2(Wp) stages of STATIC rolls + per-row selects.

    Static rolls are cheap lane/sublane rotations and compile to a tiny HLO,
    vs. a gather whose compile takes minutes and whose execution crawls on
    the scalar path. After rolling each row left by shift[n,h], the first
    out_width lanes are exactly img_padded[n, h, s : s+W] (shift+W never
    exceeds Wp, so no wraparound reaches them); the +1 tap for the bilinear
    blend is one more static roll.
    """
    n, h, wp = img_padded.shape
    x = img_padded
    for k in range(max(1, (wp - 1).bit_length())):
        bit = ((shift >> k) & 1).astype(bool)[..., None]
        x = jnp.where(bit, jnp.roll(x, -(1 << k), axis=2), x)
    x0 = x[..., :out_width]
    x1 = jnp.roll(x, -1, axis=2)[..., :out_width]
    f = frac[..., None]
    return x0 * (1.0 - f) + x1 * f


def _shear_rows_pallas(img_padded: jnp.ndarray, shift: jnp.ndarray, frac: jnp.ndarray,
                       out_width: int) -> jnp.ndarray:
    """img_padded [N, H, Wp] f32, shift [N, H] i32 (into padded cols),
    frac [N, H] f32 -> [N, H, out_width]."""
    n, h, wp = img_padded.shape
    assert h % _ROWS_PER_PROGRAM == 0, f"H={h} must be a multiple of {_ROWS_PER_PROGRAM}"
    grid = (n, h // _ROWS_PER_PROGRAM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            # stays in HBM; the kernel DMAs the slices it needs
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, _ROWS_PER_PROGRAM, out_width),
                               lambda ni, hb, *_: (ni, hb, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, _ROWS_PER_PROGRAM, out_width), jnp.float32),
            pltpu.SemaphoreType.DMA((2, _ROWS_PER_PROGRAM)),
        ],
    )
    return pl.pallas_call(
        _shear_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, h, out_width), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )(shift, frac, img_padded)


def _roll_shear_kernel(shift_ref, frac_ref, img_ref, out_ref):
    """Per-row dynamic lane rotation: out[r, c] = in[r, c + s] blended with
    the +1 tap. ``pltpu.roll`` takes a traced shift (unlike vector loads,
    whose lane offsets must be static), so each row costs two rolls and a
    multiply-add — no gathers, no DMA."""
    n = pl.program_id(0)
    hb = pl.program_id(1)
    wp = img_ref.shape[2]
    w = out_ref.shape[2]
    for r in range(_ROWS_PER_PROGRAM):
        h = hb * _ROWS_PER_PROGRAM + r
        s = shift_ref[n, h]
        f = frac_ref[n, h]
        row = img_ref[0, r:r + 1, :]
        left = pltpu.roll(row, shift=wp - s, axis=1)  # == roll(-s)
        out_ref[0, r:r + 1, :] = left[:, :w] * (1.0 - f) + (
            pltpu.roll(left, shift=wp - 1, axis=1)[:, :w] * f)


def _shear_rows_roll_pallas(img_padded: jnp.ndarray, shift: jnp.ndarray,
                            frac: jnp.ndarray, out_width: int) -> jnp.ndarray:
    n, h, wp = img_padded.shape
    assert h % _ROWS_PER_PROGRAM == 0
    # lane-align the rolled dimension; rows never read into the filler
    # (shift + out_width stays within the mirror padding)
    if wp % 128:
        img_padded = jnp.pad(img_padded, ((0, 0), (0, 0), (0, (-wp) % 128)))
        wp = img_padded.shape[2]
    if out_width % 128:
        pad_out = (-out_width) % 128
        out = _shear_rows_roll_pallas(
            jnp.pad(img_padded, ((0, 0), (0, 0), (0, pad_out))), shift, frac,
            out_width + pad_out)
        return out[..., :out_width]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n, h // _ROWS_PER_PROGRAM),
        in_specs=[
            pl.BlockSpec((1, _ROWS_PER_PROGRAM, wp),
                         lambda ni, hb, *_: (ni, hb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _ROWS_PER_PROGRAM, out_width),
                               lambda ni, hb, *_: (ni, hb, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _roll_shear_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, h, out_width), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )(shift, frac, img_padded)


def _shear_rows(img_padded, shift, frac, out_width):
    """Dispatch between three bit-identical shear implementations.

    - default ``barrel``: pure-XLA log2(W) barrel shifter. XLA fuses the
      roll+select stages into ~one memory pass over the batch — measured
      12.4 ms for a full 512²x8 augmentation;
    - ``TPUSEG_SHEAR=roll``: Pallas kernel using per-row dynamic lane
      rotation (``pltpu.roll`` with a traced shift). Compiles and matches
      exactly, but (1, W) row slabs waste 7/8 of the VPU sublanes —
      measured 68 ms for the same augmentation — so it is not the default;
    - ``TPUSEG_SHEAR=dma``: Pallas kernel fetching each shifted row by
      async DMA (arbitrary offsets are legal for the DMA engine, unlike
      vector loads). The canonical form on standard TPU runtimes; this
      environment's chipless remote compiler crashes on manual-DMA kernels.
    CPU runs the Pallas variants in interpret mode. The mode comes from
    module-level ``_SHEAR_MODE`` (TPUSEG_SHEAR read once at import — see the
    note there about jit-cache desync).
    """
    if _SHEAR_MODE == "roll":
        return _shear_rows_roll_pallas(img_padded, shift, frac, out_width)
    if _SHEAR_MODE == "dma":
        return _shear_rows_pallas(img_padded, shift, frac, out_width)
    return _shear_rows_barrel(img_padded, shift, frac, out_width)


def _apply_shear_x(img: jnp.ndarray, offset: jnp.ndarray) -> jnp.ndarray:
    """out[n,h,c] = in[n,h, c + offset[n,h]] with mirror boundary.
    img [N, H, W] f32; offset [N, H] f32 (can be fractional)."""
    n, h, w = img.shape
    pad = int(0.3536 * max(h, w)) + 3  # max Paeth shear reach (static)
    padded = jnp.pad(img, ((0, 0), (0, 0), (pad, pad)), mode="reflect")
    # sampling col for output col 0 is offset; shift into padded coords
    start = offset + pad
    shift = jnp.floor(start).astype(jnp.int32)
    frac = (start - jnp.floor(start)).astype(jnp.float32)
    shift = jnp.clip(shift, 0, padded.shape[2] - w - 1)
    return _shear_rows(padded, shift, frac, w)


def _apply_shear_y(img: jnp.ndarray, offset: jnp.ndarray) -> jnp.ndarray:
    """out[n,h,c] = in[n, h + offset[n,c], c] — via transpose + x-shear."""
    out = _apply_shear_x(jnp.swapaxes(img, 1, 2), offset)
    return jnp.swapaxes(out, 1, 2)


# ---------------------------------------------------------------------------
# Separable scale+translate as batched einsums
# ---------------------------------------------------------------------------

def _resample_weights(src: jnp.ndarray, in_size: int) -> jnp.ndarray:
    """src [B, out] float sample positions -> bilinear weights [B, out, in]."""
    src_m = _mirror_float(src, in_size)
    taps = jax.lax.broadcasted_iota(jnp.float32, (1, 1, in_size), 2)
    return jnp.maximum(0.0, 1.0 - jnp.abs(src_m[..., None] - taps))


def scale_translate(img: jnp.ndarray, sx: jnp.ndarray, sy: jnp.ndarray,
                    tx: jnp.ndarray, ty: jnp.ndarray) -> jnp.ndarray:
    """Reference warp stage (augment.py:165-167): corner-anchored scale then
    translate; inverse map in = (out - t)/s. img [B,H,W,C]; params [B]."""
    b, h, w, c = img.shape
    rows_out = jax.lax.broadcasted_iota(jnp.float32, (b, h), 1)
    cols_out = jax.lax.broadcasted_iota(jnp.float32, (b, w), 1)
    wr = _resample_weights((rows_out - ty[:, None]) / sy[:, None], h)  # [B,H,H]
    wc = _resample_weights((cols_out - tx[:, None]) / sx[:, None], w)  # [B,W,W]
    out = jnp.einsum("boi,biwc->bowc", wr, img, preferred_element_type=jnp.float32)
    out = jnp.einsum("boi,bhic->bhoc", wc, out, preferred_element_type=jnp.float32)
    return out


# ---------------------------------------------------------------------------
# Rotation: rot90^k + Paeth shears
# ---------------------------------------------------------------------------

def _rot90_batch(img: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Exact per-sample rot90^k (CCW), square images. img [B,H,W,C], k [B]."""
    r1 = jnp.flip(jnp.swapaxes(img, 1, 2), axis=1)  # rot90 CCW
    r2 = jnp.flip(jnp.flip(img, axis=1), axis=2)
    r3 = jnp.flip(jnp.swapaxes(img, 1, 2), axis=2)
    k = k[:, None, None, None]
    out = jnp.where(k == 1, r1, img)
    out = jnp.where(k == 2, r2, out)
    out = jnp.where(k == 3, r3, out)
    return out


def rotate(img: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Rotate content CCW by per-sample theta (radians) about the center,
    bilinear, mirror boundary. img [B,H,W,C] f32 with H == W."""
    b, h, w, c = img.shape
    assert h == w, "Paeth rotation path requires square images"
    # reduce to |theta'| <= 45deg with an exact quarter-turn
    k = jnp.round(theta / (jnp.pi / 2)).astype(jnp.int32)
    theta_r = theta - k.astype(jnp.float32) * (jnp.pi / 2)
    img = _rot90_batch(img, jnp.mod(k, 4))

    a = -jnp.tan(theta_r / 2.0)  # x-shear factor
    bf = jnp.sin(theta_r)  # y-shear factor
    cy, cx = h / 2.0 - 0.5, w / 2.0 - 0.5
    rows = jax.lax.broadcasted_iota(jnp.float32, (b, h), 1)
    cols = jax.lax.broadcasted_iota(jnp.float32, (b, w), 1)

    flat = jnp.moveaxis(img, 3, 1).reshape(b * c, h, w)  # fold channels
    def per_channel(off):  # [B,S] -> [B*C,S]
        return jnp.repeat(off, c, axis=0)

    off_x = per_channel(a[:, None] * (rows - cy))
    flat = _apply_shear_x(flat, off_x)
    off_y = per_channel(bf[:, None] * (cols - cx))
    flat = _apply_shear_y(flat, off_y)
    flat = _apply_shear_x(flat, off_x)
    return jnp.moveaxis(flat.reshape(b, c, h, w), 1, 3)


def warp_affine_batch(img: jnp.ndarray, theta: jnp.ndarray, tx: jnp.ndarray,
                      ty: jnp.ndarray, sx: jnp.ndarray, sy: jnp.ndarray) -> jnp.ndarray:
    """Full reference affine (rotate stage then scale/translate stage) for a
    batch with per-sample parameters. img [B,H,W,C] float32."""
    img = rotate(img, theta)
    return scale_translate(img, sx, sy, tx, ty)
