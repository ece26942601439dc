"""Pallas TPU kernel fusing the blocked int8 head with per-phase argmax.

Why this exists (trace evidence, BASELINE.md round 4): in the blocked
serving walk the head is a 1x1 conv to ``4*num_classes`` channels.  Any
XLA:TPU convolution materializes its output, and a tensor with 8 channels
lane-pads 16x — the head fusion plus its layout copy measured ~14% of
int8_blocked device time (26 of 187 ms/run at the 4096^2 geometry) against
a ~3 ms bandwidth floor.  XLA cannot fuse a reduce (argmax) into a conv's
output fusion, so the padded logits write is structural for the XLA path.

The kernel removes the padded intermediate entirely:

- the matmul runs TRANSPOSED — ``dot_general(w_t[4*ncls, 4C], x[rw, 4C])``
  puts the 4*ncls phase-class values on SUBLANES and the pixels on LANES,
  so the tiny channel count never touches the 128-lane dimension;
- dequant (fp head) or the wscale multiply (quantized head), the folded
  ReLU+BN epilogue (reference model.py:136: the 1x1 head is a full conv
  block), and the per-phase argmax all run in the same VMEM residency;
- the output block is ``s32[4, R*w]`` labels — pixels on lanes, no padding
  — and one cheap XLA reshape/transpose outside reassembles the phases
  into the dense ``(B, 2h, 2w)`` label image (the depth-to-space).

Numerics: the quantized-head variant accumulates int8 x int8 in int32 —
exact, so labels are bit-identical to the XLA path by construction.  The
fp-head variant (the shipped default) matches the XLA conv per-element but
may order the f32 accumulation differently; genuine argmax ties can land
either way, exactly like the XLA blocked-vs-dense comparison itself.  CPU
keeps the XLA path (``head_kernel_eligible`` gates on backend) so the
CPU-mesh bit-equality tests pin the engine contract unchanged; the kernel
itself is covered by a dedicated interpret-mode test.

``TPUSEG_HEAD`` selects the head implementation (A/B lever, mirroring
``TPUSEG_SHEAR``): ``xla`` = the padded-logits XLA conv head, ``tdot`` =
the transposed-dot formulation (forced on, even on CPU), ``pallas`` =
the Pallas kernel (interpret mode on CPU), ``auto`` (default) = tdot on
TPU, XLA conv head on CPU.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

# Import-time default for the head formulation; _head_mode() re-reads the
# env var on every call, so setting TPUSEG_HEAD after tpuseg imports works
# (ADVICE r4 — the old module-level-only read silently ignored late sets).
# Tests monkeypatch the module attribute, which acts as the fallback.
_HEAD_MODE = os.environ.get("TPUSEG_HEAD", "auto")

# yt is (4*ncls, R*w) f32 in VMEM; keep the sublane footprint modest.  The
# practical corpus is 2-class (uint8 masks); anything <= 8 classes rides
# the kernel, larger class counts use the XLA head.
_MAX_KERNEL_CLASSES = 8


def _head_mode() -> str:
    return os.environ.get("TPUSEG_HEAD", _HEAD_MODE)


def head_kernel_eligible(ncls: int) -> bool:
    mode = _head_mode()
    if mode == "xla":
        return False
    if mode in ("pallas", "tdot"):
        if mode == "pallas" and ncls > _MAX_KERNEL_CLASSES:
            # forcing the A/B lever past the validated VMEM envelope is
            # allowed but must not be silent (ADVICE r4): yt's sublane
            # footprint grows with 4*ncls and was only measured to 8 classes
            print(f"WARNING: TPUSEG_HEAD=pallas forced with ncls={ncls} > "
                  f"{_MAX_KERNEL_CLASSES} — the Pallas head kernel's VMEM "
                  "footprint is unvalidated beyond "
                  f"{_MAX_KERNEL_CLASSES} classes; the auto path would use "
                  "the XLA head here")
        return True
    return jax.default_backend() != "cpu" and ncls <= _MAX_KERNEL_CLASSES


def _head_kernel(x_ref, sv_ref, wt_ref, epi_ref, out_ref, *, ncls, fp):
    """One (batch, row-block) step: blocked head + per-phase argmax.

    x_ref   [1, R, w, C4]  int8 (or dtype when the head input is fp-edge)
    sv_ref  [1, C4]        f32 dequant scales (fp head; ignored otherwise)
    wt_ref  [4*ncls, C4]   transposed head weights (dtype, or int8)
    epi_ref [4, 4*ncls]    f32 rows: bias, bn_scale, bn_shift, wscale
    out_ref [1, 1, 4, R*w] int32 per-phase labels, pixels on lanes
    """
    r, w, c4 = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    xr = x_ref[0].reshape(r * w, c4)
    if fp:
        xf = (xr.astype(jnp.float32) * sv_ref[0, :][None, :])
        xf = xf.astype(wt_ref.dtype)
        yt = jax.lax.dot_general(
            wt_ref[...], xf, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        yt = jax.lax.dot_general(
            wt_ref[...], xr, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        yt = yt.astype(jnp.float32) * epi_ref[3, :][:, None]
    bias = epi_ref[0, :][:, None]
    scale = epi_ref[1, :][:, None]
    shift = epi_ref[2, :][:, None]
    yt = jnp.maximum(yt + bias, 0.0) * scale + shift  # [4*ncls, r*w]
    for p in range(4):
        base = p * ncls
        best = yt[base:base + 1, :]
        idx = jnp.zeros(best.shape, jnp.int32)
        for c in range(1, ncls):  # first-max ties, argmax semantics
            cur = yt[base + c:base + c + 1, :]
            take = cur > best
            idx = jnp.where(take, c, idx)
            best = jnp.where(take, cur, best)
        out_ref[0, 0, p:p + 1, :] = idx


def blocked_head_argmax(x, sv, wt, epi, ncls: int, fp: bool):
    """Blocked head + argmax + depth-to-space: ``(B, h, w, 4C)`` phase-major
    activations -> dense ``(B, 2h, 2w)`` int32 labels.

    ``x`` int8 (or fp when the edge is a dequantized fp block), ``sv``
    f32[4C] input dequant scales (fp head), ``wt`` [4*ncls, 4C] transposed
    head weights, ``epi`` f32[4, 4*ncls] = (bias, bn_scale, bn_shift,
    wscale) rows.  All but ``x`` are trace-time constants.

    Two implementations, same contract:

    - ``tdot`` (default): a pure-XLA transposed ``dot_general`` — the
      4*ncls phase-class values land on SUBLANES and the pixels on lanes,
      so the logits tensor is ``f32[4*ncls, B*h*w]`` with zero lane
      padding; the epilogue + argmax fuse into the dot's output and only
      unpadded int32 labels are written.
    - ``pallas``: the hand-written kernel below.  Measured SLOWER
      end-to-end (55.6 vs 78 MP/s at 4096²): Mosaic requires row-major
      operand layouts, and that constraint propagates backwards through
      layout assignment — the dec1 convs lose their fused requantize
      (s32 conv outputs + four ~10.7 ms re-layout passes appeared in the
      trace).  Kept for the A/B lever and as the measured record.
    """
    if sv is None:  # fp edge into the head (e.g. --fp_blocks dec1b,head)
        sv = np.ones(x.shape[-1], np.float32)
    mode = _head_mode()
    mode = mode if mode in ("pallas", "tdot") else "tdot"
    if mode == "tdot":
        return _head_tdot(x, sv, wt, epi, ncls, fp)
    return _head_pallas(x, sv, wt, epi, ncls, fp)


def _head_tdot(x, sv, wt, epi, ncls: int, fp: bool):
    """Transposed-dot head: logits live as ``[4*ncls, B, h, w]`` (pixels on
    lanes, phase-classes on a major dim — no 16x lane padding), epilogue
    and per-phase argmax fuse behind the dot, and the depth-to-space is one
    transpose of the unpadded int32 labels.

    Two deliberate moves, both trace-driven: the contraction runs directly
    over the 4-D tensor's channel dim (a ``reshape(B*h*w, 4C)`` forced a
    row-major relayout copy of the 757 MB edge, ~9 ms), and for the fp
    head the per-channel dequant scale folds into the 8x256 weight (the
    head is linear up to its +bias, so ``(x*sv) @ W^T == x @ (W*sv)^T``) —
    a separate dequant materialized a 1.5 GB bf16 intermediate (~19 ms)."""
    epi = np.asarray(epi, np.float32)
    if fp:
        wt_eff = (wt.astype(jnp.float32) * sv[None, :]).astype(wt.dtype)
        yt = jax.lax.dot_general(
            wt_eff, x.astype(wt.dtype), (((1,), (3,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        yt = jax.lax.dot_general(
            wt, x, (((1,), (3,)), ((), ())),
            preferred_element_type=jnp.int32)
        yt = yt.astype(jnp.float32) * epi[3][:, None, None, None]
    yt = (jnp.maximum(yt + epi[0][:, None, None, None], 0.0)
          * epi[1][:, None, None, None] + epi[2][:, None, None, None])
    # rows are phase-major (p = dy*2 + dx, then class): split and argmax
    b, h, w = x.shape[:3]
    yt = yt.reshape(2, 2, ncls, b, h, w)
    lbl = jnp.argmax(yt, axis=2).astype(jnp.int32)  # [dy, dx, b, h, w]
    lbl = lbl.transpose(2, 3, 0, 4, 1)              # [b, h, dy, w, dx]
    return lbl.reshape(b, 2 * h, 2 * w)


def _head_pallas(x, sv, wt, epi, ncls: int, fp: bool):
    b, h, w, c4 = x.shape
    rows = next(r for r in (8, 4, 2, 1) if h % r == 0)
    grid = (b, h // rows)
    out = pl.pallas_call(
        functools.partial(_head_kernel, ncls=ncls, fp=fp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rows, w, c4), lambda bi, hb: (bi, hb, 0, 0)),
            pl.BlockSpec((1, c4), lambda bi, hb: (0, 0)),
            pl.BlockSpec((4 * ncls, c4), lambda bi, hb: (0, 0)),
            pl.BlockSpec((4, 4 * ncls), lambda bi, hb: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 4, rows * w),
                               lambda bi, hb: (bi, hb, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h // rows, 4, rows * w), jnp.int32),
        interpret=jax.default_backend() == "cpu",
    )(x, jnp.asarray(np.asarray(sv, np.float32)[None, :]), wt,
      jnp.asarray(epi))
    # phase reassembly (the depth-to-space): out[b, hb, dy*2+dx, r*w + j]
    # is the label of dense pixel (2*(hb*rows + r) + dy, 2*j + dx) — one
    # fused XLA reshape/transpose pass over the unpadded label bytes
    lbl = out.reshape(b, h // rows, 2, 2, rows, w)
    lbl = lbl.transpose(0, 1, 4, 2, 5, 3)  # [b, h//rows, rows, dy, w, dx]
    return lbl.reshape(b, 2 * h, 2 * w)
