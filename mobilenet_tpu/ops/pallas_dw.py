"""Pallas channel-tiled depthwise 3x3 convolution kernel for TPU.

Reference analog: C4, the dw_conv OpenCL-C kernel (SURVEY.md SS2) — the kernel
BASELINE.json:5 singles out: "the depthwise 3x3 convolution kernel becomes a
channel-tiled Pallas kernel".

Design (SURVEY.md SS7 stage 3):
  - channels-last: C rides the 128-lane axis, so each VPU op processes 128
    channels at once; the 3x3 stencil is 9 shifted multiply-adds on the VPU.
  - grid (N, H_out/TH, C/CT): spatial row-tiles x channel-tiles; Pallas
    pipelines HBM->VMEM block fetches across grid steps automatically.
  - halo rows come from `pl.Element` input block dims (elementwise start
    offsets), so adjacent row-tiles overlap by the 2-row halo without manual
    DMA.
  - BN (pre-folded into weights) + bias + ReLU(6) fused in-kernel — no extra
    HBM round-trip for the epilogue.
  - float32 accumulation regardless of input dtype (fp32 or bf16).

Stride-2 layers: out[h,w] needs in[2h+dy, 2w+dx]; the kernel splits rows and
columns into even/odd phases with static reshapes (lane axis untouched), so no
strided vector loads are required.

TF/XLA 'SAME' padding is applied by the XLA wrapper before the kernel
(stride 1 -> (1,1); stride 2, even input -> (0,1) plus alignment), so the
kernel body has no boundary conditionals.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Flipped (only) by tools/lower_check.py's compile-only tier: forces real
# Pallas->Mosaic lowering during jax.export cross-platform lowering on the
# CPU backend, instead of the interpret fallback the test tier uses. Every
# kernel module shares this one switch (they import _should_interpret).
FORCE_COMPILE = False


def _should_interpret() -> bool:
    return not FORCE_COMPILE and jax.default_backend() != "tpu"


def _pick_block_h(h_out: int) -> int:
    """Largest row-tile <= 16 that divides H_out (H_out in {112,56,28,14,7,...})."""
    for th in (16, 14, 8, 7, 4, 2, 1):
        if th <= h_out and h_out % th == 0:
            return th
    return 1


def _pick_block_c(c: int) -> int:
    if c % 256 == 0:
        return 256
    if c % 128 == 0:
        return 128
    return c  # small-alpha configs underfill lanes; Mosaic pads (SURVEY.md SS7)


def _dw_kernel_s1(x_ref, w_ref, b_ref, o_ref, *, th: int, w_out: int, relu6: bool):
    xv = x_ref[0]  # (TH+2, W+2, CT)
    acc = jnp.zeros((th, w_out, xv.shape[-1]), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = xv[dy : dy + th, dx : dx + w_out, :].astype(jnp.float32)
            acc = acc + tap * w_ref[dy, dx, :].astype(jnp.float32)
    y = acc + b_ref[0].astype(jnp.float32)
    y = jnp.maximum(y, 0.0)
    if relu6:
        y = jnp.minimum(y, 6.0)
    o_ref[...] = y.astype(o_ref.dtype)


def _dw_kernel_s2(x_ref, w_ref, b_ref, o_ref, *, th: int, w_out: int, relu6: bool):
    xv = x_ref[0]  # (2*TH+2, W_in, CT), W_in even
    ct = xv.shape[-1]
    w_in = xv.shape[1]
    # Split rows into even/odd phases: rows 2k -> re[k], rows 2k+1 -> ro[k].
    rows = xv.reshape(th + 1, 2, w_in, ct)
    row_phase = (rows[:, 0], rows[:, 1])  # each (TH+1, W_in, CT)

    def cols(r, dx):
        # r: (TH+1, W_in, CT) -> select rows slice later; split cols even/odd.
        c2 = r.reshape(r.shape[0], w_in // 2, 2, ct)
        phase, off = (dx % 2), (dx // 2)
        return c2[:, off : off + w_out, phase, :]  # (TH+1, W_out, CT)

    acc = jnp.zeros((th, w_out, ct), jnp.float32)
    for dy in range(3):
        r = row_phase[dy % 2]
        r_off = dy // 2
        for dx in range(3):
            tap = cols(r, dx)[r_off : r_off + th].astype(jnp.float32)
            acc = acc + tap * w_ref[dy, dx, :].astype(jnp.float32)
    y = acc + b_ref[0].astype(jnp.float32)
    y = jnp.maximum(y, 0.0)
    if relu6:
        y = jnp.minimum(y, 6.0)
    o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("stride", "relu6", "block_h", "block_c", "interpret"),
)
def depthwise_conv_pallas(
    x: jax.Array,
    w: jax.Array,
    stride: int,
    bias: Optional[jax.Array] = None,
    relu6: bool = True,
    *,
    block_h: Optional[int] = None,
    block_c: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Depthwise 3x3 conv + bias + ReLU(6), SAME padding, NHWC.

    x: (N, H, W, C); w: (3, 3, 1, C) HWIO (same as the XLA path); bias: (C,).
    """
    if interpret is None:
        interpret = _should_interpret()
    n, h, wdim, c = x.shape
    assert w.shape == (3, 3, 1, c), (w.shape, c)
    assert stride in (1, 2)
    h_out = -(-h // stride)
    w_out = -(-wdim // stride)

    th = block_h or _pick_block_h(h_out)
    ct = block_c or _pick_block_c(c)
    if c % ct:
        ct = c
    while h_out % th:
        th -= 1

    wk = w.reshape(3, 3, c)
    b = (bias if bias is not None else jnp.zeros((c,), x.dtype)).reshape(1, c)

    def same_lo(size: int) -> int:
        out = -(-size // stride)
        total = max((out - 1) * stride + 3 - size, 0)
        return total // 2

    # Pad so the kernel body needs no boundary conditionals: TF-SAME lo pad,
    # then hi pad up to the exact footprint the tiled kernel reads
    # (stride 1: out+2 rows/cols; stride 2: 2*out+2, keeping even parity for
    # the even/odd phase split).
    need_h = h_out + 2 if stride == 1 else 2 * h_out + 2
    need_w = w_out + 2 if stride == 1 else 2 * w_out + 2
    lo_h, lo_w = same_lo(h), same_lo(wdim)
    xp = jnp.pad(
        x, ((0, 0), (lo_h, need_h - lo_h - h), (lo_w, need_w - lo_w - wdim), (0, 0))
    )
    w_in = need_w
    if stride == 1:
        th_in = th + 2
        kernel = functools.partial(_dw_kernel_s1, th=th, w_out=w_out, relu6=relu6)
        row_stride = th
    else:
        th_in = 2 * th + 2
        kernel = functools.partial(_dw_kernel_s2, th=th, w_out=w_out, relu6=relu6)
        row_stride = 2 * th

    grid = (n, h_out // th, c // ct)

    if c == ct:
        # Single channel block: constant offset 0 — Mosaic can't prove
        # j*ct % 128 == 0 for ct < 128, but a literal 0 is trivially aligned.
        x_index = lambda b_, i, j: (b_, i * row_stride, 0, 0)
    else:
        x_index = lambda b_, i, j: (b_, i * row_stride, 0, j * ct)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # Mosaic requires all dims Element or none: element offsets give
            # the overlapping halo reads along H.
            pl.BlockSpec(
                (pl.Element(1), pl.Element(th_in), pl.Element(w_in), pl.Element(ct)),
                x_index,
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((3, 3, ct), lambda b_, i, j: (0, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ct), lambda b_, i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (pl.Squeezed(), th, w_out, ct),
            lambda b_, i, j: (b_, i, 0, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h_out, w_out, c), x.dtype),
        interpret=interpret,
    )(xp, wk, b)
    return out
