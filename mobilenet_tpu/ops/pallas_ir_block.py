"""Fused inverted-residual Pallas kernel: one MobileNet-V2 block per call.

The V2 twin of pallas_block.py's fused dw+pw kernel, covering the whole
inverted-residual bottleneck (Sandler et al. 2018; reference analog: the
separable-block kernels of SURVEY.md SS2 C4/C5 generalized to V2's
expand->dw->linear-project schedule):

    expand 1x1 (MXU) -> ReLU6 -> dw 3x3 (VPU stencil) -> ReLU6
      -> linear project 1x1 (MXU) -> [+ residual]

all inside ONE kernel invocation, so the EXPANDED tensor (t*Cin channels —
6x wider than the block's input, the dominant HBM term of the unfused
schedule) never exists in HBM at all. Per block the HBM traffic is exactly
read(N,H,W,Cin) + write(N,H',W',Cout) + weights.

Mosaic-alignment strategy (the reason this kernel exists — V2's channel
counts are almost never 128-multiples, and Mosaic rejects (B,H,W,C)->(M,C)
shape casts at unaligned C, measured on v5e: `vector<8x7x7x960xbf16> ->
vector<392x960xbf16>: unsupported shape cast`, tools/ab_v2_routing.py):

  - The block INPUT and OUTPUT stay 2D: (N*H*W, Cin) and (N*H'*W', Cout) —
    row-major bitcasts of NHWC, so the caller's reshape is free. Unaligned
    Cin/Cout therefore appear only as matmul K/N dims and 2D block minors,
    never in a vector shape cast.
  - Only the EXPANDED dim is padded to a 128 multiple (zero weight columns /
    rows: exactness argument identical to checkpoints/padding.py — zero
    contributions are exact in fp arithmetic). Every in-kernel reshape
    ((M,Ep)<->(BN,H,W,Ep)) is on the padded Ep minor. The padding is
    VMEM-only: no HBM byte is inflated.
  - Whole-image tiles (grid = N/BN): no halo windows (no element-offset
    windows at all — the class of bug that crashes the device, CLAUDE.md),
    no cross-step border cleanup, and the residual add is a plain 2D add of
    the input block (stride-1 Cin==Cout blocks: identical row set).

The dw stencil, zero-border scratch discipline, and stride-2 full-width
accumulate + even-column gather are the measured designs from
pallas_block.py (docs/design.md SS3.2-3.3).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_dw import _should_interpret


def _act(y, relu6):
    y = jnp.maximum(y, 0.0)
    if relu6:
        y = jnp.minimum(y, 6.0)
    return y


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# Calibration for Mosaic's scoped-vmem stack allocator (see
# pallas_block.pick_tiles): the estimate below tracks the live terms; the
# factor absorbs double-buffered operand copies. A too-large pick fails at
# COMPILE time (AOT-safe, memory note tpu-pallas-gotchas) — callers fall
# back to XLA routing, nothing can crash the device.
_VMEM_CAP = 12 * 1024 * 1024
_VMEM_FACTOR = 1.2


def _est_bytes(bn: int, h: int, w: int, cin: int, ep: int, cout: int,
               stride: int, itemsize: int) -> int:
    h_out, w_out = -(-h // stride), -(-w // stride)
    x_blk = bn * h * w * cin * itemsize
    exp_f32 = bn * h * w * ep * 4          # the dot result before the cast
    win = bn * (h + 2) * (w + 2) * ep * itemsize
    acc_w = w_out if stride == 1 else 2 * w_out  # s2 accumulates full width
    acc = bn * h_out * acc_w * ep * 4
    out = bn * h_out * w_out * cout * (4 + itemsize)
    weights = (cin * ep + ep * cout + 10 * ep) * itemsize
    return int(_VMEM_FACTOR * (x_blk + exp_f32 + 2 * win + acc + out)) + weights


def _min_bn(n: int, rows_in: int, rows_out: int) -> int:
    """Smallest divisor of n whose 2D blocks satisfy the Pallas TPU rule:
    the sublane (rows) dim of a block must be divisible by 8 — unless the
    block equals the whole array (bn == n), which is always legal. Both the
    input (bn*H*W rows) and output (bn*H'*W' rows) blocks must comply."""
    bn = 1
    while bn < n and ((bn * rows_in) % 8 or (bn * rows_out) % 8):
        bn += 1
        while n % bn:
            bn += 1
    return bn


def ir_fits(n: int, h: int, w: int, cin: int, e: int, cout: int, stride: int,
            itemsize: int = 2) -> bool:
    """Whole-image-tile feasibility at the smallest legal batch tile
    (bigger BN only grows the estimate, and _pick_bn stops well short of
    the cap)."""
    ep = _round_up(e, 128)
    if stride == 2 and (h % 2 or w % 2):
        return False
    h_out, w_out = -(-h // stride), -(-w // stride)
    bn = _min_bn(n, h * w, h_out * w_out)
    return _est_bytes(bn, h, w, cin, ep, cout, stride, itemsize) <= _VMEM_CAP


def _pick_bn(n: int, h: int, w: int, cin: int, ep: int, cout: int,
             stride: int, itemsize: int) -> int:
    """Batch tile: start at the smallest LEGAL tile (_min_bn), then grow
    toward ~1024 MXU rows (small-spatial blocks) while the VMEM estimate
    stays comfortably under the cap. Doubling preserves the %8 row rule."""
    h_out, w_out = -(-h // stride), -(-w // stride)
    bn = _min_bn(n, h * w, h_out * w_out)
    while (
        bn * 2 <= n
        and n % (bn * 2) == 0
        and bn * h * w < 1024
        and _est_bytes(bn * 2, h, w, cin, ep, cout, stride, itemsize)
        <= 8 * 1024 * 1024
    ):
        bn *= 2
    return bn


def _ir_kernel(
    x_ref, ew_ref, eb_ref, dww_ref, dwb_ref, pww_ref, pwb_ref, o_ref, s_ref,
    *, bn, h, w, stride, relu6, residual, out_dtype,
):
    ep = s_ref.shape[-1]
    h_out = -(-h // stride)
    w_out = -(-w // stride)

    @pl.when(pl.program_id(0) == 0)
    def _():
        # Zero once; every step rewrites the same interior region and never
        # touches the border rows/cols, so they stay clean across steps.
        s_ref[...] = jnp.zeros_like(s_ref)

    # --- expand 1x1 on the MXU (2D all the way: no cast touches Cin) -------
    xv = x_ref[...]  # (BN*H*W, Cin)
    prec = (jax.lax.Precision.HIGHEST if ew_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    ye = jnp.dot(xv, ew_ref[...], preferred_element_type=jnp.float32,
                 precision=prec)
    ye = _act(ye + eb_ref[0].astype(jnp.float32), relu6)
    y4 = ye.astype(s_ref.dtype).reshape(bn, h, w, ep)  # Ep-minor cast: legal

    # --- normalize into the zero-bordered scratch (TF-SAME padding) --------
    # stride 1: image at rows/cols [1, H+1) x [1, W+1)  (pad 1 all around)
    # stride 2 (even H, W): image at [0, H) x [0, W)    (pad bottom/right)
    if stride == 1:
        s_ref[:, 1 : h + 1, 1 : w + 1, :] = y4
    else:
        s_ref[:, 0:h, 0:w, :] = y4

    # --- branch-free 9-tap depthwise stencil (pallas_block.py design) ------
    sv = s_ref[...]
    if stride == 1:
        acc = jnp.zeros((bn, h, w, ep), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                tap = sv[:, dy : dy + h, dx : dx + w, :].astype(jnp.float32)
                acc = acc + tap * dww_ref[dy, dx, :].astype(jnp.float32)
    else:
        # full-width accumulate, then one reshape-gather of even columns
        # (measured faster than 9 strided gathers for bf16, design SS3.2).
        w_full = 2 * w_out
        pairs = sv.reshape(bn, h_out + 1, 2, w + 2, ep)
        acc_f = jnp.zeros((bn, h_out, w_full, ep), jnp.float32)
        for dy in range(3):
            r = pairs[:, dy // 2 : dy // 2 + h_out, dy % 2]
            for dx in range(3):
                tap = r[:, :, dx : dx + w_full, :].astype(jnp.float32)
                acc_f = acc_f + tap * dww_ref[dy, dx, :].astype(jnp.float32)
        acc = acc_f.reshape(bn, h_out, w_out, 2, ep)[:, :, :, 0, :]

    y = _act(acc + dwb_ref[0].astype(jnp.float32), relu6)

    # --- linear projection on the MXU; residual as a 2D add ----------------
    y2 = y.astype(pww_ref.dtype).reshape(bn * h_out * w_out, ep)
    out = jnp.dot(y2, pww_ref[...], preferred_element_type=jnp.float32,
                  precision=prec)
    out = (out + pwb_ref[0].astype(jnp.float32)).astype(out_dtype)
    if residual:
        out = out + xv.astype(out_dtype)  # Cin == Cout: identical row set
    o_ref[...] = out


def inverted_residual_pallas(
    x, exp_w, exp_b, dw_w, dw_b, prj_w, prj_b, stride, residual,
    relu6=True, *, block_n: Optional[int] = None, interpret=None,
):
    """Fused expand(1x1)+ReLU6 -> dw3x3+ReLU6 -> linear project(1x1)
    [+ residual]. TF-SAME semantics; whole-image tiles.

    x: (N, H, W, Cin); exp_w: (Cin, E); dw_w: (3, 3, 1, E) or (3, 3, E);
    prj_w: (E, Cout). residual requires stride == 1 and Cin == Cout.
    Output matches models.mobilenet_v2's xla branch to bf16 tolerance
    (exactly, under interpret/f32 with fixed tap order).
    """
    return _ir_impl(x, exp_w, exp_b, dw_w.reshape(3, 3, -1), dw_b,
                    prj_w, prj_b, int(stride), bool(residual), bool(relu6),
                    block_n=block_n, interpret=interpret)


@functools.partial(
    jax.jit,
    static_argnames=("stride", "residual", "relu6", "block_n", "interpret"),
)
def _ir_impl(
    x: jax.Array,       # (N, H, W, Cin)
    exp_w: jax.Array,   # (Cin, E)
    exp_b: jax.Array,   # (E,)
    dw_w: jax.Array,    # (3, 3, E)
    dw_b: jax.Array,    # (E,)
    prj_w: jax.Array,   # (E, Cout)
    prj_b: jax.Array,   # (Cout,)
    stride: int,
    residual: bool,
    relu6: bool = True,
    *,
    block_n: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    if interpret is None:
        interpret = _should_interpret()
    n, h, w, cin = x.shape
    e = exp_w.shape[1]
    cout = prj_w.shape[1]
    assert exp_w.shape == (cin, e) and dw_w.shape == (3, 3, e)
    assert prj_w.shape == (e, cout)
    if stride == 2:
        assert h % 2 == 0 and w % 2 == 0, (h, w)
    if residual:
        assert stride == 1 and cin == cout, (stride, cin, cout)
    h_out = -(-h // stride)
    w_out = -(-w // stride)

    # Pad the EXPANDED dim only (VMEM-only; zero columns/rows are exact —
    # checkpoints/padding.py has the identical argument for V1).
    ep = _round_up(e, 128)
    if ep != e:
        exp_w = jnp.pad(exp_w, ((0, 0), (0, ep - e)))
        exp_b = jnp.pad(exp_b, (0, ep - e))
        dw_w = jnp.pad(dw_w, ((0, 0), (0, 0), (0, ep - e)))
        dw_b = jnp.pad(dw_b, (0, ep - e))
        prj_w = jnp.pad(prj_w, ((0, ep - e), (0, 0)))

    if block_n is not None:
        bn = block_n
        assert n % bn == 0, (n, bn)
    else:
        bn = _pick_bn(n, h, w, cin, ep, cout, stride, x.dtype.itemsize)

    x2 = x.reshape(n * h * w, cin)  # row-major bitcast, free in XLA
    s_rows = h + 2  # covers both strides: s2 uses rows [0, H+1]

    kernel = functools.partial(
        _ir_kernel, bn=bn, h=h, w=w, stride=stride, relu6=relu6,
        residual=residual, out_dtype=x.dtype,
    )
    out2 = pl.pallas_call(
        kernel,
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((bn * h * w, cin), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, ep), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ep), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, ep), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ep), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ep, cout), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn * h_out * w_out, cout), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * h_out * w_out, cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((bn, s_rows, w + 2, ep), x.dtype)],
        interpret=interpret,
    )(x2, exp_w, exp_b.reshape(1, ep), dw_w, dw_b.reshape(1, ep),
      prj_w, prj_b.reshape(1, cout))
    return out2.reshape(n, h_out, w_out, cout)
