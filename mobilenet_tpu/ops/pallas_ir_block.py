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


def _est_rows_bytes(th: int, h: int, w: int, cin: int, ep: int, cout: int,
                    stride: int, itemsize: int) -> int:
    """VMEM estimate for the ROW-TILED mode (one image, th output rows per
    grid step; the big-spatial twin of _est_bytes)."""
    th_in = th + 2 if stride == 1 else 2 * th + 2
    w_out = -(-w // stride)
    x_blk = th_in * w * cin * itemsize
    exp_f32 = th_in * w * ep * 4
    win = th_in * (w + 2) * ep * itemsize
    acc_w = w_out if stride == 1 else 2 * w_out
    acc = th * acc_w * ep * 4
    out = th * w_out * cout * (4 + itemsize)
    weights = (cin * ep + ep * cout + 10 * ep) * itemsize
    return int(_VMEM_FACTOR * (2 * x_blk + win + exp_f32 + acc + 2 * out)) + weights


def _pick_th(h: int, w: int, cin: int, ep: int, cout: int, stride: int,
             itemsize: int) -> int:
    """Row tile for the row-tiled mode: a th dividing H_out (with g >= 2)
    whose estimate fits the cap and whose 2D blocks are %8-legal (output
    rows th*W_out hit the sublane rule). Direction is stride-dependent and
    MEASURED (v5e, 112sq blocks, tools/ab_ir_rows.py, interleaved medians):

      stride 1 (block 0): bigger tiles win monotonically — 8.34 ms at
        th=56 vs 8.49 (28) / 8.73 (16) / 9.29 (8) / 10.62 (4) standalone;
        fewer grid steps beat smaller live sets.
      stride 2 (block 1): SMALLEST wins — 8.22 ms at th=4 vs 8.42 (28) /
        8.77 (8) / 8.91 (14); the full-width f32 accumulator doubles the
        live set per row, so small tiles keep it resident.

    Returns 0 when no legal tile exists."""
    h_out = -(-h // stride)
    w_out = -(-w // stride)
    cands = (range(h_out // 2, 0, -1) if stride == 1
             else range(4, h_out // 2 + 1))
    for th in cands:
        if h_out % th or (th * w_out) % 8:
            continue
        if _est_rows_bytes(th, h, w, cin, ep, cout, stride,
                           itemsize) <= _VMEM_CAP:
            return th
    # stride-2 fallback: nothing >= 4 legal; take anything that fits
    for th in range(min(3, h_out // 2), 0, -1):
        if h_out % th == 0 and (th * w_out) % 8 == 0 and _est_rows_bytes(
                th, h, w, cin, ep, cout, stride, itemsize) <= _VMEM_CAP:
            return th
    return 0


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


def _mode(n: int, h: int, w: int, cin: int, e: int, cout: int, stride: int,
          itemsize: int):
    """("whole", bn) | ("rows", th) | (None, 0). Whole-image tiles are
    preferred (no halo recompute, no element windows); the row-tiled mode
    covers the big-spatial blocks whose whole-image tile busts VMEM —
    measured 51.6 of V2's 62.4 ms/batch lived in exactly those three
    blocks before this mode existed (tools/prefix_attr.py --model v2)."""
    ep = _round_up(e, 128)
    if stride == 2 and (h % 2 or w % 2):
        return None, 0
    h_out, w_out = -(-h // stride), -(-w // stride)
    bn = _min_bn(n, h * w, h_out * w_out)
    if _est_bytes(bn, h, w, cin, ep, cout, stride, itemsize) <= _VMEM_CAP:
        return "whole", bn
    th = _pick_th(h, w, cin, ep, cout, stride, itemsize)
    if th:
        return "rows", th
    return None, 0


def ir_fits(n: int, h: int, w: int, cin: int, e: int, cout: int, stride: int,
            itemsize: int = 2) -> bool:
    """Feasibility in either tiling mode (static shape math, tier-agnostic)."""
    return _mode(n, h, w, cin, e, cout, stride, itemsize)[0] is not None


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


def _ir_kernel_rows(
    x_ref, ew_ref, eb_ref, dww_ref, dwb_ref, pww_ref, pwb_ref, o_ref, s_ref,
    *, th, h, w, stride, relu6, residual, out_dtype, g,
):
    """Row-tiled variant: grid (N, H_out/th), one image x th output rows per
    step. The input window is a 4D ELEMENT block (1, th_in, W, Cin) — th_in
    image rows incl. the halo, clamped in-bounds by the index map — the
    proven pallas_block.py discipline. A 2D element window would be the
    natural shape here, but it crashes the Mosaic compiler outright
    (measured on v5e: HTTP 500 at every size/alignment, while the same
    window as 4D + an in-kernel (1,th_in,W,C)->(th_in*W,C) cast compiles
    at C = 16/24/32/128 — small-C casts are legal; only LARGE unaligned C
    like 960 is rejected). Expansion recomputes the <=2 halo rows per
    tile, which is what keeps the expanded tensor out of HBM."""
    ep = s_ref.shape[-1]
    w_out = -(-w // stride)
    i = pl.program_id(1)

    @pl.when(jnp.logical_and(pl.program_id(0) == 0, i == 0))
    def _():
        s_ref[...] = jnp.zeros_like(s_ref)

    th_in = th + 2 if stride == 1 else 2 * th + 2
    cin = x_ref.shape[-1]
    xv = x_ref[...].reshape(th_in * w, cin)  # small-C cast: measured legal
    prec = (jax.lax.Precision.HIGHEST if ew_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    ye = jnp.dot(xv, ew_ref[...], preferred_element_type=jnp.float32,
                 precision=prec)
    ye = _act(ye + eb_ref[0].astype(jnp.float32), relu6)
    y4 = ye.astype(s_ref.dtype).reshape(th_in, w, ep)  # Ep-minor: legal cast

    # --- place the expanded rows into the zero-bordered scratch ------------
    # (position-dependent copies mirroring pallas_block._block_kernel g>1;
    # side cols were zeroed once and are never written after)
    if stride == 1:
        @pl.when(i == 0)
        def _():  # window = image rows [0, th+2); tile needs [-1, th+1)
            s_ref[1 : th + 2, 1 : w + 1, :] = y4[0 : th + 1]
            s_ref[0:1, 1 : w + 1, :] = jnp.zeros_like(
                s_ref[0:1, 1 : w + 1, :])

        if g > 2:
            @pl.when(jnp.logical_and(i > 0, i < g - 1))
            def _():  # window = image rows [ts-1, ts+th+1)
                s_ref[0 : th + 2, 1 : w + 1, :] = y4

        @pl.when(i == g - 1)
        def _():  # clamped window = image rows [ts-2, ts+th)
            s_ref[0 : th + 1, 1 : w + 1, :] = y4[1 : th + 2]
            s_ref[th + 1 : th + 2, 1 : w + 1, :] = jnp.zeros_like(
                s_ref[th + 1 : th + 2, 1 : w + 1, :])
    else:
        @pl.when(i < g - 1)
        def _():  # window = image rows [2ts, 2ts+2th+2)
            s_ref[0 : 2 * th + 2, 0:w, :] = y4

        @pl.when(i == g - 1)
        def _():  # clamped window = image rows [2ts-2, 2ts+2th)
            s_ref[0 : 2 * th, 0:w, :] = y4[2 : 2 * th + 2]
            s_ref[2 * th : 2 * th + 2, 0:w, :] = jnp.zeros_like(
                s_ref[2 * th : 2 * th + 2, 0:w, :])

    # --- 9-tap stencil + projection (3D twins of _ir_kernel) ---------------
    sv = s_ref[...]
    if stride == 1:
        acc = jnp.zeros((th, w, ep), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                tap = sv[dy : dy + th, dx : dx + w, :].astype(jnp.float32)
                acc = acc + tap * dww_ref[dy, dx, :].astype(jnp.float32)
    else:
        w_full = 2 * w_out
        pairs = sv.reshape(th + 1, 2, w + 2, ep)
        acc_f = jnp.zeros((th, w_full, ep), jnp.float32)
        for dy in range(3):
            r = pairs[dy // 2 : dy // 2 + th, dy % 2]
            for dx in range(3):
                tap = r[:, dx : dx + w_full, :].astype(jnp.float32)
                acc_f = acc_f + tap * dww_ref[dy, dx, :].astype(jnp.float32)
        acc = acc_f.reshape(th, w_out, 2, ep)[:, :, 0, :]

    y = _act(acc + dwb_ref[0].astype(jnp.float32), relu6)
    y2 = y.astype(pww_ref.dtype).reshape(th * w_out, ep)
    out = jnp.dot(y2, pww_ref[...], preferred_element_type=jnp.float32,
                  precision=prec)
    out = (out + pwb_ref[0].astype(jnp.float32)).astype(out_dtype)
    if not residual:
        o_ref[...] = out
        return
    # Residual: the tile's input rows sit at a position-dependent offset in
    # the halo window (0 / 1 / 2 rows for first / interior / last tile).
    thw = th * w

    @pl.when(i == 0)
    def _():
        o_ref[...] = out + xv[0:thw].astype(out_dtype)

    if g > 2:
        @pl.when(jnp.logical_and(i > 0, i < g - 1))
        def _():
            o_ref[...] = out + xv[w : w + thw].astype(out_dtype)

    @pl.when(i == g - 1)
    def _():
        o_ref[...] = out + xv[2 * w : 2 * w + thw].astype(out_dtype)


def inverted_residual_pallas(
    x, exp_w, exp_b, dw_w, dw_b, prj_w, prj_b, stride, residual,
    relu6=True, *, block_n: Optional[int] = None,
    block_th: Optional[int] = None, interpret=None,
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
                    block_n=block_n, block_th=block_th, interpret=interpret)


@functools.partial(
    jax.jit,
    static_argnames=("stride", "residual", "relu6", "block_n", "block_th",
                     "interpret"),
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
    block_th: Optional[int] = None,
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

    mode, tile = _mode(n, h, w, cin, e, cout, stride, x.dtype.itemsize)
    assert mode is not None, ("infeasible shape — gate calls with ir_fits",
                              n, h, w, cin, e, cout, stride)
    if mode == "whole" or block_n is not None:
        x_arg = x.reshape(n * h * w, cin)  # row-major bitcast, free in XLA
        if block_n is not None:
            bn = block_n
            assert n % bn == 0, (n, bn)
        else:
            bn = _pick_bn(n, h, w, cin, ep, cout, stride, x.dtype.itemsize)
        kernel = functools.partial(
            _ir_kernel, bn=bn, h=h, w=w, stride=stride, relu6=relu6,
            residual=residual, out_dtype=x.dtype,
        )
        grid = (n // bn,)
        x_spec = pl.BlockSpec((bn * h * w, cin), lambda b: (b, 0),
                              memory_space=pltpu.VMEM)
        o_spec = pl.BlockSpec((bn * h_out * w_out, cout), lambda b: (b, 0),
                              memory_space=pltpu.VMEM)
        w_index = lambda b: (0, 0)
        dw_index = lambda b: (0, 0, 0)
        scratch = pltpu.VMEM((bn, h + 2, w + 2, ep), x.dtype)
    else:
        x_arg = x  # 4D: rows mode windows with Element indexing
        th = tile if block_th is None else block_th
        assert h_out % th == 0, (h_out, th)
        g = h_out // th
        assert g >= 2, "rows mode needs >= 2 tiles; use whole-image for g == 1"
        if stride == 1:
            th_in = th + 2
            x_index = lambda b, i: (
                b, jnp.clip(i * th - 1, 0, h - (th + 2)), 0, 0)
        else:
            th_in = 2 * th + 2
            x_index = lambda b, i: (
                b, jnp.minimum(i * 2 * th, h - (2 * th + 2)), 0, 0)
        kernel = functools.partial(
            _ir_kernel_rows, th=th, h=h, w=w, stride=stride, relu6=relu6,
            residual=residual, out_dtype=x.dtype, g=g,
        )
        grid = (n, g)
        x_spec = pl.BlockSpec(
            (pl.Element(1), pl.Element(th_in), pl.Element(w), pl.Element(cin)),
            x_index, memory_space=pltpu.VMEM)
        o_spec = pl.BlockSpec((th * w_out, cout), lambda b, i: (b * g + i, 0),
                              memory_space=pltpu.VMEM)
        w_index = lambda b, i: (0, 0)
        dw_index = lambda b, i: (0, 0, 0)
        s_rows = th + 2 if stride == 1 else 2 * th + 2
        scratch = pltpu.VMEM((s_rows, w + 2, ep), x.dtype)

    out2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            x_spec,
            pl.BlockSpec((cin, ep), w_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ep), w_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, ep), dw_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ep), w_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((ep, cout), w_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), w_index, memory_space=pltpu.VMEM),
        ],
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((n * h_out * w_out, cout), x.dtype),
        scratch_shapes=[scratch],
        interpret=interpret,
    )(x_arg, exp_w, exp_b.reshape(1, ep), dw_w, dw_b.reshape(1, ep),
      prj_w, prj_b.reshape(1, cout))
    return out2.reshape(n, h_out, w_out, cout)
