"""Mega-kernel: preprocess-normalize + stem conv + block-0 dw+pw, fused.

The first three stages of the network all run whole-image row tiles, so they
chain inside ONE Pallas call with zero intermediate HBM traffic:

    s2d-packed uint8 (N, H/2, W/2*16/128, 128)
      --in-kernel normalize (x/127.5 - 1; zero borders in the NORMALIZED
        domain, so TF-SAME padding stays exact)-->
      --stem 2x2 packed conv: 4 taps x MXU (128, 8*C1) block-diag mats-->
      stem activations (H/2, W4, 8*C1 lanes) in VMEM
      --block-0 dw 3x3: 9 taps on (8*C1)-lane vectors (lane rolls +-C1)-->
      --block-0 pw: MXU (8*C1, 8*Cout) block-diag--> out (N, H/2, W', 128)

This replaces: the XLA normalize pass, the XLA stem conv (+ its 205 MB/batch
output round trip), and the separate packed block-0 kernel. Requires
C1 == 32 (alpha = 1.0, or alpha = 0.75 after channel padding) so the stem
output lanes are 8*32 = 256; host-side weight prep handles BN folding
upstream. Outside callers use `stem_block0_fused` which also does the
space-to-depth on the uint8 input (a cheap XLA transpose).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import PREPROCESS_OFFSET, PREPROCESS_SCALE
from .pallas_dw import _should_interpret
from .pallas_stem import (  # shared s2d layout convention + tap-matrix prep
    C16, R, build_stem_tap_mats, s2d_pack,
)

C1 = 32           # stem output channels (alpha=1.0 / padded 0.75)
STEM_LANES = R * C1  # 256


def _kernel(x_ref, sw_ref, sb_ref, dww_ref, dwb_ref, pww_ref, pwb_ref,
            o_ref, s_ref, s2_ref, *, hh, w4, cout, relu6, bn, out_cols, dtype):
    @pl.when(pl.program_id(0) == 0)
    def _():
        s_ref[...] = jnp.zeros_like(s_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)

    # --- normalize into the zero-bordered f32 scratch (borders must be 0
    # AFTER normalization for TF-SAME correctness) ---------------------------
    # Mosaic cannot cast u8 -> f32 directly; widen through i32 (same family
    # as the int8 shape-cast limit, docs/design.md SS3.3b).
    xn = (x_ref[...].astype(jnp.int32).astype(jnp.float32)
          * PREPROCESS_SCALE + PREPROCESS_OFFSET)
    s_ref[:, 0:hh, 0:w4, :] = xn
    sv = s_ref[...]  # (BN, hh+1, w4+1, 128) f32

    # --- stem: 4-tap packed 2x2 conv on the MXU -----------------------------
    lane16 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 128), 3)
    rolled = pltpu.roll(sv, 128 - C16, axis=3)
    nxt = jnp.pad(rolled[:, :, 1:, :], ((0, 0), (0, 0), (0, 1), (0, 0)))
    right = jnp.where(lane16 // C16 == R - 1, nxt, rolled)

    m = bn * hh * w4
    prec = (
        jax.lax.Precision.HIGHEST if sw_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    acc = jnp.zeros((m, STEM_LANES), jnp.float32)
    for t, (cy, cx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        base = sv if cx == 0 else right
        tap = base[:, cy : cy + hh, 0:w4, :].astype(sw_ref.dtype)
        acc = acc + jnp.dot(tap.reshape(m, 128), sw_ref[t],
                            preferred_element_type=jnp.float32, precision=prec)
    acc = acc + sb_ref[0].astype(jnp.float32)
    acc = jnp.maximum(acc, 0.0)
    if relu6:
        acc = jnp.minimum(acc, 6.0)

    # --- block-0 dw on 256-lane stem activations ---------------------------
    # s2 scratch rows cover stem rows [-1, hh]; zero borders persist.
    s2_ref[:, 1 : hh + 1, 0:w4, :] = acc.reshape(bn, hh, w4, STEM_LANES).astype(
        s2_ref.dtype)
    y0 = s2_ref[...].astype(jnp.float32)  # (BN, hh+2, w4+1, 256)

    lane256 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, STEM_LANES), 3)
    group = lane256 // C1
    rl = pltpu.roll(y0, STEM_LANES - C1, axis=3)  # pixel j+1 at slot j
    left = jnp.where(
        group == R - 1,
        jnp.pad(rl[:, :, 1:, :], ((0, 0), (0, 0), (0, 1), (0, 0))),
        rl,
    )
    rr = pltpu.roll(y0, C1, axis=3)  # pixel j-1 at slot j
    right0 = jnp.where(
        group == 0,
        jnp.pad(rr[:, :, :-1, :], ((0, 0), (0, 0), (1, 0), (0, 0))),
        rr,
    )
    taps = (right0, y0, left)

    acc0 = jnp.zeros((bn, hh, w4, STEM_LANES), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            t = taps[dx][:, dy : dy + hh, 0:w4, :]
            acc0 = acc0 + t * dww_ref[dy, dx, :].astype(jnp.float32)
    y = acc0 + dwb_ref[0].astype(jnp.float32)
    y = jnp.maximum(y, 0.0)
    if relu6:
        y = jnp.minimum(y, 6.0)

    # --- block-0 pw: (M, 256) @ (256, 8*Cout) ------------------------------
    y2 = y.astype(pww_ref.dtype).reshape(m, STEM_LANES)
    out = jnp.dot(y2, pww_ref[...], preferred_element_type=jnp.float32,
                  precision=prec)
    out = out + pwb_ref[0].astype(jnp.float32)
    out = jnp.maximum(out, 0.0)
    if relu6:
        out = jnp.minimum(out, 6.0)
    o_ref[...] = out.reshape(bn, hh, out_cols, 128).astype(dtype)


@functools.partial(jax.jit, static_argnames=("cout", "relu6", "interpret"))
def stem_block0_fused(
    images_u8: jax.Array,   # (N, 224-ish, even, 3) uint8 at model resolution
    stem_w: jax.Array,      # (3, 3, 3, C1) folded stem weights
    stem_b: jax.Array,      # (C1,)
    dw_w: jax.Array,        # (3, 3, 1, C1) block-0 depthwise
    dw_b: jax.Array,
    pw_w: jax.Array,        # (C1, Cout) block-0 pointwise
    pw_b: jax.Array,
    cout: int,
    relu6: bool = True,
    *,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """uint8 images -> block-0 output (N, H/2, W/2*Cout/128 cols, 128),
    the packed layout of Cout (dense NHWC after a free reshape when
    Cout >= 128; use ops.pallas_block_packed.unpack)."""
    if interpret is None:
        interpret = _should_interpret()
    n, h, wdim, cin3 = images_u8.shape
    assert cin3 == 3 and h % 2 == 0 and wdim % 2 == 0
    assert stem_w.shape[3] == C1, stem_w.shape
    hh, ww = h // 2, wdim // 2
    assert (ww * C16) % 128 == 0 and (R * cout) % 128 == 0
    w4 = ww * C16 // 128
    out_cols = w4 * (R * cout) // 128

    xp = s2d_pack(images_u8)

    dtype = pw_w.dtype
    smats = build_stem_tap_mats(stem_w, C1, dtype)  # (4, 128, 256)
    sb = jnp.tile(stem_b.reshape(1, C1), (1, R)).astype(dtype)
    dww = jnp.tile(dw_w.reshape(3, 3, C1), (1, 1, R))
    dwb = jnp.tile(dw_b.reshape(1, C1), (1, R))
    pww = jnp.kron(jnp.eye(R, dtype=dtype), pw_w)  # (256, 8*Cout)
    pwb = jnp.tile(pw_b.reshape(1, cout), (1, R))

    bn = 1
    kernel = functools.partial(
        _kernel, hh=hh, w4=w4, cout=cout, relu6=relu6, bn=bn,
        out_cols=out_cols, dtype=dtype,
    )
    return pl.pallas_call(
        kernel,
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(bn), pl.Element(hh), pl.Element(w4), pl.Element(128)),
                lambda b_: (b_ * bn, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((4, 128, STEM_LANES), lambda b_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, STEM_LANES), lambda b_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, STEM_LANES), lambda b_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, STEM_LANES), lambda b_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((STEM_LANES, R * cout), lambda b_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R * cout), lambda b_: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bn, hh, out_cols, 128), lambda b_: (b_, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, hh, out_cols, 128), dtype),
        scratch_shapes=[
            pltpu.VMEM((bn, hh + 1, w4 + 1, 128), jnp.float32),
            pltpu.VMEM((bn, hh + 2, w4 + 1, STEM_LANES), dtype),
        ],
        interpret=interpret,
    )(xp, smats, sb, dww, dwb, pww, pwb)
