"""Pallas stem kernel: the 3x3 s2 stem conv as a packed 2x2 MXU conv.

STATUS: experimental, NOT routed — measured 4.2 ms standalone per 256-batch
vs 3.9 ms for XLA's native conv, and 18.3k vs 23.1k img/s e2e when swapped
into the full fused model (4-round interleaved medians) — XLA's conv1 +
cross-stage pipelining wins decisively. The stem+block0 mega-fusion built on
this kernel (pallas_stem_b0.py) also measured slower (docs/design.md
SS3.3c). Kept as the tested record of the approach.

Reference analog: C3, the standard-conv OpenCL kernel (SURVEY.md SS2). The
stem is awkward on TPU: Cin=3 leaves the lane axis 2% occupied and XLA's
conv runs it in ~1.7 ms per 256-batch. TPU-native reformulation:

  1. space-to-depth 2x2 (XLA): (N,224,224,3) -> (N,112,112,12), zero-padded
     to 16 channels. The stride-2 stem conv becomes a STRIDE-1 2x2 conv over
     16 "channels" (weights (2,2,16,32): w2[cy,cx,(hp,wp,c)] = k[2cy+hp,
     2cx+wp, c], zero where the 3x3 tap does not exist).
  2. lane-pack R=8 (free reshape): (N,112,14,128).
  3. Pallas kernel: 4 taps (cy,cx in {0,1}^2) built from ONE lane roll (+16)
     with cross-group fixup and row slices of a high-bordered scratch, each
     fed to the MXU against block-diagonal kron(I_8, w2[cy,cx]) (128, 256)
     weights — K stays the full 128 lanes.
  4. output (N,112,14,256) reshapes (free) to the R=4 packed layout of
     block 0's 32-channel input, so the stem chains straight into the packed
     block-0 kernel with zero layout cost.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_dw import _should_interpret

C16 = 16  # s2d channels (12 real + 4 zero pad)
R = 8  # 128 // C16


def prepare_stem_weights(w: np.ndarray, bias: np.ndarray):
    """(3,3,3,Cout) HWIO stem weights -> (4, 128, 8*Cout) block-diag packed
    2x2-cell matrices (tap order (cy,cx) = 00,01,10,11) + tiled bias."""
    w = np.asarray(w, np.float32)
    cout = w.shape[3]
    w2 = np.zeros((2, 2, C16, cout), np.float32)
    for cy in range(2):
        for hp in range(2):
            dy = 2 * cy + hp
            if dy > 2:
                continue
            for cx in range(2):
                for wp in range(2):
                    dx = 2 * cx + wp
                    if dx > 2:
                        continue
                    w2[cy, cx, (hp * 2 + wp) * 3 : (hp * 2 + wp) * 3 + 3] = w[dy, dx]
    eye = np.eye(R, dtype=np.float32)
    mats = np.stack(
        [np.kron(eye, w2[cy, cx]) for cy in range(2) for cx in range(2)]
    )  # (4, 128, 8*Cout)
    bias_t = np.tile(np.asarray(bias, np.float32)[None, :], (1, R))
    return mats, bias_t


def s2d_pack(x: jax.Array) -> jax.Array:
    """(N,224,224,3)->(N,112,14,128): space-to-depth + pad 12->16 + lane pack.

    s2d channel layout: (hp*2+wp)*3 + c, padded with 4 zero channels.
    """
    n, h, w, c = x.shape
    xs = x.reshape(n, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    xs = xs.reshape(n, h // 2, w // 2, 4 * c)
    xs = jnp.pad(xs, ((0, 0), (0, 0), (0, 0), (0, C16 - 4 * c)))
    return xs.reshape(n, h // 2, (w // 2) * C16 // 128, 128)


def build_stem_tap_mats(w: jax.Array, cout: int, dtype) -> jax.Array:
    """Traced twin of prepare_stem_weights: (3,3,3,Cout) HWIO stem weights ->
    (4, 128, 8*Cout) block-diagonal packed 2x2-cell tap matrices (tap order
    (cy,cx) = 00,01,10,11). Shared by stem_conv_packed and the stem+block0
    mega-kernel so the s2d channel-layout convention lives in ONE place."""
    wf = w.astype(jnp.float32)
    w2 = jnp.zeros((2, 2, C16, cout), jnp.float32)
    for cy in range(2):
        for hp in range(2):
            dy = 2 * cy + hp
            if dy > 2:
                continue
            for cx in range(2):
                for wp in range(2):
                    dx = 2 * cx + wp
                    if dx > 2:
                        continue
                    w2 = w2.at[cy, cx, (hp * 2 + wp) * 3 : (hp * 2 + wp) * 3 + 3].set(
                        wf[dy, dx])
    eye = jnp.eye(R, dtype=dtype)
    return jnp.stack(
        [jnp.kron(eye, w2[cy, cx].astype(dtype)) for cy in range(2) for cx in range(2)]
    )


def _stem_kernel(x_ref, w_ref, b_ref, o_ref, s_ref, *, hh, w4, cout, relu6, bn):
    is_first_step = pl.program_id(0) == 0

    @pl.when(is_first_step)
    def _():
        s_ref[...] = jnp.zeros_like(s_ref)

    s_ref[:, 0:hh, 0:w4, :] = x_ref[...]  # row hh / col w4 stay zero borders

    sv = s_ref[...].astype(jnp.float32)  # (BN, hh+1, w4+1, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 128), 3)
    rolled = pltpu.roll(sv, 128 - C16, axis=3)  # cell w+1 at slot w (j < R-1)
    nxt = jnp.pad(rolled[:, :, 1:, :], ((0, 0), (0, 0), (0, 1), (0, 0)))
    right = jnp.where(lane // C16 == R - 1, nxt, rolled)

    def tap(cy, cx):
        base = sv if cx == 0 else right
        return base[:, cy : cy + hh, 0:w4, :]

    m = bn * hh * w4
    prec = (
        jax.lax.Precision.HIGHEST
        if w_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    acc = jnp.zeros((m, R * cout), jnp.float32)
    for t, (cy, cx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        acc = acc + jnp.dot(
            tap(cy, cx).reshape(m, 128).astype(w_ref.dtype), w_ref[t],
            preferred_element_type=jnp.float32, precision=prec,
        )
    acc = acc + b_ref[0].astype(jnp.float32)
    acc = jnp.maximum(acc, 0.0)
    if relu6:
        acc = jnp.minimum(acc, 6.0)
    o_ref[...] = acc.reshape(bn, hh, w4, R * cout).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("cout", "relu6", "interpret"))
def stem_conv_packed(
    x: jax.Array,         # (N, 224, 224, 3) preprocessed float
    w: jax.Array,         # (3, 3, 3, Cout) HWIO (folded BN)
    bias: jax.Array,      # (Cout,)
    cout: int,
    relu6: bool = True,
    *,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Stem 3x3 s2 conv + bias + ReLU(6). Returns (N, H/2, W/2, Cout)."""
    if interpret is None:
        interpret = _should_interpret()
    n, h, wdim, cin = x.shape
    assert cin == 3 and h % 2 == 0 and wdim % 2 == 0
    hh, ww = h // 2, wdim // 2
    assert (ww * C16) % 128 == 0, ww
    w4 = ww * C16 // 128

    xp = s2d_pack(x)
    # build the tap matrices on-device (weights may be traced values); the
    # NumPy twin prepare_stem_weights documents/tests the same mapping.
    wmats = build_stem_tap_mats(w, cout, x.dtype)
    bt = jnp.tile(bias.reshape(1, cout), (1, R)).astype(x.dtype)

    bn = 1
    kernel = functools.partial(
        _stem_kernel, hh=hh, w4=w4, cout=cout, relu6=relu6, bn=bn,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(bn), pl.Element(hh), pl.Element(w4), pl.Element(128)),
                lambda b_: (b_ * bn, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((4, 128, R * cout), lambda b_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R * cout), lambda b_: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bn, hh, w4, R * cout), lambda b_: (b_, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, hh, w4, R * cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((bn, hh + 1, w4 + 1, 128), x.dtype)],
        interpret=interpret,
    )(xp, wmats, bt)
    # (N, hh, w4, 8*Cout) -> (N, hh, ww, Cout): contiguous pixel-major regroup
    return out.reshape(n, hh, ww, cout)
