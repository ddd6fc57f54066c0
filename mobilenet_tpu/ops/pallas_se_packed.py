"""Lane-packed fused V3 SE bottleneck (stride 1): expand -> dw kxk -> SE
-> project (+ residual), with R = 128/Cp pixels per 128-lane vector.

The mid-network V3 SE blocks run at channel counts far below the lane
width (V3-Large b4/b5: Cin = 40 at 28², E = 120): the dense whole-image
kernel (ops/pallas_ir_v3.py) reads (…, 40) element windows at 31% lane
occupancy — measured 1.11 + 1.43 ms/batch-256 in-network against 0.18 ms
floors (benchmarks/roofline_v5e.md, 2026-08-19 map). This kernel
lane-packs R pixels per vector (the §3.3 layout: lane = j*Cp + c after
zero-padding Cin to the next power-of-two lane divisor Cp):

  * expand: ONE kron(I_R, We) MXU matmul per tile — K = 128 full lanes;
    the expanded activations live in VMEM f32 at EE = R*Ep lanes per
    column group (Ep = E zero-padded so R*Ep % 128 == 0).
  * dw kxk: row taps are window row slices; a column tap at pixel delta
    d decomposes as d = cs*R + j0 — a free column-group slice (cs) plus,
    for j0 > 0, a lane roll by j0*Ep whose top j0 pixel slots pull from
    the next column slice (the §3.3b tap algebra at the expanded width).
  * SE (whole-image tiles only, like the dense kernel): the global pool
    folds the R pixel slots with a lane-slice add, the two SE matmuls
    run on (BN, Ep), and the gate broadcasts back by lane tiling.
  * projection: kron(I_R, Wp) emits the packed layout of the padded
    Cout; the residual joins in the packed domain (identical layout
    when Cp == Cout_p).

Numerics: the dense kernel's op order (f32 accumulation, named acts in
f32; zero-padded channels contribute exact zeros, padded SE lanes gate
zeros — ops/pallas_ir_v3._se_gate's argument), so outputs sit in the
routing-tolerance class, gated like every fused route.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_dw import _should_interpret
from .pallas_ir_v3 import _kact


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def se_packed_geometry(cin: int, e: int, cout: int, w: int, k: int,
                       stride: int):
    """(cp, ep, cout_p, r) for the packed SE kernel, or None if
    ineligible: stride 1, odd k, Cp = next power-of-two >= cin with
    2 <= R = 128/Cp, lane-aligned packed width, and Ep/Cout_p paddings
    making R*Ep and R*Cout_p multiples of 128."""
    if stride != 1 or k % 2 == 0 or cin < 1:
        return None
    cp = 1
    while cp < cin:
        cp *= 2
    if cp >= 128 or 128 % cp:
        return None
    r = 128 // cp
    step = 128 // r
    ep = _round_up(e, step)
    cout_p = _round_up(cout, step)
    if (w * cp) % 128:
        return None
    return cp, ep, cout_p, r


def _vmem_est(bn, h, w4, ee, k, r, itm):
    half = k // 2
    cg = -(-half // r)  # the kernel's zero column-group border per side
    w4p = w4 + 2 * cg
    rows = h + 2 * half
    u_x = bn * h * w4 * 128 * itm * 2          # pipelined in blocks
    u_z = bn * rows * w4p * ee * 4             # padded expanded window
    u_roll = bn * rows * w4p * ee * 4          # one live rolled copy
    u_tap = bn * h * w4 * ee * 4 * 2           # tap select + product
    u_acc = bn * h * w4 * ee * 4
    u_out = bn * h * w4 * 128 * (4 + itm * 3)
    wts = (128 * ee + ee * 130 + 4 * ee) * itm
    return int(1.15 * (u_x + u_z + u_roll + u_tap + u_acc + u_out)) + wts


def se_packed_fits(n, h, w, cin, e, cout, k, stride, itemsize=2) -> bool:
    geo = se_packed_geometry(cin, e, cout, w, k, stride)
    if geo is None:
        return False
    cp, ep, _cout_p, r = geo
    w4 = w * cp // 128
    return _vmem_est(1, h, w4, r * ep, k, r, itemsize) <= int(13 * 2**20)


def _se_packed_kernel(
    x_ref, kw_ref, eb_ref, dww_ref, dwb_ref, ssel_ref, s1w_ref, s1b_ref,
    s2w_ref, s2b_ref, pww_ref, pwb_ref, o_ref,
    *, bn, h, w4, r, ep, k, act, residual, hw_inv, out_dtype, se, oc,
):
    ee = r * ep
    half = k // 2
    cg = -(-half // r)      # zero column-group border on each side
    w4p = w4 + 2 * cg

    xv = x_ref[...]  # (BN, H, W4, 128)
    prec = (jax.lax.Precision.HIGHEST if kw_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    zexp = jnp.dot(xv.reshape(bn * h * w4, 128).astype(kw_ref.dtype),
                   kw_ref[...], preferred_element_type=jnp.float32,
                   precision=prec)
    zexp = _kact(zexp + eb_ref[0].astype(jnp.float32), act)
    # zero-bordered expanded window: rows +-half, col groups +-cg. SAME
    # padding pads the post-activation tensor with zeros — exact.
    z = jnp.pad(zexp.reshape(bn, h, w4, ee),
                ((0, 0), (half, half), (cg, cg), (0, 0)))

    # one rolled copy per distinct nonzero j0 = delta mod r
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, ee), 3)
    rolled = {}
    for dx in range(k):
        j0 = (dx - half) % r
        if j0 and j0 not in rolled:
            # slot j reads pixel j + j0 of the same group (wrapped)
            rolled[j0] = pltpu.roll(z, ee - j0 * ep, axis=3)

    acc = jnp.zeros((bn, h, w4, ee), jnp.float32)
    for dy in range(k):
        for dx in range(k):
            delta = dx - half
            j0 = delta % r
            cs = (delta - j0) // r
            lo = cg + cs
            if j0 == 0:
                t = z[:, dy : dy + h, lo : lo + w4, :]
            else:
                rl = rolled[j0]
                r1 = rl[:, dy : dy + h, lo : lo + w4, :]
                r2 = rl[:, dy : dy + h, lo + 1 : lo + 1 + w4, :]
                # top j0 pixel slots wrapped — take the next column's
                t = jnp.where(lane >= (r - j0) * ep, r2, r1)
            acc = acc + t * dww_ref[dy, dx, :].astype(jnp.float32)
    y = _kact(acc + dwb_ref[0].astype(jnp.float32), act)

    if se:
        ysum = jnp.sum(y, axis=(1, 2))                      # (BN, EE)
        # Lane -> channel fold via the 0/1 selection-sum MXU dot (the
        # packed SE s2 kernel's proven pattern): reshape(bn, r, ep) is a
        # LANE-splitting shape cast Mosaic rejects at some geometries
        # (hw-found at Small b6/b7: vector<8x384> -> 8x2x192 'unsupported
        # shape cast'). Precision.HIGHEST is mandatory — a default f32
        # dot lowers to a SINGLE-PASS bf16 matmul in Mosaic and loses
        # the pooled sums' low bits (memory: tpu-pallas-gotchas).
        pooled = jnp.dot(ysum, ssel_ref[...],
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST) * hw_inv
        g = jnp.dot(pooled.astype(s1w_ref.dtype), s1w_ref[...],
                    preferred_element_type=jnp.float32, precision=prec)
        g = jnp.maximum(g + s1b_ref[0].astype(jnp.float32), 0.0)
        g = jnp.dot(g.astype(s2w_ref.dtype), s2w_ref[...],
                    preferred_element_type=jnp.float32, precision=prec)
        g = g + s2b_ref[0].astype(jnp.float32)
        gate = jnp.clip(g + 3.0, 0.0, 6.0) * (1.0 / 6.0)    # (BN, Ep)
        y = y * jnp.tile(gate, (1, r))[:, None, None, :]

    y2 = y.astype(pww_ref.dtype).reshape(bn * h * w4, ee)
    out = jnp.dot(y2, pww_ref[...], preferred_element_type=jnp.float32,
                  precision=prec)
    out = out + pwb_ref[0].astype(jnp.float32)
    if residual:
        out = out + xv.reshape(bn * h * w4, oc).astype(jnp.float32)
    o_ref[...] = out.reshape(bn, h, w4, oc).astype(out_dtype)


def se_block_packed(
    x_packed: jax.Array,   # (N, H, W*Cp/128, 128), lane = j*Cp + c
    exp_w: jax.Array,      # (Cp, E) rows zero-padded to Cp
    exp_b: jax.Array,      # (E,)
    dw_w: jax.Array,       # (k, k, 1, E)
    dw_b: jax.Array,       # (E,)
    se_w1, se_b1, se_w2, se_b2,  # (E, S), (S,), (S, E), (E,) or None
    pw_w: jax.Array,       # (E, Cout)
    pw_b: jax.Array,       # (Cout,)
    cin: int,              # Cp (the padded lane divisor)
    k: int,
    act: str,
    residual: bool,
    se_width: int,
    *,
    block_n: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Fused act(expand) -> dw kxk s1 -> [SE] -> linear projection
    [+ residual] on an R-lane-packed input. Returns (N, H, W4, R*Cout_p)
    — the packed layout of the zero-padded Cout (reshapes freely to
    NHWC of Cout_p). residual requires Cout_p == Cp.

    interpret=None resolves HERE (outside the jit, the expand-s2 kernel's
    pattern) so backend flips are never masked by a stale trace cache."""
    if interpret is None:
        interpret = _should_interpret()
    return _se_block_packed_jit(
        x_packed, exp_w, exp_b, dw_w, dw_b, se_w1, se_b1, se_w2, se_b2,
        pw_w, pw_b, cin, k, act, residual, se_width,
        block_n=block_n, interpret=interpret)


@functools.partial(
    jax.jit,
    static_argnames=("cin", "k", "act", "residual", "se_width", "block_n",
                     "interpret"),
)
def _se_block_packed_jit(
    x_packed, exp_w, exp_b, dw_w, dw_b, se_w1, se_b1, se_w2, se_b2,
    pw_w, pw_b, cin, k, act, residual, se_width,
    *,
    block_n: Optional[int],
    interpret: bool,
) -> jax.Array:
    n, h, w4, lanes = x_packed.shape
    assert lanes == 128 and 128 % cin == 0
    r = 128 // cin
    e = int(exp_w.shape[1])
    cout = int(pw_w.shape[1])
    step = 128 // r
    ep = _round_up(e, step)
    cout_p = _round_up(cout, step)
    ee = r * ep
    oc = r * cout_p
    assert ee % 128 == 0 and oc % 128 == 0, (ee, oc)
    if residual:
        assert cout_p == cin, (cout_p, cin)
    dt = x_packed.dtype
    itm = jnp.dtype(dt).itemsize

    bn = block_n or 1
    if block_n is None:
        cap = int(13 * 2**20)
        while (bn * 2 <= n and n % (bn * 2) == 0 and bn * h * w4 < 512
               and _vmem_est(bn * 2, h, w4, ee, k, r, itm) <= cap):
            bn *= 2
    while n % bn:
        bn -= 1

    if ep != e:
        exp_w = jnp.pad(exp_w, ((0, 0), (0, ep - e)))
        exp_b = jnp.pad(exp_b, (0, ep - e))
        dw_w = jnp.pad(dw_w, ((0, 0), (0, 0), (0, 0), (0, ep - e)))
        dw_b = jnp.pad(dw_b, (0, ep - e))
        pw_w = jnp.pad(pw_w, ((0, ep - e), (0, 0)))
        if se_width:
            se_w1 = jnp.pad(se_w1, ((0, ep - e), (0, 0)))
            se_w2 = jnp.pad(se_w2, ((0, 0), (0, ep - e)))
            se_b2 = jnp.pad(se_b2, (0, ep - e))
    if cout_p != cout:
        pw_w = jnp.pad(pw_w, ((0, 0), (0, cout_p - cout)))
        pw_b = jnp.pad(pw_b, (0, cout_p - cout))

    kw = jnp.kron(jnp.eye(r, dtype=exp_w.dtype), exp_w).astype(dt)
    ebE = jnp.tile(exp_b.reshape(1, ep), (1, r))
    dww = jnp.tile(dw_w.reshape(k, k, ep), (1, 1, r))
    dwb = jnp.tile(dw_b.reshape(1, ep), (1, r))
    pww = jnp.kron(jnp.eye(r, dtype=pw_w.dtype), pw_w).astype(dt)
    pwb = jnp.tile(pw_b.reshape(1, cout_p), (1, r))
    se = int(se_width)
    if not se:  # placeholder refs keep the arg list static
        se_w1 = jnp.zeros((ep, 8), dt)
        se_b1 = jnp.zeros((8,), jnp.float32)
        se_w2 = jnp.zeros((8, ep), dt)
        se_b2 = jnp.zeros((ep,), jnp.float32)
        sw = 8
    else:
        sw = se
        se_w1 = se_w1.astype(dt)
        se_w2 = se_w2.astype(dt)

    ssel = jnp.tile(jnp.eye(ep, dtype=jnp.float32), (r, 1))  # (EE, Ep)
    kernel = functools.partial(
        _se_packed_kernel, bn=bn, h=h, w4=w4, r=r, ep=ep, k=k, act=act,
        residual=residual, hw_inv=1.0 / float(h * w4 * r), out_dtype=dt,
        se=se, oc=oc,
    )
    cspec = lambda shape: pl.BlockSpec(shape, lambda b: tuple(
        0 for _ in shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((bn, h, w4, 128), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            cspec((128, ee)),
            cspec((1, ee)),
            pl.BlockSpec((k, k, ee), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            cspec((1, ee)),
            cspec((ee, ep)),
            cspec((ep, sw)),
            cspec((1, sw)),
            cspec((sw, ep)),
            cspec((1, ep)),
            cspec((ee, oc)),
            cspec((1, oc)),
        ],
        out_specs=pl.BlockSpec((bn, h, w4, oc), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w4, oc), dt),
        interpret=interpret,
    )(x_packed, kw, ebE, dww, dwb, ssel, se_w1, se_b1.reshape(1, -1),
      se_w2, se_b2.reshape(1, -1), pww, pwb)
