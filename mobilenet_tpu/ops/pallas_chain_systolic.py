"""Systolic software-pipelined multi-block chain kernel.

The round-1 chain kernel (ops/pallas_chain.py) ran K blocks back-to-back on
ONE tile per grid step: zero intermediate HBM traffic, but the in-kernel
stages form a serial dependency chain, and it measured SLOWER than separate
calls (2.97 vs 2.61 ms on the 14x14x512 stretch) — the lost overlap outweighed
the saved bandwidth.

This kernel fixes the dependency structure with a software pipeline: grid
step i runs stage k on TILE i-k (k = 0..K-1), so the K stage computations in
one step touch K DIFFERENT tiles and are data-independent — the scheduler
can overlap one stage's MXU matmul with another's VPU stencil — while
intermediates still live only in VMEM:

    step i:   stage K-1 reads acts[K-2] (tile i-K+1) -> writes o_ref
              stage K-2 reads acts[K-3]              -> writes acts[K-2]
              ...         (reverse order: consume before overwrite)
              stage 0   reads x tile i               -> writes acts[0]

Tiles are whole images (the stretch lives at 14x14 where a few images of
activations fit in VMEM), so halos are zero borders only — no inter-tile
halo logic. Grid = T + K - 1 steps (pipeline fill/drain guarded by pl.when;
the clamped output index only re-targets tile 0 before its real write).

Reference analog: the five identical 14x14, C->C, stride-1 separable blocks
(SURVEY.md SS2 layers 14-23); this is the "software-pipelined chain" future
item of docs/design.md SS5.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_dw import _should_interpret

# Routing flag (resolved at trace time; measured on v5e before enabling).
CHAIN_SYSTOLIC_F = False

# Scoped-VMEM budget the byte model is checked against (per CLAUDE.md an
# out-of-bounds window CRASHES the device for ~2 min, so eligibility is
# rejected in Python, never discovered on hw).
VMEM_CAP = int(16.3 * 2**20)


def _vmem_est(bn: int, hh: int, ww: int, c: int, k_blocks: int, itm: int) -> int:
    """Byte model of the kernel's VMEM residency at batch-tile bn."""
    u_act = bn * hh * ww * c
    u_win = bn * (hh + 2) * (ww + 2) * c
    # 2 pipelined ins + (K-1) inter-stage acts + win + 2 outs (dtype)
    # + f32 acc/sv temporaries + weights
    return ((2 * u_act + (k_blocks - 1) * u_act + u_win + 2 * u_act) * itm
            + (u_win + u_act) * 4
            + k_blocks * (9 * c + 2 * c + c * c) * itm)


def chain_fits(hh: int, ww: int, c: int, k_blocks: int, itemsize: int) -> bool:
    """True when even the bn=1 base case of a K-block chain fits VMEM.

    Routing must call this before marking a run chain-eligible: the bn
    auto-grow loop in chain_systolic only gates DOUBLING (est(bn*2) < cap),
    so without this check a nonstandard (resolution, C) combination could
    enter the kernel with est(1) already over the cap."""
    return _vmem_est(1, hh, ww, c, k_blocks, itemsize) < VMEM_CAP


def _act(y, relu6):
    y = jnp.maximum(y, 0.0)
    if relu6:
        y = jnp.minimum(y, 6.0)
    return y


def _systolic_kernel(x_ref, dww_ref, dwb_ref, pww_ref, pwb_ref, o_ref,
                     acts_ref, win_ref, *, k_blocks, hh, ww, bn, c, relu6,
                     t_tiles, out_dtype):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        # Zero once: stage fills only rewrite the interior, so the window's
        # zero borders (TF-SAME padding) persist across steps and stages.
        win_ref[...] = jnp.zeros_like(win_ref)

    prec = (jax.lax.Precision.HIGHEST if pww_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    for k in reversed(range(k_blocks)):
        @pl.when(jnp.logical_and(i >= k, i < k + t_tiles))
        def _(k=k):
            src = x_ref[...] if k == 0 else acts_ref[k - 1]
            win_ref[:, 1 : hh + 1, 1 : ww + 1, :] = src
            sv = win_ref[...].astype(jnp.float32)
            acc = jnp.zeros((bn, hh, ww, c), jnp.float32)
            for dy in range(3):
                for dx in range(3):
                    tap = sv[:, dy : dy + hh, dx : dx + ww, :]
                    acc = acc + tap * dww_ref[k, dy, dx, :].astype(jnp.float32)
            y = _act(acc + dwb_ref[k, 0].astype(jnp.float32), relu6)
            y2 = y.astype(pww_ref.dtype).reshape(bn * hh * ww, c)
            out = jnp.dot(y2, pww_ref[k], preferred_element_type=jnp.float32,
                          precision=prec)
            out = _act(out + pwb_ref[k, 0].astype(jnp.float32), relu6)
            out = out.reshape(bn, hh, ww, c).astype(out_dtype)
            if k == k_blocks - 1:
                o_ref[...] = out
            else:
                acts_ref[k] = out


@functools.partial(
    jax.jit,
    static_argnames=("relu6", "block_n", "interpret"),
)
def chain_systolic(
    x: jax.Array,        # (N, H, W, C) dense activations (H, W small)
    dw_ws: jax.Array,    # (K, 3, 3, C)   per-block depthwise weights
    dw_bs: jax.Array,    # (K, C)
    pw_ws: jax.Array,    # (K, C, C)      per-block pointwise weights
    pw_bs: jax.Array,    # (K, C)
    relu6: bool = True,
    *,
    block_n: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Run K identical-shape (C -> C, stride 1) fused dw+pw blocks as one
    software-pipelined kernel. Requires the whole (BN, H+2, W+2, C) window
    plus K-1 inter-stage activations to fit VMEM (the 14x14/7x7 stretch)."""
    if interpret is None:
        interpret = _should_interpret()
    n, hh, ww, c = x.shape
    k_blocks = int(dw_ws.shape[0])
    assert dw_ws.shape == (k_blocks, 3, 3, c), dw_ws.shape
    assert pw_ws.shape == (k_blocks, c, c), pw_ws.shape
    itm = jnp.dtype(x.dtype).itemsize

    def est(bn_):
        return _vmem_est(bn_, hh, ww, c, k_blocks, itm)

    cap = VMEM_CAP
    if est(1) >= cap:
        # Refuse rather than crash the device (~2 min FailedPrecondition
        # storm): routing should have filtered this via chain_fits.
        raise ValueError(
            f"chain_systolic: bn=1 base case needs ~{est(1)} B VMEM "
            f"(cap {cap}); shape ({n},{hh},{ww},{c}) x {k_blocks} blocks is "
            "not chain-eligible — route per-block kernels instead")
    bn = block_n or 1
    if block_n is None:
        # grow while the RESULTING tile stays within the ~512-row matmul-M
        # target (guarding the pre-doubling bn allowed up to 2x the bound)
        while bn * 2 <= n and n % (bn * 2) == 0 and est(bn * 2) < cap and (
            bn * 2 * hh * ww <= 512
        ):
            bn *= 2
    while n % bn:
        bn -= 1
    if est(bn) >= cap:  # explicit block_n override can also oversize
        raise ValueError(
            f"chain_systolic: block_n={bn} needs ~{est(bn)} B VMEM "
            f"(cap {cap}) at shape ({n},{hh},{ww},{c}) x {k_blocks} blocks")
    t_tiles = n // bn

    kernel = functools.partial(
        _systolic_kernel, k_blocks=k_blocks, hh=hh, ww=ww, bn=bn, c=c,
        relu6=relu6, t_tiles=t_tiles, out_dtype=x.dtype,
    )
    grid = (t_tiles + k_blocks - 1,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, hh, ww, c),
                         lambda i: (jnp.minimum(i, t_tiles - 1), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_blocks, 3, 3, c), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_blocks, 1, c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_blocks, c, c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_blocks, 1, c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bn, hh, ww, c),
            lambda i: (jnp.maximum(i - (k_blocks - 1), 0), 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, hh, ww, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((max(k_blocks - 1, 1), bn, hh, ww, c), x.dtype),
            pltpu.VMEM((bn, hh + 2, ww + 2, c), x.dtype),
        ],
        interpret=interpret,
    )(x, dw_ws, dw_bs.reshape(k_blocks, 1, c), pw_ws,
      pw_bs.reshape(k_blocks, 1, c))
