"""Channel padding pass: round narrow channel counts up to divisors of 128.

The alpha=0.75 sweep family has channel counts (24, 48, 96, ...) that divide
neither 128 nor each other's lane groups, so none of the lane-packed Pallas
kernels apply and the early layers run at ~1/5 lane occupancy. Zero-padding
channels to the next divisor of 128 (24->32, 48->64, 96->128) fixes the
layout at zero accuracy cost:

  - dw: padded channels have zero weights and bias -> stay exactly 0 through
    ReLU
  - pw: padded input rows are zero weights (contribute nothing); padded
    output columns produce zeros
  - the classifier consumes the original feature channels (>=128 at every
    alpha, never padded), so logits are EXACTLY unchanged.

Applied once on the host to the folded pytree (the throughput pipeline);
the verify path keeps unpadded shapes so per-layer oracle comparison is
unaffected.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _next_lane_divisor(c: int) -> int:
    """Smallest d >= c with 128 % d == 0 (for c < 128); c unchanged otherwise."""
    if c >= 128:
        return c
    d = c
    while 128 % d:
        d += 1
    return d


def pad_channels(folded: Dict[str, Any]) -> Dict[str, Any]:
    """Zero-pad narrow channel dims of a folded params pytree."""

    def pad_to(arr, axis, target):
        arr = np.asarray(arr)
        cur = arr.shape[axis]
        if cur >= target:
            return arr
        widths = [(0, 0)] * arr.ndim
        widths[axis] = (0, target - cur)
        return np.pad(arr, widths)

    out: Dict[str, Any] = {"blocks": []}
    c1 = folded["conv1"]["w"].shape[3]
    c1p = _next_lane_divisor(c1)
    out["conv1"] = {
        "w": pad_to(folded["conv1"]["w"], 3, c1p),
        "b": pad_to(folded["conv1"]["b"], 0, c1p),
    }
    prev = c1p
    n_blocks = len(folded["blocks"])
    for i, blk in enumerate(folded["blocks"]):
        cout = blk["pw"]["w"].shape[1]
        # never pad the final feature channels: the FC consumes them as-is
        coutp = cout if i == n_blocks - 1 else _next_lane_divisor(cout)
        out["blocks"].append(
            {
                "dw": {
                    "w": pad_to(blk["dw"]["w"], 3, prev),
                    "b": pad_to(blk["dw"]["b"], 0, prev),
                },
                "pw": {
                    "w": pad_to(pad_to(blk["pw"]["w"], 0, prev), 1, coutp),
                    "b": pad_to(blk["pw"]["b"], 0, coutp),
                },
            }
        )
        prev = coutp
    out["fc"] = {"w": np.asarray(folded["fc"]["w"]), "b": np.asarray(folded["fc"]["b"])}
    return out


def pad_block0_v2(folded: Dict[str, Any]) -> Dict[str, Any]:
    """V2 twin, minimal by design: pad ONLY block 0's projection Cout up to
    a multiple of its Cin (the packed kernel's lane-group unit, so
    R*Cout % 128 == 0 and the lane-packed route applies to the t==1 block),
    and block 1's expansion rows to consume the padded channels. All other
    V2 blocks run the IR kernel, which pads its expanded dim in VMEM and
    needs NO host-side padding (ops/pallas_ir_block.py). Exactness: the
    zero-channel argument at the top of this file; block 0 is never a
    residual block (its Cout != Cin at every keras alpha), so no residual
    sees the padded width."""

    def pad_to(arr, axis, target):
        arr = np.asarray(arr)
        if arr.shape[axis] >= target:
            return arr
        widths = [(0, 0)] * arr.ndim
        widths[axis] = (0, target - arr.shape[axis])
        return np.pad(arr, widths)

    blk0 = folded["blocks"][0]
    cin = blk0["prj"]["w"].shape[0]  # == stem channels (t == 1)
    cout = blk0["prj"]["w"].shape[1]
    if cin >= 128 or 128 % cin or cout % cin == 0:
        return folded
    coutp = -(-cout // cin) * cin
    out = dict(folded)
    out["blocks"] = list(folded["blocks"])
    out["blocks"][0] = {
        **blk0,
        "prj": {"w": pad_to(blk0["prj"]["w"], 1, coutp),
                "b": pad_to(blk0["prj"]["b"], 0, coutp)},
    }
    blk1 = folded["blocks"][1]
    out["blocks"][1] = {
        **blk1,
        "exp": {"w": pad_to(blk1["exp"]["w"], 0, coutp),
                "b": np.asarray(blk1["exp"]["b"])},
    }
    return out


def needs_padding(folded: Dict[str, Any]) -> bool:
    c = folded["conv1"]["w"].shape[3]
    if c < 128 and 128 % c:
        return True
    return any(
        (b["pw"]["w"].shape[1] < 128 and 128 % b["pw"]["w"].shape[1])
        for b in folded["blocks"][:-1]
    )
