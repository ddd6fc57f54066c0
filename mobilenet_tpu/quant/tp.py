"""Channel tensor-parallel INT8 inference that keeps the EXACT contract.

The float TP path (parallel/tp_fused.py) is tolerance-gated — the psum
reassociates a float contraction. The int8 path is stronger: every pointwise
accumulation is an int32 sum, and INTEGER ADDITION IS ASSOCIATIVE, so
row-sharding the pw contraction and `psum`-ing int32 partials across the
model axis yields BIT-IDENTICAL logits to the single-device
`quant.model.forward_i8` xla routing (tests assert exact equality, the same
bar as the on-chip int8 gate, BASELINE.json:10 analog).

Scheme (mirrors parallel/tp_fused.py):
  conv1      replicated (exact bf16-integer conv, qops.conv1_i8)
  dw         channel-sharded — int8 in/out, per-channel requant is local
  pw         ROW-sharded int8 matmul -> int32 partial -> psum(int32) ->
             +bias -> ONE requantize (round-half-even) after the collective
  fc         row-sharded int32 partial -> psum -> float scale + bias

The `six_q` requant clips are static python floats (they select a
provably-redundant-clip fast path at trace time), so they are closed over
rather than passed through shard_map.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..parallel.mesh import DATA_AXIS, MODEL_AXIS
from . import ops as qops


def _split_static(dev: Dict[str, Any]):
    """(arrays-only tree, static six_q dict) — shard_map traces every leaf
    it is passed, and six_q must stay concrete."""
    arrays = {
        "conv1": {k: dev["conv1"][k] for k in ("w", "b", "m")},
        "blocks": [
            {"dw": {k: b["dw"][k] for k in ("w", "b", "m")},
             "pw": {k: b["pw"][k] for k in ("w", "b", "m")}}
            for b in dev["blocks"]
        ],
        "fc": dict(dev["fc"]),
    }
    six = {
        "conv1": float(dev["conv1"]["six_q"]),
        "dw": [float(b["dw"]["six_q"]) for b in dev["blocks"]],
        "pw": [float(b["pw"]["six_q"]) for b in dev["blocks"]],
    }
    return arrays, six


def param_specs_i8_tp(arrays: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec tree for the arrays-only int8 device tree."""
    out: Dict[str, Any] = {
        "conv1": {"w": P(), "b": P(), "m": P()},
        "blocks": [],
        "fc": {"w": P(MODEL_AXIS, None), "s_w": P(), "b": P()},
    }
    for _ in arrays["blocks"]:
        out["blocks"].append({
            # dw per-channel constants shard with the channels; pw rescale
            # constants are per-COUT and apply after the psum -> replicated
            "dw": {"w": P(None, None, None, MODEL_AXIS), "b": P(MODEL_AXIS),
                   "m": P(MODEL_AXIS)},
            "pw": {"w": P(MODEL_AXIS, None), "b": P(), "m": P()},
        })
    return out


def shard_dev_i8_tp(dev: Dict[str, Any], mesh):
    """Place the arrays of an int8 device tree onto the mesh; returns
    (sharded arrays tree, static six_q dict)."""
    arrays, six = _split_static(dev)
    specs = param_specs_i8_tp(arrays)
    arrays = jax.tree.map(
        lambda x, s: jax.device_put(jnp.asarray(x), NamedSharding(mesh, s)),
        arrays, specs,
    )
    return arrays, six


def forward_i8_tp(
    arrays: Dict[str, Any],
    six: Dict[str, Any],
    x_i8: jax.Array,
    config,
    mesh,
) -> jax.Array:
    """TP(+DP) int8 forward over `mesh`; logits are BIT-IDENTICAL to
    single-device forward_i8 xla routing (int32 partial sums commute).
    `arrays`/`six` come from shard_dev_i8_tp; `x_i8` is the quantized input
    (int8 or bf16-carried integers), resharded over DATA_AXIS here."""
    from jax import shard_map  # noqa: PLC0415

    relu6 = config.relu6

    def local_fn(p, xb):
        idx = lax.axis_index(MODEL_AXIS)
        c1 = p["conv1"]
        y = qops.conv1_i8(xb, c1["w"], c1["b"], c1["m"], six["conv1"], relu6)
        for i, (blk, stride) in enumerate(
                zip(p["blocks"], config.block_strides)):
            c_local = blk["dw"]["w"].shape[-1]
            y_shard = lax.dynamic_slice_in_dim(
                y, idx * c_local, c_local, axis=3)
            z = qops.depthwise_i8_xla(
                y_shard, blk["dw"]["w"], blk["dw"]["b"], blk["dw"]["m"],
                six["dw"][i], stride, relu6)
            n, h, w, cl = z.shape
            acc = lax.dot_general(
                z.reshape(n * h * w, cl), blk["pw"]["w"],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            acc = lax.psum(acc, MODEL_AXIS)  # exact: int32 sums commute
            acc = acc + blk["pw"]["b"][None, :]
            cout = blk["pw"]["w"].shape[1]
            y = qops.requantize(
                acc, blk["pw"]["m"], six["pw"][i], relu6
            ).reshape(n, h, w, cout)
        pooled = qops.avgpool_i8(y)
        f_local = p["fc"]["w"].shape[0]
        pooled_shard = lax.dynamic_slice_in_dim(
            pooled, idx * f_local, f_local, axis=1)
        acc = lax.psum(
            lax.dot_general(
                pooled_shard, p["fc"]["w"],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ),
            MODEL_AXIS)
        from .quantize import ACT_HIDDEN_SCALE  # noqa: PLC0415

        scale = jnp.float32(ACT_HIDDEN_SCALE) * p["fc"]["s_w"].astype(
            jnp.float32)
        return acc.astype(jnp.float32) * scale[None, :] + p["fc"]["b"][None, :]

    specs = param_specs_i8_tp(arrays)
    sharded = shard_map(
        local_fn, mesh=mesh,
        in_specs=(specs, P(DATA_AXIS, None, None, None)),
        out_specs=P(DATA_AXIS, None),
        check_vma=False,
    )
    x_i8 = jax.device_put(
        x_i8, NamedSharding(mesh, P(DATA_AXIS, None, None, None)))
    return sharded(arrays, x_i8)
