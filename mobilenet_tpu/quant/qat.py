"""Quantization-aware training (QAT) for the int8 fixed-point scheme.

The reference stack is inference-only (SURVEY.md SS5) and its int8 path is
post-training quantized with compile-time fixed-point formats
(BASELINE.json:10); training is this rebuild's extension (models/train.py),
and QAT closes the loop between the two: train WITH the deployment
quantizer in the graph, so the exported int8 model (quant/quantize.py) is
the function the optimizer actually optimized.

Design — EXACT integer-domain simulation with straight-through gradients.

Standard QAT fake-quantizes in real units (dequantized floats); that only
tracks the deployed integer arithmetic to f32 roundoff, because scaled
activations are not exactly representable. This module instead carries the
QUANTIZED integers themselves in float32 — the same exact-f32-integer trick
the device int8 path uses for its dw taps (quant/ops.py) — so the QAT
forward's activations equal the int8 oracle's BIT-FOR-BIT (the repo's int8
invariant), while the STE shadows carry real-unit gradients:

  value path (exact ints in f32)          gradient shadow (real units / scales)
  q_x  = clip(rint(x/s_in), +-127)        x / s_in
  w_q  = clip(rint(w/s_w[oc]), +-127)     w / s_w[oc]         (s_w stop-grad)
  b_q  = rint(b / (s_in*s_w[oc]))         b / (s_in*s_w[oc])
  acc  = conv(q_x, w_q) + b_q             exact while |values| < 2^24
  q_y  = rint(clamp(acc*m, 0, six_q))     acc*m               (m stop-grad)

Because every scale constant is stop-gradiented, the gradient shadow is
mathematically the plain float network divided by constants that cancel
layer to layer — i.e. gradients are IDENTICAL to textbook real-units STE
QAT — while the forward value is the deployed int8 network exactly.

Exactness preconditions (same family as quant/ops.py): every f32-carried
integer must stay below 2^24. Products are <= 127*127; the worst
accumulation is pointwise at alpha=1.0 (Cin=1024: 1024*16129 = 16.52e6 <
2^24 = 16.78e6), and the dw bias bound is already guarded host-side
(quantize._quant_layer). The depthwise conv is written as 9 shifted-slice
FMAs, not lax grouped conv, for the same bit-reliability reason as
qops.depthwise_i8_xla — and slices/adds are trivially differentiable.

Gated in tests/test_qat.py: EXACT per-layer equality vs quant/oracle
.forward_all, descending loss, finite nonzero grads, and post-QAT export
through quantize() keeping the int8 EXACT verify gate green.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..config import ModelConfig
from ..oracle.numpy_ref import same_pad
from ..ops import conv as ops
from .quantize import ACT_HIDDEN_SCALE, ACT_IN_SCALE

# six_q for the fixed 6/127 hidden activation scale: 6 / (6/127) = 127.
_HIDDEN_SIX_Q = 127.0


def _ste(shadow: jax.Array, value: jax.Array) -> jax.Array:
    """Value of `value`, gradient of `shadow` (straight-through)."""
    return shadow + lax.stop_gradient(value - shadow)


def fq_input(x: jax.Array, s_in: float = float(ACT_IN_SCALE)) -> jax.Array:
    """[-1,1] floats -> integer-domain input (twin of quantize.quantize_input)."""
    v = x.astype(jnp.float32) / jnp.float32(s_in)
    return _ste(v, jnp.clip(jnp.round(v), -127, 127))


def fq_weight(w: jax.Array, out_axis: int) -> Tuple[jax.Array, jax.Array]:
    """Per-output-channel integer weights (twin of quantize._quant_weight).

    Returns (w_q carrying exact ints in f32, s_w broadcast-shaped, stop-grad).
    """
    wf = w.astype(jnp.float32)
    red = tuple(i for i in range(wf.ndim) if i != out_axis)
    absmax = jnp.maximum(jnp.max(jnp.abs(wf), axis=red), 1e-12)
    shape = [1] * wf.ndim
    shape[out_axis] = -1
    s_w = lax.stop_gradient((absmax / jnp.float32(127.0))
                            .reshape(shape).astype(jnp.float32))
    v = wf / s_w
    return _ste(v, jnp.clip(jnp.round(v), -127, 127)), s_w


def fq_bias(b: jax.Array, acc_scale: jax.Array) -> jax.Array:
    """Accumulator-unit bias (twin of quantize bias_i32), STE'd."""
    acc = lax.stop_gradient(acc_scale.reshape(-1).astype(jnp.float32))
    v = b.astype(jnp.float32) / acc
    return _ste(v, jnp.round(v))


def fq_requant(acc: jax.Array, m: jax.Array, six_q: float = _HIDDEN_SIX_Q,
               relu6: bool = True) -> jax.Array:
    """Integer accumulator -> next layer's integers (twin of qops.requantize)."""
    v = acc * lax.stop_gradient(m.reshape(-1).astype(jnp.float32))
    v = jnp.maximum(v, 0.0)
    if relu6:
        v = jnp.minimum(v, jnp.float32(six_q))
    return _ste(v, jnp.round(v))


def _dw3x3_taps(x: jax.Array, w: jax.Array, stride: int) -> jax.Array:
    """Depthwise 3x3 as 9 shifted-slice FMAs — exact integers AND
    differentiable (the lax grouped f32 conv is not bit-reliable on TPU:
    qops.depthwise_i8_xla's measured note)."""
    n, h, wd, c = x.shape
    h_out, w_out = -(-h // stride), -(-wd // stride)
    lo_h, hi_h = same_pad(h, stride, 3)
    lo_w, hi_w = same_pad(wd, stride, 3)
    xp = jnp.pad(x, ((0, 0), (lo_h, hi_h), (lo_w, hi_w), (0, 0)))
    acc = jnp.zeros((n, h_out, w_out, c), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = xp[:, dy : dy + h_out * stride : stride,
                       dx : dx + w_out * stride : stride, :]
            acc = acc + patch * w[dy, dx, 0]
    return acc


def qat_forward(
    params: Dict[str, Any],
    x: jax.Array,
    config: ModelConfig,
    *,
    collect: bool = False,
) -> Any:
    """MobileNet-V1 forward with the deployment quantizer in the graph.

    Mirrors quant/oracle.forward_all layer for layer; with collect=True the
    taps use the oracle's layer names and hold the SAME integers (as f32).
    Always the differentiable f32 route — this is a TRAINING graph; the
    fused Pallas kernels are inference-only (models/train.py docstring).
    Logits are real-unit floats (the int8 head keeps float logits too).
    """
    assert config.relu6, "the int8 fixed-point scheme requires ReLU6 bounds"
    acts: Dict[str, jax.Array] = {}
    s_in = jnp.float32(ACT_IN_SCALE)
    s_h = jnp.float32(ACT_HIDDEN_SCALE)

    q = fq_input(x)
    w_q, s_w = fq_weight(params["conv1"]["w"], out_axis=3)
    b_q = fq_bias(params["conv1"]["b"], s_in * s_w)
    acc = ops.conv2d_same(q, w_q, 2) + b_q  # f32 HIGHEST: exact ints (27 taps)
    q = fq_requant(acc, s_in * s_w / s_h)
    if collect:
        acts["conv1"] = q

    for i, stride in enumerate(config.block_strides):
        blk = params["blocks"][i]
        w_q, s_w = fq_weight(blk["dw"]["w"], out_axis=3)
        b_q = fq_bias(blk["dw"]["b"], s_h * s_w)
        acc = _dw3x3_taps(q, w_q, stride) + b_q
        q = fq_requant(acc, s_h * s_w / s_h)
        if collect:
            acts[f"block{i:02d}_dw"] = q
        w_q, s_w = fq_weight(blk["pw"]["w"], out_axis=1)
        b_q = fq_bias(blk["pw"]["b"], s_h * s_w)
        n, hh, ww, cin = q.shape
        acc = jnp.dot(q.reshape(n * hh * ww, cin), w_q,
                      precision=lax.Precision.HIGHEST)  # ints < 2^24: exact
        acc = (acc + b_q).reshape(n, hh, ww, -1)
        q = fq_requant(acc, s_h * s_w / s_h)
        if collect:
            acts[f"block{i:02d}_pw"] = q

    # Pool: exact integer sum, f32 mean, round-half-even (qops.avgpool_i8).
    n, hh, ww, c = q.shape
    v = jnp.sum(q, axis=(1, 2)) * jnp.float32(1.0 / (hh * ww))
    pooled = _ste(v, jnp.clip(jnp.round(v), -128, 127))
    if collect:
        acts["pool"] = pooled
    # Classifier: integer matmul, float logits (twin of qops.fc_i8_logits).
    w_q, s_w = fq_weight(params["fc"]["w"], out_axis=1)
    acc = jnp.dot(pooled, w_q, precision=lax.Precision.HIGHEST)
    scale = s_h * s_w.reshape(-1)
    logits = acc * scale[None, :] + params["fc"]["b"].astype(jnp.float32)[None, :]
    if collect:
        acts["logits"] = logits
        return logits, acts
    return logits


def make_qat_trainer(config: ModelConfig, lr: float = 1e-2,
                     momentum: float = 0.9, weight_decay: float = 4e-5):
    """Optax SGD-momentum QAT trainer over the folded parameterization.

    Same shape as models.train.make_optax_trainer — (init_fn, step_fn), both
    jittable/shardable with the parallel.mesh layouts — but the loss runs
    qat_forward, so gradients flow through the STE quantizers and the
    optimizer sees the deployed int8 arithmetic. The trained pytree exports
    with quant.quantize() unchanged.
    """
    import optax  # noqa: PLC0415

    tx = optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(lr, momentum=momentum),
    )

    def init_fn(params):
        return tx.init(params)

    def step_fn(params, opt_state, images, labels):
        def loss_fn(p):
            logits = qat_forward(p, images, config)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
            return jnp.mean(nll), logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        top1 = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return params, opt_state, loss, top1

    return init_fn, step_fn
