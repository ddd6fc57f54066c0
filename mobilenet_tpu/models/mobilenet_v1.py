"""MobileNet-V1 forward pass: all 28 layers as ONE jittable JAX program.

This replaces the reference's per-layer host dispatch loop (SURVEY.md SS3.1:
28 clEnqueueNDRangeKernel round-trips) with a single compiled XLA program —
"All 28 layers execute as one compiled program with no host round-trips
between layers" (BASELINE.json:5).

Layer schedule citation: SURVEY.md SS2 layer table (keras mobilenet.py:192-227,
haiku mobilenetv1.py:106-155).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops import conv as ops


def _dw(x, w, stride, bias, relu6, use_pallas: bool):
    if use_pallas:
        from ..ops.pallas_dw import depthwise_conv_pallas  # noqa: PLC0415

        return depthwise_conv_pallas(x, w, stride, bias=bias, relu6=relu6)
    return ops.depthwise_conv_xla(x, w, stride, bias=bias, relu6=relu6)


def forward(
    params: Dict[str, Any],
    x: jax.Array,
    config: ModelConfig,
    *,
    use_pallas_dw: bool = False,
    collect: bool = False,
) -> Any:
    """Run the 28-layer network on a folded-BN params pytree.

    Args:
      params: folded pytree from checkpoints.io.fold_bn (w/b per conv layer).
      x: (N, H, W, 3) preprocessed images, NHWC, in [-1, 1].
      config: static model config (jit static arg).
      use_pallas_dw: route depthwise layers through the Pallas channel-tiled
        kernel (SURVEY.md SS7 stage 3) instead of XLA grouped conv.
      collect: also return every post-activation tensor, keyed by layer name —
        the per-layer oracle tap (reference analog: per-layer clEnqueueReadBuffer
        in verify mode, SURVEY.md SS3.2).

    Returns:
      logits (N, num_classes), or (logits, {layer_name: activation}) if collect.
    """
    acts: Dict[str, jax.Array] = {}
    relu6 = config.relu6

    y = ops.conv2d_same(x, params["conv1"]["w"], 2, bias=params["conv1"]["b"], relu6=relu6)
    if collect:
        acts["conv1"] = y

    for i, (blk, stride) in enumerate(zip(params["blocks"], config.block_strides)):
        y = _dw(y, blk["dw"]["w"], stride, blk["dw"]["b"], relu6, use_pallas_dw)
        if collect:
            acts[f"block{i:02d}_dw"] = y
        y = ops.pointwise_conv(y, blk["pw"]["w"], bias=blk["pw"]["b"], relu6=relu6)
        if collect:
            acts[f"block{i:02d}_pw"] = y

    pooled = ops.global_avg_pool(y)
    if collect:
        acts["pool"] = pooled
    logits = ops.fc(pooled, params["fc"]["w"], params["fc"]["b"])
    if collect:
        acts["logits"] = logits
        return logits, acts
    return logits


def predict_probs(params, x, config: ModelConfig, **kw) -> jax.Array:
    """logits -> softmax probabilities (host does only top-k; SURVEY.md SS3.4)."""
    return jax.nn.softmax(forward(params, x, config, **kw).astype(jnp.float32), axis=-1)


def make_infer_fn(
    params,
    config: ModelConfig,
    *,
    use_pallas_dw: bool = False,
    donate_input: bool = False,
):
    """Build the compiled inference entry point (one jit cache entry per
    (config, batch-shape) pair — the TPU analog of one bitstream)."""

    def infer(images: jax.Array) -> jax.Array:
        return predict_probs(params, images, config, use_pallas_dw=use_pallas_dw)

    return jax.jit(infer, donate_argnums=(0,) if donate_input else ())
