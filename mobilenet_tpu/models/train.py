"""Training step for MobileNet-V1 (fine-tune / from-scratch on the folded form).

The reference stack is inference-only (SURVEY.md SS5 "Checkpoint / resume": the
one-way weight export), so training is an extension of this rebuild: a jittable
SGD step over the folded parameterization (conv weight + per-channel bias; BN
affine is absorbed — training these is equivalent to training conv+frozen-BN).
Used by __graft_entry__.dryrun_multichip to validate the multi-chip dp+tp
sharding compiles and executes.

The depthwise layers use the XLA grouped-conv path here (differentiable); the
Pallas kernel is inference-only until it grows a custom VJP.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from . import mobilenet_v1


def cross_entropy_loss(
    params: Dict[str, Any], images: jax.Array, labels: jax.Array, config: ModelConfig
) -> jax.Array:
    logits = mobilenet_v1.forward(params, images, config, use_pallas_dw=False)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)


def sgd_train_step(
    params: Dict[str, Any],
    images: jax.Array,
    labels: jax.Array,
    config: ModelConfig,
    lr: float = 1e-2,
) -> Tuple[Dict[str, Any], jax.Array]:
    """One SGD step: returns (updated params, loss)."""
    loss, grads = jax.value_and_grad(cross_entropy_loss)(params, images, labels, config)
    new_params = jax.tree.map(lambda p, g: p - lr * g.astype(p.dtype), params, grads)
    return new_params, loss
