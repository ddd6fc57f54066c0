"""Fused head kernel (ops/pallas_head.py) vs the XLA ops chain."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mobilenet_tpu.ops import conv as ops
from mobilenet_tpu.ops.pallas_head import fused_head, head_fits


def _chain(x, conv, post):
    if conv is not None:
        w, b, act = conv
        y = ops.pointwise_conv(x, w, bias=b, act=act)
    else:
        y = x
    h = ops.global_avg_pool(y)
    for w, b, act in post:
        v = jnp.dot(h, w.astype(h.dtype),
                    precision=ops._precision(h),
                    preferred_element_type=jnp.float32)
        v = v + b.astype(jnp.float32)
        if act != "linear":
            v = ops.apply_act_named(v, act)
        h = v.astype(h.dtype)
    return h


def _mk(rng, ki, ko):
    w = rng.normal(0, 0.2, (ki, ko)).astype(np.float32)
    b = rng.normal(0, 0.1, (ko,)).astype(np.float32)
    return jnp.asarray(w), jnp.asarray(b)


@pytest.mark.parametrize(
    "c,e,heads,acts",
    [
        # V3-L geometry at reduced widths (full f32 weights bust the VMEM
        # cap by design — the production path is bf16, tested below)
        (160, 480, (640, 1000), ("hswish", "hswish", "linear")),
        (320, 640, (1000,), ("relu6", "linear")),                  # V2-ish
        (1024, None, (1000,), (None, "linear")),                   # V1
    ],
)
def test_vs_ops_chain(rng, c, e, heads, acts):
    n, hw = 8, 7  # bn*hw must hit the 8-sublane rule: 8*49 = 392
    x = jnp.asarray(rng.uniform(-1, 1, (n, hw, hw, c)).astype(np.float32))
    conv = None
    if e is not None:
        w, b = _mk(rng, c, e)
        conv = (w, b, acts[0])
    post = []
    ki = e if e is not None else c
    for ko, act in zip(heads, acts[1:]):
        w, b = _mk(rng, ki, ko)
        post.append((w, b, act))
        ki = ko
    assert head_fits(n, hw, hw, c, conv, post, 4)
    got = fused_head(x, conv, post, interpret=True)
    want = _chain(x, conv, post)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_grid_tiles(rng):
    """Batch not fitting one tile: grid over bn tiles, same values."""
    n, hw, c = 16, 4, 256
    x = jnp.asarray(rng.uniform(-1, 1, (n, hw, hw, c)).astype(np.float32))
    w, b = _mk(rng, c, 512)
    fw, fb = _mk(rng, 512, 1000)
    got = fused_head(x, (w, b, "relu"), [(fw, fb, "linear")],
                     interpret=True)
    want = _chain(x, (w, b, "relu"), [(fw, fb, "linear")])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_small_batch_falls_back():
    """n*hw violating the 8-sublane rule must be statically rejected
    (the model routes back to the XLA ops chain)."""
    assert not head_fits(1, 7, 7, 960, None, [], 2)
    assert not head_fits(2, 7, 7, 960, None, [], 2)


def test_model_head_route(monkeypatch):
    """forward_v3 with the fused head vs with it off — same logits class.
    bf16 compute (the production dtype: the full-width f32 head is
    rejected by head_fits's VMEM model, by design), batch 8 to satisfy
    the sublane rule; the kernel must actually FIRE."""
    import mobilenet_tpu.ops.pallas_head as ph
    from mobilenet_tpu.checkpoints.v3 import fold_bn_v3, init_params_v3
    from mobilenet_tpu.models import mobilenet_v3 as mod_v3
    from mobilenet_tpu.models.mobilenet_v3 import V3Config, forward_v3

    cfg = V3Config(variant="large", alpha=1.0, resolution=96,
                   compute_dtype="bfloat16")
    params = fold_bn_v3(init_params_v3(cfg, seed=0), eps=cfg.bn_eps)
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), params)
    rng = np.random.default_rng(23)
    x = jnp.asarray(rng.uniform(-1, 1, (8, 96, 96, 3)), jnp.bfloat16)
    calls = []
    orig = ph.fused_head
    monkeypatch.setattr(
        ph, "fused_head",
        lambda *a, **k: (calls.append(1), orig(*a, **k))[1])
    assert mod_v3.FUSED_HEAD
    got = forward_v3(params, x, cfg, dw_backend="fused")
    assert calls, "fused head did not fire at Large-96 bf16 batch 8"
    monkeypatch.setattr(mod_v3, "FUSED_HEAD", False)
    want = forward_v3(params, x, cfg, dw_backend="fused")
    got64 = np.asarray(got).astype(np.float64)
    want64 = np.asarray(want).astype(np.float64)
    scale = np.abs(want64).max()
    assert np.abs(got64 - want64).max() <= 0.04 * scale, (
        np.abs(got64 - want64).max(), scale)
