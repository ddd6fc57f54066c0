"""Chain megakernel (ops/pallas_chain_v3) — exact-equality oracle tests.

The chain's contract is BIT-IDENTITY with the sequential per-block fused
route (pallas_ir_v3.v3_block_pallas in whole-image mode): same op order
per block, cast to the model dtype at every block boundary. These tests
assert exact equality in interpret mode across stride-2 entries, SE,
residual, hswish, k in {3,5}, and bn variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mobilenet_tpu.ops.pallas_chain_v3 import (
    chain_fits, chain_specs, v3_chain_pallas)
from mobilenet_tpu.ops.pallas_ir_v3 import v3_block_pallas


def _mk_block(rng, cin, e, cout, k, stride, act, se=0, residual=False,
              dt=jnp.float32):
    def arr(*shape):
        return jnp.asarray(rng.uniform(-1, 1, shape) * 0.5, dt)

    b = dict(exp_w=arr(cin, e), exp_b=arr(e), dw_w=arr(k, k, 1, e),
             dw_b=arr(e), prj_w=arr(e, cout), prj_b=arr(cout),
             k=k, stride=stride, act=act, residual=residual)
    if se:
        b.update(se_w1=arr(e, se), se_b1=arr(se), se_w2=arr(se, e),
                 se_b2=arr(e))
    return b


def _sequential(x, blocks):
    y = x
    for b in blocks:
        kw = {}
        if "se_w1" in b:
            kw = dict(se_w1=b["se_w1"], se_b1=b["se_b1"],
                      se_w2=b["se_w2"], se_b2=b["se_b2"])
        y = v3_block_pallas(
            y, b["exp_w"], b["exp_b"], b["dw_w"], b["dw_b"],
            b["prj_w"], b["prj_b"], k=b["k"], stride=b["stride"],
            act=b["act"], residual=b["residual"], **kw)
    return y


CASES = [
    # (h, cin, blocks-shape list: (cin, e, cout, k, stride, act, se, res))
    ("s2_entry_then_res", 8, 8, [
        (8, 24, 16, 3, 2, "hswish", 0, False),
        (16, 40, 16, 3, 1, "hswish", 0, True),
    ]),
    ("se_k5_mix", 8, 8, [
        (8, 24, 16, 3, 1, "relu", 0, False),
        (16, 32, 16, 5, 1, "relu", 8, True),
        (16, 40, 24, 3, 1, "hswish", 16, False),
    ]),
    ("v3_14sq_analog", 8, 10, [
        (10, 30, 12, 3, 2, "hswish", 0, False),
        (12, 28, 12, 3, 1, "hswish", 0, True),
        (12, 36, 20, 3, 1, "hswish", 12, False),
        (20, 48, 20, 3, 1, "hswish", 16, True),
    ]),
    # 7²-analog: odd final spatial (5*5=25 % 8 != 0) exercises the
    # wpad-padded final output, incl. residual-in-f32 (exact at f32 dtype)
    ("odd_final_wpad", 10, 8, [
        (8, 24, 16, 5, 2, "hswish", 8, False),
        (16, 32, 16, 5, 1, "hswish", 8, True),
    ]),
]


@pytest.mark.parametrize("name,h,cin,shapes", CASES,
                         ids=[c[0] for c in CASES])
def test_chain_exact_vs_per_block(name, h, cin, shapes):
    rng = np.random.default_rng(hash(name) % 2**31)
    blocks = [_mk_block(rng, *s[:5], act=s[5], se=s[6], residual=s[7])
              for s in shapes]
    specs = chain_specs([(s[0], s[1], s[2], s[3], s[4], s[6])
                         for s in shapes], h, h)
    assert specs is not None and chain_fits(4, specs, 4)
    x = jnp.asarray(rng.uniform(-1, 1, (4, h, h, cin)), jnp.float32)
    ref = np.asarray(_sequential(x, blocks))
    got = np.asarray(v3_chain_pallas(x, blocks))
    assert got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)


def test_chain_bn_invariant():
    rng = np.random.default_rng(0)
    shapes = [(8, 24, 16, 3, 1, "relu", 0, False),
              (16, 32, 16, 3, 1, "relu", 8, True)]
    blocks = [_mk_block(rng, *s[:5], act=s[5], se=s[6], residual=s[7])
              for s in shapes]
    x = jnp.asarray(rng.uniform(-1, 1, (4, 8, 8, 8)), jnp.float32)
    a = np.asarray(v3_chain_pallas(x, blocks, block_n=1))
    b = np.asarray(v3_chain_pallas(x, blocks, block_n=2))
    # interpret mode lowers the dots to CPU XLA, whose f32 reduction
    # tiling varies with M — 1-ULP class only (on the MXU the contraction
    # order is fixed by K, independent of bn)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_chain_bf16_boundary_semantics():
    """bf16 chain == bf16 per-block: the in-kernel boundary cast must
    round exactly like the per-block HBM crossing."""
    rng = np.random.default_rng(7)
    shapes = [(8, 24, 16, 3, 1, "hswish", 0, False),
              (16, 32, 16, 5, 1, "relu", 8, True)]
    blocks = [_mk_block(rng, *s[:5], act=s[5], se=s[6], residual=s[7],
                        dt=jnp.bfloat16)
              for s in shapes]
    x = jnp.asarray(rng.uniform(-1, 1, (2, 8, 8, 8)), jnp.bfloat16)
    ref = np.asarray(_sequential(x, blocks).astype(jnp.float32))
    got = np.asarray(v3_chain_pallas(x, blocks).astype(jnp.float32))
    np.testing.assert_array_equal(got, ref)


def test_chain_bf16_wpad_residual_bit_identity():
    """The 7x7 (h*w = 49, odd) geometry forces the wpad output path. The
    residual must join post-cast in the model dtype there too, so bf16
    chain == per-block WHOLE mode (block_n=8) == per-block default
    planner (which picks wpad) — the mode pick never changes numerics."""
    rng = np.random.default_rng(13)
    shapes = [(16, 128, 16, 3, 1, "relu", 0, True),
              (16, 128, 16, 3, 1, "relu", 0, True)]
    blocks = [_mk_block(rng, *s[:5], act=s[5], se=s[6], residual=s[7],
                        dt=jnp.bfloat16)
              for s in shapes]
    x = jnp.asarray(rng.uniform(-1, 1, (8, 7, 7, 16)), jnp.bfloat16)
    got = np.asarray(v3_chain_pallas(x, blocks).astype(jnp.float32))

    def seq(bn):
        y = x
        for b in blocks:
            y = v3_block_pallas(
                y, b["exp_w"], b["exp_b"], b["dw_w"], b["dw_b"],
                b["prj_w"], b["prj_b"], k=b["k"], stride=b["stride"],
                act=b["act"], residual=b["residual"], block_n=bn)
        return np.asarray(y.astype(jnp.float32))

    np.testing.assert_array_equal(got, seq(8))     # whole mode
    np.testing.assert_array_equal(got, seq(None))  # planner (wpad here)


def test_chain_oversize_block_n_terminates():
    """block_n > batch must clamp instead of hanging the divisor search."""
    rng = np.random.default_rng(5)
    shapes = [(8, 24, 16, 3, 1, "relu", 0, False),
              (16, 32, 16, 3, 1, "relu", 0, True)]
    blocks = [_mk_block(rng, *s[:5], act=s[5], se=s[6], residual=s[7])
              for s in shapes]
    x = jnp.asarray(rng.uniform(-1, 1, (4, 8, 8, 8)), jnp.float32)
    ref = np.asarray(v3_chain_pallas(x, blocks))
    got = np.asarray(v3_chain_pallas(x, blocks, block_n=512))
    np.testing.assert_array_equal(got, ref)


def test_chain_route_taken_and_model_equivalent(monkeypatch):
    """CHAIN_V3=True fires inside run_blocks_v3 at a small V3-Large config
    and the model output matches the per-block fused route within the
    interpret-mode ULP class (the chain's ONE auto bn vs the per-block
    route's per-block bn gives CPU XLA dots different M tilings — the
    same 1-ULP class test_chain_bn_invariant documents; on the MXU the
    K-order is fixed and the on-chip race measured top-1 identity 1.0).
    The knob ships OFF (measured e2e loss on v5e — roofline_v5e.md
    2026-08-19); force it on to guard _try_chain_v3's widening/skip
    integration."""
    from mobilenet_tpu.checkpoints.v3 import fold_bn_v3, init_params_v3
    from mobilenet_tpu.models import mobilenet_v3 as mod_v3
    from mobilenet_tpu.models.mobilenet_v3 import V3Config, forward_v3
    from mobilenet_tpu.ops import pallas_chain_v3 as pcv

    cfg = V3Config(variant="large", alpha=1.0, resolution=96,
                   compute_dtype="float32")
    params = fold_bn_v3(init_params_v3(cfg, seed=0), eps=cfg.bn_eps)
    rng = np.random.default_rng(23)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 96, 96, 3)).astype(np.float32))
    base = np.asarray(forward_v3(params, x, cfg, dw_backend="fused"))

    calls = []
    orig = pcv.v3_chain_pallas
    monkeypatch.setattr(
        pcv, "v3_chain_pallas",
        lambda *a, **k: (calls.append(len(a[1])), orig(*a, **k))[1])
    monkeypatch.setattr(mod_v3, "CHAIN_V3", True)
    got = np.asarray(forward_v3(params, x, cfg, dw_backend="fused"))
    assert calls, "chain route was not taken at Large-96 with CHAIN_V3=True"
    assert max(calls) >= 2
    np.testing.assert_allclose(got, base, atol=1e-4, rtol=1e-4)
    assert (got.argmax(1) == base.argmax(1)).all()


def test_chain_specs_rejects():
    assert chain_specs([(8, 24, 16, 4, 1, 0)], 8, 8) is None  # even k
    assert chain_specs([(8, 24, 16, 3, 2, 0)], 7, 7) is None  # odd s2
    # single block is never a chain
    s = chain_specs([(8, 24, 16, 3, 1, 0)], 8, 8)
    assert not chain_fits(4, s)
