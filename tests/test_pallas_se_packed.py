"""Lane-packed SE bottleneck kernel (ops/pallas_se_packed.py) vs the
NumPy oracle — the V3-Large b4/b5 class (k5, SE, Cin=40 packed to 64)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mobilenet_tpu.ops.pallas_block_packed import pack
from mobilenet_tpu.ops.pallas_se_packed import (
    se_block_packed, se_packed_geometry,
)
from mobilenet_tpu.oracle import numpy_ref


def _oracle(x, exp_w, exp_b, dw_w, dw_b, se, pw_w, pw_b, act, residual):
    z = numpy_ref.pointwise_ref_any(x, exp_w, exp_b, act)
    z = numpy_ref.depthwise_ref_any(z, dw_w, 1, dw_b, act)
    if se is not None:
        z = numpy_ref.se_ref(z, se)
    out = numpy_ref.pointwise_ref_any(z, pw_w, pw_b, None)
    if residual:
        out = out + x
    return out


def _case(rng, n, h, cin, e, cout, k=5, act="relu", use_se=True,
          residual=False, sw=16):
    geo = se_packed_geometry(cin, e, cout, h, k, 1)
    assert geo is not None
    cp, ep, cout_p, r = geo
    x = rng.uniform(-1, 1, (n, h, h, cin)).astype(np.float32)
    exp_w = rng.normal(0, 0.4, (cin, e)).astype(np.float32)
    exp_b = rng.normal(0, 0.2, (e,)).astype(np.float32)
    dw_w = rng.normal(0, 0.4, (k, k, 1, e)).astype(np.float32)
    dw_b = rng.normal(0, 0.2, (e,)).astype(np.float32)
    pw_w = rng.normal(0, 0.3, (e, cout)).astype(np.float32)
    pw_b = rng.normal(0, 0.2, (cout,)).astype(np.float32)
    se = None
    sargs = (None, None, None, None)
    if use_se:
        se = {
            "w1": rng.normal(0, 0.3, (e, sw)).astype(np.float32),
            "b1": rng.normal(0, 0.2, (sw,)).astype(np.float32),
            "w2": rng.normal(0, 0.3, (sw, e)).astype(np.float32),
            "b2": rng.normal(0, 0.2, (e,)).astype(np.float32),
        }
        sargs = tuple(jnp.asarray(se[kk]) for kk in ("w1", "b1", "w2",
                                                     "b2"))

    # pad activations/expand rows to Cp (zero channels — exact), and for
    # residual pad the projection cols to Cp too (the routing mechanism)
    xp_np = np.pad(x, ((0, 0), (0, 0), (0, 0), (0, cp - cin)))
    ew_p = np.pad(exp_w, ((0, cp - cin), (0, 0)))
    pww, pwb = pw_w, pw_b
    if residual:
        pww = np.pad(pw_w, ((0, 0), (0, cp - cout)))
        pwb = np.pad(pw_b, (0, cp - cout))
    got = se_block_packed(
        pack(jnp.asarray(xp_np), cp), jnp.asarray(ew_p),
        jnp.asarray(exp_b), jnp.asarray(dw_w), jnp.asarray(dw_b),
        *sargs, jnp.asarray(pww), jnp.asarray(pwb),
        cp, k, act, residual, sw if use_se else 0, interpret=True,
    )
    got = np.asarray(got).reshape(n, h, h, -1)[..., :cout]
    ref = _oracle(x, exp_w, exp_b, dw_w, dw_b, se, pw_w, pw_b, act,
                  residual)[..., :cout]
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=5e-4)


@pytest.mark.parametrize(
    "n,h,cin,e,cout,k",
    [
        (2, 8, 40, 120, 40, 5),   # V3-L b4/b5 geometry (Cp=64, R=2)
        (1, 16, 40, 120, 40, 5),
        (2, 8, 24, 72, 40, 5),    # Cp=32, R=4 (two lane-roll j0 values)
        (1, 8, 40, 112, 80, 3),   # k=3 variant
        (1, 8, 16, 64, 24, 5),    # Cp=16, R=8
    ],
)
def test_vs_oracle(rng, n, h, cin, e, cout, k):
    _case(rng, n, h, cin, e, cout, k=k)


def test_residual_and_hswish(rng):
    _case(rng, 2, 8, 40, 120, 40, act="hswish", residual=True)


def test_no_se(rng):
    _case(rng, 1, 8, 40, 120, 40, use_se=False)


def test_geometry():
    assert se_packed_geometry(40, 120, 40, 28, 5, 1) == (64, 128, 64, 2)
    assert se_packed_geometry(40, 120, 40, 28, 5, 2) is None  # stride
    assert se_packed_geometry(160, 480, 160, 14, 5, 1) is None  # Cp>=128
