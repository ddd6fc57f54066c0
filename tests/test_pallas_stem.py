"""Experimental packed stem kernel vs the fixed-order oracle (interpret tier)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mobilenet_tpu.ops.pallas_stem import prepare_stem_weights, stem_conv_packed
from mobilenet_tpu.oracle import numpy_ref


@pytest.mark.parametrize("n,h,cout", [(2, 224, 32), (1, 64, 8), (2, 32, 16)])
def test_vs_oracle(rng, n, h, cout):
    x = rng.uniform(-1, 1, (n, h, h, 3)).astype(np.float32)
    w = rng.normal(0, 0.3, (3, 3, 3, cout)).astype(np.float32)
    b = rng.normal(0, 0.1, (cout,)).astype(np.float32)
    got = np.asarray(
        stem_conv_packed(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                         cout, True, interpret=True)
    )
    ref = numpy_ref.conv2d_ref(x, w, 2, b, True)
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=1e-5)


def test_weight_mapping_twin(rng):
    # The NumPy weight-prep twin must produce block-diagonal matrices whose
    # nonzero pattern matches kron(I_8, w2).
    w = rng.normal(0, 0.3, (3, 3, 3, 8)).astype(np.float32)
    b = rng.normal(0, 0.1, (8,)).astype(np.float32)
    mats, bias_t = prepare_stem_weights(w, b)
    assert mats.shape == (4, 128, 64)
    assert bias_t.shape == (1, 64)
    # tap (0,0) block 0: rows 0..15 map channels (hp,wp,c); w2[0,0,(0)*3+c] = w[0,0,c]
    np.testing.assert_array_equal(mats[0][0, :8], w[0, 0, 0])
