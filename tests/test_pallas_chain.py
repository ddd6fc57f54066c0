"""Experimental multi-block chain kernel vs oracle (interpret tier)."""

import jax.numpy as jnp
import numpy as np

from mobilenet_tpu.ops.pallas_chain import chained_blocks_pallas
from mobilenet_tpu.oracle import numpy_ref


def test_chain_vs_oracle(rng):
    k, c, h = 3, 64, 14
    x = rng.uniform(-1, 1, (2, h, h, c)).astype(np.float32)
    dw_ws = rng.normal(0, 0.5, (k, 3, 3, c)).astype(np.float32)
    dw_bs = rng.normal(0, 0.2, (k, c)).astype(np.float32)
    pw_ws = rng.normal(0, 0.2, (k, c, c)).astype(np.float32)
    pw_bs = rng.normal(0, 0.2, (k, c)).astype(np.float32)
    got = np.asarray(chained_blocks_pallas(
        jnp.asarray(x), jnp.asarray(dw_ws), jnp.asarray(dw_bs),
        jnp.asarray(pw_ws), jnp.asarray(pw_bs), True, interpret=True))
    ref = x
    for i in range(k):
        ref = numpy_ref.depthwise_ref(ref, dw_ws[i].reshape(3, 3, 1, c), 1,
                                      dw_bs[i], True)
        ref = numpy_ref.pointwise_ref(ref, pw_ws[i], pw_bs[i], True)
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)
