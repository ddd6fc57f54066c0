"""On-device preprocessing tests (reference analog C10, SURVEY.md SS2)."""

import jax.numpy as jnp
import numpy as np

from mobilenet_tpu.ops import preprocess as prep
from mobilenet_tpu.oracle.numpy_ref import preprocess_ref

import jax


def test_normalize_matches_host_reference(rng):
    img = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    got = np.asarray(prep.normalize(jnp.asarray(img)))
    np.testing.assert_allclose(got, preprocess_ref(img), atol=1e-6)
    assert got.min() >= -1.0 and got.max() <= 1.0


def test_preprocess_resizes_on_device(rng):
    img = rng.integers(0, 256, (1, 300, 300, 3), dtype=np.uint8)
    out = prep.preprocess(jnp.asarray(img), 224)
    assert out.shape == (1, 224, 224, 3)
    assert out.dtype == jnp.float32
    assert float(jnp.max(jnp.abs(out))) <= 1.0


def test_preprocess_identity_when_sized(rng):
    img = rng.integers(0, 256, (1, 128, 128, 3), dtype=np.uint8)
    out = np.asarray(prep.preprocess(jnp.asarray(img), 128))
    np.testing.assert_allclose(out, preprocess_ref(img), atol=1e-6)


def test_preprocess_is_jittable(rng):
    img = jnp.asarray(rng.integers(0, 256, (2, 160, 160, 3), dtype=np.uint8))
    fn = jax.jit(lambda u8: prep.preprocess(u8, 128, jnp.bfloat16))
    out = fn(img)
    assert out.shape == (2, 128, 128, 3) and out.dtype == jnp.bfloat16
