"""Real-TPU (hw tier) smoke test: Pallas dw kernel vs XLA grouped conv,
plus micro-benchmarks. Run directly on the axon TPU backend."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp
import numpy as np

from mobilenet_tpu.ops.conv import depthwise_conv_xla
from mobilenet_tpu.ops.pallas_dw import depthwise_conv_pallas

assert jax.default_backend() == "tpu", jax.default_backend()
print("device:", jax.devices())

rng = np.random.default_rng(0)

def check(n, h, c, stride, dtype=jnp.float32):
    x = jnp.asarray(rng.uniform(-2, 2, (n, h, h, c)), dtype)
    w = jnp.asarray(rng.normal(0, 0.5, (3, 3, 1, c)), dtype)
    b = jnp.asarray(rng.normal(0, 0.2, (c,)), dtype)
    got = np.asarray(depthwise_conv_pallas(x, w, stride, b, True))
    ref = np.asarray(depthwise_conv_xla(x, w, stride, b, True))
    tol = 2e-6 if dtype == jnp.float32 else 0.1
    err = np.abs(got.astype(np.float32) - ref.astype(np.float32)).max()
    status = "OK" if err <= tol else "FAIL"
    print(f"[{status}] n={n} h={h} c={c} s={stride} {np.dtype(dtype).name}: max_err={err:.2e}")
    return err <= tol

def bench_one(fn, *args, iters=50):
    fn(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    out.block_until_ready()
    return (time.perf_counter() - t0) / iters

ok = True
for (h, c, s) in [(112, 32, 1), (112, 64, 2), (56, 128, 1), (56, 128, 2),
                  (28, 256, 1), (14, 512, 1), (14, 512, 2), (7, 1024, 1)]:
    ok &= check(4, h, c, s)
ok &= check(4, 56, 128, 1, jnp.bfloat16)
ok &= check(4, 14, 512, 2, jnp.bfloat16)

print("\n--- micro-bench (batch 32, fp32) ---")
for (h, c, s) in [(112, 64, 1), (56, 128, 1), (14, 512, 1), (14, 512, 2)]:
    x = jnp.asarray(rng.uniform(-2, 2, (32, h, h, c)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.5, (3, 3, 1, c)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.2, (c,)), jnp.float32)
    tp = bench_one(lambda x: depthwise_conv_pallas(x, w, s, b, True), x)
    tx = bench_one(lambda x: depthwise_conv_xla(x, w, s, b, True), x)
    gb = 2 * x.size * 4 / (s * s) if s == 2 else 2 * x.size * 4
    print(f"h={h} c={c} s={s}: pallas {tp*1e6:8.1f}us ({x.size*4*(1+1/(s*s))/tp/1e9:6.1f} GB/s) "
          f"xla {tx*1e6:8.1f}us  speedup {tx/tp:5.2f}x")

print("ALL OK" if ok else "FAILURES PRESENT")
