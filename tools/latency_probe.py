"""True single-image device latency: 50 data-dependent forwards inside ONE
jit, so per-call host/tunnel overhead amortizes away (SURVEY.md SS7: 'p50
single-image latency' needs a batch-1 entry; through the tunnel the RTT
dominates a single call)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from mobilenet_tpu import ModelConfig
from mobilenet_tpu.checkpoints import fold_bn, init_params, to_device
from mobilenet_tpu.models import mobilenet_v1

K = 50

def main():
    for dw_backend, dt in [("fused", jnp.bfloat16), ("xla", jnp.bfloat16)]:
        cfg = ModelConfig(alpha=1.0, resolution=224, compute_dtype="bfloat16")
        params = to_device(fold_bn(init_params(cfg, 0), eps=cfg.bn_eps), dtype=dt)
        def chain(x):
            def body(carry, _):
                probs = mobilenet_v1.predict_probs(params, carry, cfg, dw_backend=dw_backend)
                # scalar data dependency: forces strict serialization
                nxt = carry * (1.0 + 1e-6 * jnp.sum(probs).astype(carry.dtype))
                return nxt, jnp.argmax(probs)
            return jax.lax.scan(body, x, None, length=K)
        fn = jax.jit(chain)
        x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (1, 224, 224, 3)), dt)
        out = fn(x); _ = np.asarray(out[1])
        t0 = time.perf_counter()
        out = fn(x); _ = np.asarray(out[1])
        dt_total = time.perf_counter() - t0
        per = (dt_total) / K
        print(f"batch-1 device latency ({dw_backend}): {per*1e3:.3f} ms "
              f"(chain of {K}, total {dt_total*1e3:.1f} ms incl one RTT)")

if __name__ == "__main__":
    main()
