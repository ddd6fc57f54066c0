"""True single-image device latency by DIFFERENCED scan chains: K
data-dependent forwards inside one jit serialize K real forwards, but the
timed fetch still carries one fixed tunnel RTT — dt/K overstates latency by
RTT/K (0.56 ms at K=50 against a ~0.13 ms forward). Chains of K and 4K are
timed and differenced, cancelling the RTT exactly:
latency = (dt_4K - dt_K) / 3K. Covers bf16 (fused + xla routing) and the
int8 fixed-point path."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from mobilenet_tpu import ModelConfig
from mobilenet_tpu.checkpoints import fold_bn, init_params, to_device
from mobilenet_tpu.models import mobilenet_v1

K = 50

def _measure(label, make_fn, x):
    from mobilenet_tpu.utils.timing import differenced_chain_ms

    ms = differenced_chain_ms(make_fn, x, K)
    print(f"batch-1 device latency ({label}): {ms:.4f} ms "
          f"(differenced chains of {K} and {4*K}; RTT cancelled)",
          flush=True)

def main():
    if "--model" in sys.argv and "v2" in sys.argv:
        return main_v2()
    cfg = ModelConfig(alpha=1.0, resolution=224, compute_dtype="bfloat16")
    folded = fold_bn(init_params(cfg, 0), eps=cfg.bn_eps)
    for dw_backend, dt in [("fused", jnp.bfloat16), ("xla", jnp.bfloat16),
                           ("auto", jnp.bfloat16)]:  # auto = mixed at batch 1
        params = to_device(folded, dtype=dt)
        def make(length, dw_backend=dw_backend):
            def chain(x):
                def body(carry, _):
                    probs = mobilenet_v1.predict_probs(params, carry, cfg, dw_backend=dw_backend)
                    # scalar data dependency: forces strict serialization
                    nxt = carry * (1.0 + 1e-6 * jnp.sum(probs).astype(carry.dtype))
                    return nxt, jnp.argmax(probs)
                return jax.lax.scan(body, x, None, length=length)
            return jax.jit(chain)
        x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (1, 224, 224, 3)), dt)
        _measure(dw_backend, make, x)

    # int8 fixed-point path: the quantized network on the same chained-
    # forward method (uint8 carry perturbed via the argmax class index).
    from mobilenet_tpu.quant.model import (_as_device_tree, forward_i8,
                                           quantize_for_device)
    from mobilenet_tpu.quant import ops as qops
    from mobilenet_tpu.quant.quantize import ACT_IN_SCALE
    from mobilenet_tpu.ops import preprocess as prep

    dev = _as_device_tree(quantize_for_device(folded, cfg))
    for fused, label in [(True, "int8 fused"), (False, "int8 xla")]:
        def make_i8(length, fused=fused):
            def chain_i8(u8):
                def body(carry, _):
                    x = prep.preprocess(carry, cfg.resolution, jnp.float32)
                    x_q = qops.quantize_input_dev(x, ACT_IN_SCALE,
                                                  out_dtype=jnp.bfloat16)
                    logits = forward_i8(dev, x_q, cfg, use_fused=fused)
                    cls = jnp.argmax(logits)
                    # saturate in int32: uint8 addition would wrap 255->0
                    # before a clip could see it
                    nxt = jnp.clip(carry.astype(jnp.int32) + cls % 2,
                                   0, 255).astype(jnp.uint8)
                    return nxt, cls
                return jax.lax.scan(body, u8, None, length=length)
            return jax.jit(chain_i8)
        u8 = jnp.asarray(np.random.default_rng(0).integers(
            0, 256, (1, 224, 224, 3), dtype=np.uint8))
        _measure(label, make_i8, u8)

def main_v2():
    """V2 batch-1 device latency (xla vs the fused IR-kernel routing),
    same differenced-chain method. Usage: latency_probe.py --model v2."""
    from mobilenet_tpu.checkpoints.padding import pad_block0_v2
    from mobilenet_tpu.checkpoints.v2 import fold_bn_v2, init_params_v2
    from mobilenet_tpu.models.mobilenet_v2 import V2Config, predict_probs_v2

    cfg = V2Config(alpha=1.0, resolution=224, compute_dtype="bfloat16")
    folded = fold_bn_v2(init_params_v2(cfg, 0), eps=cfg.bn_eps)
    trees = {"xla": folded, "fused": pad_block0_v2(folded)}  # as shipped
    for backend in ("xla", "fused"):
        params = jax.tree.map(
            lambda a: jnp.asarray(a, jnp.bfloat16), trees[backend])
        def make(length, backend=backend):
            def chain(x):
                def body(carry, _):
                    probs = predict_probs_v2(params, carry, cfg,
                                             dw_backend=backend)
                    nxt = carry * (1.0 + 1e-6 * jnp.sum(probs).astype(carry.dtype))
                    return nxt, jnp.argmax(probs)
                return jax.lax.scan(body, x, None, length=length)
            return jax.jit(chain)
        x = jnp.asarray(np.random.default_rng(0).uniform(
            -1, 1, (1, 224, 224, 3)), jnp.bfloat16)
        _measure(f"v2 {backend}", make, x)


if __name__ == "__main__":
    main()
