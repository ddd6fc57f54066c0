"""Measured backend routing: pick the fastest dw/pw execution backend.

The reference's analog of "routing" was compile-time: one FPGA bitstream per
configuration (SURVEY.md SS5 config system). On TPU the same network has
several legal executions per block (XLA grouped conv, standalone Pallas dw,
fused/packed Pallas blocks, and the mixed xla/fused tuple —
models.mobilenet_v1.DW_BACKENDS + "mixed"), and the best choice depends on
batch size and hardware. The shipped "auto" routing encodes the measured
defaults for v5e; this module re-derives them empirically on whatever device
is present, for both the bf16 and the int8 fixed-point paths.

Measurement discipline (docs/design.md SS5): standalone micro-benches through
the tunneled TPU mislead by +-40%, so candidates are compared END-TO-END on
the full network. Two modes, keyed by what the number must mean:
  - throughput (batch >= 2): fetch-fenced >=1.5 s windows, img/s, higher wins
  - latency (batch 1): RTT-cancelled DIFFERENCED scan chains
    (utils.timing.differenced_chain_ms), ms/forward, lower wins — a fenced
    window at batch 1 is tunnel-dispatch-dominated and cannot rank
    sub-millisecond candidates.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from ..config import ModelConfig


def _float_latency_ms(config: ModelConfig, params, dw_backend, dtype,
                      chain_len: int = 50) -> float:
    """Batch-1 device latency of the float path under one routing spec."""
    import jax
    import jax.numpy as jnp

    from ..models import mobilenet_v1
    from ..utils.timing import differenced_chain_ms

    def make(length):
        def chain(x):
            def body(carry, _):
                probs = mobilenet_v1.predict_probs(
                    params, carry, config, dw_backend=dw_backend)
                nxt = carry * (1.0 + 1e-6 * jnp.sum(probs).astype(carry.dtype))
                return nxt, jnp.argmax(probs)

            return jax.lax.scan(body, x, None, length=length)

        return jax.jit(chain)

    res = config.resolution
    x = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (1, res, res, 3)), dtype)
    return differenced_chain_ms(make, x, chain_len)


def _int8_latency_ms(config: ModelConfig, dev, use_fused,
                     chain_len: int = 50) -> float:
    """Batch-1 device latency of the int8 path under one routing spec."""
    import jax
    import jax.numpy as jnp

    from ..ops import preprocess as prep
    from ..quant import ops as qops
    from ..quant.model import forward_i8
    from ..quant.quantize import ACT_IN_SCALE
    from ..utils.timing import differenced_chain_ms

    def make(length):
        def chain(u8):
            def body(carry, _):
                x = prep.preprocess(carry, config.resolution, jnp.float32)
                x_q = qops.quantize_input_dev(x, ACT_IN_SCALE,
                                              out_dtype=jnp.bfloat16)
                logits = forward_i8(dev, x_q, config, use_fused=use_fused)
                cls = jnp.argmax(logits)
                # saturate in int32: uint8 addition would wrap 255->0
                nxt = jnp.clip(carry.astype(jnp.int32) + cls % 2,
                               0, 255).astype(jnp.uint8)
                return nxt, cls

            return jax.lax.scan(body, u8, None, length=length)

        return jax.jit(chain)

    res = config.resolution
    u8 = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (1, res, res, 3), dtype=np.uint8))
    return differenced_chain_ms(make, u8, chain_len)


def _int8_family_latency_ms(config, forward_fn, dev, use_fused,
                            chain_len: int = 50) -> float:
    """Batch-1 device latency of a V2/V3 int8 path under one routing spec
    (forward_fn: quant.v2.forward_v2_i8 or quant.v3.forward_v3_i8 — both
    take (dev, x_q, config, use_fused=...))."""
    import jax
    import jax.numpy as jnp

    from ..ops import preprocess as prep
    from ..quant import ops as qops
    from ..quant.quantize import ACT_IN_SCALE
    from ..utils.timing import differenced_chain_ms

    def make(length):
        def chain(u8):
            def body(carry, _):
                x = prep.preprocess(carry, config.resolution, jnp.float32)
                x_q = qops.quantize_input_dev(x, ACT_IN_SCALE,
                                              out_dtype=jnp.bfloat16)
                logits = forward_fn(dev, x_q, config, use_fused=use_fused)
                cls = jnp.argmax(logits)
                nxt = jnp.clip(carry.astype(jnp.int32) + cls % 2,
                               0, 255).astype(jnp.uint8)
                return nxt, cls

            return jax.lax.scan(body, u8, None, length=length)

        return jax.jit(chain)

    res = config.resolution
    u8 = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (1, res, res, 3), dtype=np.uint8))
    return differenced_chain_ms(make, u8, chain_len)


def _float_latency_ms_v2(config, params, dw_backend, dtype,
                         chain_len: int = 50) -> float:
    """Batch-1 device latency of the V2 float path under one routing.
    `params` must already carry the routing's production padding
    (pad_block0_v2 for fused — the shipped tree, runtime/pipeline.py)."""
    import jax
    import jax.numpy as jnp

    from ..models.mobilenet_v2 import predict_probs_v2
    from ..utils.timing import differenced_chain_ms

    def make(length):
        def chain(x):
            def body(carry, _):
                probs = predict_probs_v2(
                    params, carry, config, dw_backend=dw_backend)
                nxt = carry * (1.0 + 1e-6 * jnp.sum(probs).astype(carry.dtype))
                return nxt, jnp.argmax(probs)

            return jax.lax.scan(body, x, None, length=length)

        return jax.jit(chain)

    res = config.resolution
    x = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (1, res, res, 3)), dtype)
    return differenced_chain_ms(make, x, chain_len)


def _autotune_v2(config, batch_size, steps, candidates, seed, params,
                 int8, mode) -> Tuple[str, Dict[str, float]]:
    """V2 family race: xla vs the fused IR-kernel routing — float (bf16)
    AND int8 (the fused int8 IR kernel, pallas_ir_i8.py, is bit-identical
    to the XLA int8 route, so the race is purely about schedule)."""
    import jax
    import jax.numpy as jnp

    on_tpu = jax.default_backend() == "tpu"
    if candidates is None:
        if not on_tpu:
            candidates = ("xla",)
        elif not int8 and mode == "latency":
            # float batch 1 additionally races the measured mixed tuple
            # (models.mobilenet_v2.mixed_b1_routing_v2 — the v5e winner
            # at 1.0-224, tools/ab_mixed_b1.py); the int8 family path is
            # a use_fused bool, no per-block middle ground to race.
            candidates = ("xla", "fused", "mixed")
        else:
            candidates = ("xla", "fused")

    results: Dict[str, float] = {}
    if int8:
        from ..quant.v2 import Int8PipelineV2

        if mode == "latency":
            from ..checkpoints.v2 import fold_bn_v2, init_params_v2
            from ..quant.v2 import (_as_device_tree_v2, forward_v2_i8,
                                    quantize_v2)

            folded = params if params is not None else fold_bn_v2(
                init_params_v2(config, seed=seed), eps=config.bn_eps)
            dev = _as_device_tree_v2(quantize_v2(folded, config))
            for cand in candidates:
                results[cand] = _int8_family_latency_ms(
                    config, forward_v2_i8, dev, cand == "fused")
            valid = {k: v for k, v in results.items() if v == v}
            best = min(valid, key=valid.get) if valid else candidates[0]
            return best, results
        for cand in candidates:
            pipe = Int8PipelineV2(config, seed=seed, params=params,
                                  use_fused=cand == "fused")
            results[cand] = _throughput(
                lambda imgs, _p=pipe: _p._probs(imgs), None, config,
                batch_size, steps)
        return max(results, key=results.get), results

    if mode == "latency":
        from ..checkpoints.padding import pad_block0_v2
        from ..checkpoints.v2 import fold_bn_v2, init_params_v2

        dtype = (jnp.bfloat16 if config.compute_dtype == "bfloat16"
                 else jnp.float32)
        folded = params if params is not None else fold_bn_v2(
            init_params_v2(config, seed=seed), eps=config.bn_eps)
        for cand in candidates:
            # fused/mixed time on the block0-padded tree — the one the
            # production pipeline ships for those routings.
            tree = (pad_block0_v2(folded) if cand in ("fused", "mixed")
                    else folded)
            dev = jax.tree.map(lambda a: jnp.asarray(a, dtype), tree)
            results[cand] = _float_latency_ms_v2(config, dev, cand, dtype)
        valid = {k: v for k, v in results.items() if v == v}
        best = min(valid, key=valid.get) if valid else candidates[0]
        return best, results

    from .pipeline import InferencePipeline

    for cand in candidates:
        pipe = InferencePipeline(config, seed=seed, dw_backend=cand,
                                 params=params)
        entry = pipe._entry("probs_u8")
        results[cand] = _throughput(entry, pipe.params, config,
                                    batch_size, steps)
    return max(results, key=results.get), results


def _autotune_v3(config, batch_size, steps, candidates, seed, params,
                 int8, mode) -> Tuple[str, Dict[str, float]]:
    """V3 family race: xla vs the fused bottleneck routing — float (SE
    in-kernel, ops/pallas_ir_v3.py) AND int8 (the fused int8 V3 kernel,
    pallas_ir_v3_i8.py, is bit-identical, so the race is pure schedule)."""
    import jax
    import jax.numpy as jnp

    on_tpu = jax.default_backend() == "tpu"
    if candidates is None:
        if not on_tpu:
            candidates = ("xla",)
        elif not int8 and mode == "latency":
            # float batch 1 additionally races the measured mixed tuple
            # (models.mobilenet_v3.mixed_b1_routing — the v5e winner at
            # Large 1.0-224, tools/ab_mixed_b1.py); the int8 family path
            # is a use_fused bool, no per-block middle ground to race.
            candidates = ("xla", "fused", "mixed")
        else:
            candidates = ("xla", "fused")
    if int8:
        from ..quant.v3 import Int8PipelineV3

        if mode == "latency":
            from ..checkpoints import default_folded
            from ..quant.v3 import (_as_device_tree_v3, forward_v3_i8,
                                    quantize_v3)

            folded = params if params is not None else default_folded(
                config, seed=seed)
            dev = _as_device_tree_v3(quantize_v3(folded, config))
            lat: Dict[str, float] = {}
            for cand in candidates:
                lat[cand] = _int8_family_latency_ms(
                    config, forward_v3_i8, dev, cand == "fused")
            valid = {k: v for k, v in lat.items() if v == v}
            best = min(valid, key=valid.get) if valid else candidates[0]
            return best, lat
        res: Dict[str, float] = {}
        for cand in candidates:
            pipe = Int8PipelineV3(config, seed=seed, params=params,
                                  use_fused=cand == "fused")
            res[cand] = _throughput(
                lambda imgs, _p=pipe: _p._probs(imgs), None, config,
                batch_size, steps)
        return max(res, key=res.get), res

    results: Dict[str, float] = {}
    if mode == "latency":
        from ..checkpoints import default_folded
        from ..models.mobilenet_v3 import predict_probs_v3
        from ..utils.timing import differenced_chain_ms

        dtype = (jnp.bfloat16 if config.compute_dtype == "bfloat16"
                 else jnp.float32)
        folded = params if params is not None else default_folded(
            config, seed=seed)
        dev = jax.tree.map(lambda a: jnp.asarray(a, dtype), folded)
        res = config.resolution
        x = jnp.asarray(np.random.default_rng(0).uniform(
            -1, 1, (1, res, res, 3)), dtype)
        for cand in candidates:
            def make(length, _cand=cand):
                def chain(x0):
                    def body(carry, _):
                        probs = predict_probs_v3(dev, carry, config,
                                                 dw_backend=_cand)
                        nxt = carry * (1.0 + 1e-6 * jnp.sum(probs).astype(
                            carry.dtype))
                        return nxt, jnp.argmax(probs)

                    return jax.lax.scan(body, x0, None, length=length)

                return jax.jit(chain)

            results[cand] = differenced_chain_ms(make, x, 50)
        valid = {k: v for k, v in results.items() if v == v}
        best = min(valid, key=valid.get) if valid else candidates[0]
        return best, results

    from .pipeline import InferencePipeline

    for cand in candidates:
        pipe = InferencePipeline(config, seed=seed, dw_backend=cand,
                                 params=params)
        entry = pipe._entry("probs_u8")
        results[cand] = _throughput(entry, pipe.params, config,
                                    batch_size, steps)
    return max(results, key=results.get), results


def autotune_backend(
    config: ModelConfig,
    batch_size: int = 256,
    steps: int = 10,
    candidates: Optional[Sequence[str]] = None,
    seed: int = 0,
    params=None,
    int8: bool = False,
    mode: Optional[str] = None,
) -> Tuple[str, Dict[str, float]]:
    """Measure every candidate routing e2e; return (best, {name: value}).

    mode: "throughput" (img/s, higher wins) or "latency" (ms, lower wins);
    default picks latency for batch_size == 1. Candidates default to the
    routings worth racing on the current device: all backends + "mixed" on
    TPU, just "xla" on CPU (Pallas would run in interpret mode there — the
    sw_emu tier, not a performance candidate). A V2Config races the V2
    family's candidates (xla vs the fused IR routing) the same way.
    """
    import jax
    import jax.numpy as jnp

    from ..models.mobilenet_v1 import DW_BACKENDS
    from ..models.mobilenet_v2 import V2Config

    on_tpu = jax.default_backend() == "tpu"
    if mode is None:
        mode = "latency" if batch_size == 1 else "throughput"
    if isinstance(config, V2Config):
        return _autotune_v2(config, batch_size, steps, candidates, seed,
                            params, int8, mode)
    from ..models.mobilenet_v3 import V3Config

    if isinstance(config, V3Config):
        return _autotune_v3(config, batch_size, steps, candidates, seed,
                            params, int8, mode)
    if candidates is None:
        if not on_tpu:
            candidates = ("xla",)
        elif int8:
            candidates = ("xla", "fused", "mixed")
        else:
            candidates = tuple(DW_BACKENDS) + ("mixed",)

    results: Dict[str, float] = {}
    if int8:
        from ..checkpoints import fold_bn, init_params
        from ..quant.model import (Int8Pipeline, _as_device_tree,
                                   quantize_for_device)

        if mode == "latency":
            folded = params if params is not None else fold_bn(
                init_params(config, seed=seed), eps=config.bn_eps)
            # Quantize PER ROUTING: padding is bit-neutral but NOT
            # time-neutral — production 'xla' runs unpadded (Int8Pipeline
            # only pads for fused-containing routings), so timing xla on a
            # padded tree would bias the race against it on padding-needing
            # configs (0.75 family etc.).
            trees: Dict[bool, dict] = {}
            for cand in candidates:
                key = cand != "xla"
                if key not in trees:
                    trees[key] = _as_device_tree(
                        quantize_for_device(folded, config, use_fused=key))
                results[cand] = _int8_latency_ms(config, trees[key], cand)
        else:
            for cand in candidates:
                pipe = Int8Pipeline(config, seed=seed, params=params,
                                    use_fused=cand)
                results[cand] = _throughput(pipe._infer, None, config,
                                            batch_size, steps)
    else:
        from .pipeline import InferencePipeline

        if mode == "latency":
            from ..checkpoints import fold_bn, init_params, to_device

            dtype = (jnp.bfloat16 if config.compute_dtype == "bfloat16"
                     else jnp.float32)
            folded = params if params is not None else fold_bn(
                init_params(config, seed=seed), eps=config.bn_eps)
            from ..checkpoints.padding import needs_padding, pad_channels

            # Pad only for the candidates that ship padded (fused/mixed/
            # auto); xla and pallas run unpadded in production
            # (InferencePipeline), and timing them on a padded tree biases
            # the race — same reasoning as the int8 branch above.
            padded = (pad_channels(folded) if needs_padding(folded)
                      else folded)
            dev_by_pad = {}
            for cand in candidates:
                pad = cand not in ("xla", "pallas")
                if pad not in dev_by_pad:
                    dev_by_pad[pad] = to_device(
                        padded if pad else folded, dtype=dtype)
                results[cand] = _float_latency_ms(
                    config, dev_by_pad[pad], cand, dtype)
        else:
            for cand in candidates:
                pipe = InferencePipeline(config, seed=seed, dw_backend=cand,
                                         params=params)
                entry = pipe._entry("probs_u8")
                results[cand] = _throughput(entry, pipe.params, config,
                                            batch_size, steps)

    if mode == "latency":
        # NaN = failed measurement (tunnel noise); never crown it.
        valid = {k: v for k, v in results.items() if v == v}
        best = min(valid, key=valid.get) if valid else candidates[0]
    else:
        best = max(results, key=results.get)
    return best, results


def _throughput(entry, params, config: ModelConfig, batch_size: int,
                steps: int) -> float:
    """Fetch-fenced e2e img/s for one compiled entry (params=None for
    entries that close over their weights, e.g. Int8Pipeline._infer)."""
    import jax
    import jax.numpy as jnp

    from ..utils.timing import fenced_window

    rng = np.random.default_rng(0)
    res = config.resolution
    img = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (batch_size, res, res, 3), dtype=np.uint8)))
    run = (lambda: entry(img)) if params is None else (
        lambda: entry(params, img))

    def sync(out):
        return np.asarray(out[0, :4])  # fetch-fenced (tunnel-safe)

    sync(run())  # compile + warm
    for _ in range(2):
        out = run()
    sync(out)
    # The fence is a constant additive RTT, so candidate ORDERING is
    # fence-proof — but extend short windows anyway so the reported
    # magnitudes match bench/sweep (fence amortized below ~2%).
    dt, n = fenced_window(run, sync, steps)
    return n * batch_size / dt
