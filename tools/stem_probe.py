"""Stem experiment probe: is XLA's 3-channel 3x3-s2 conv the best stem?

Measures, each as ONE jit at batch N (fetch-fenced, async step loop):
  a) normalize only                  — the fixed per-call + preprocess floor
  b) normalize + XLA conv1 (current routing)
  c) normalize + space-to-depth(2x2) + 2x2 VALID conv, K=48
     (b) and (c) compute the same function: W2[cy,cx,(py,px,c),oc] =
     W[2cy+py, 2cx+px, c, oc], zero where 2cy+py > 2 — s2d trades the
     3-channel im2col (K=27, lane-starved) for K=48 at 4 taps.

Usage: python tools/stem_probe.py [--batch 256] [--steps 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def s2d_conv1(x, w, b, relu6):
    """Space-to-depth stem: x (N,H,W,3) normalized -> (N,H/2,W/2,Cout)."""
    n, h, wd, c = x.shape
    co = w.shape[3]
    # SAME for k=3,s=2,even input: pad lo=0, hi=1 -> taps at 2i..2i+2.
    xs = x.reshape(n, h // 2, 2, wd // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    xs = xs.reshape(n, h // 2, wd // 2, 4 * c)
    xs = jnp.pad(xs, ((0, 0), (0, 1), (0, 1), (0, 0)))
    w2 = jnp.zeros((2, 2, 2, 2, c, co), w.dtype)
    for dy in range(3):
        for dx in range(3):
            cy, py = divmod(dy, 2)
            cx, px = divmod(dx, 2)
            w2 = w2.at[cy, cx, py, px].set(w[dy, dx])
    w2 = w2.reshape(2, 2, 4 * c, co)  # (cy, cx, (py,px,c), oc)
    y = jax.lax.conv_general_dilated(
        xs, w2, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y + b
    y = jnp.maximum(y, 0.0)
    if relu6:
        y = jnp.minimum(y, 6.0)
    return y


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--res", type=int, default=224)
    args = ap.parse_args()

    from mobilenet_tpu import ModelConfig
    from mobilenet_tpu.checkpoints import fold_bn, init_params, to_device
    from mobilenet_tpu.ops import conv as ops
    from mobilenet_tpu.ops import preprocess as prep

    cfg = ModelConfig(alpha=1.0, resolution=args.res, compute_dtype="bfloat16")
    params = to_device(fold_bn(init_params(cfg, seed=0), eps=cfg.bn_eps),
                       dtype=jnp.bfloat16)
    w1, b1 = params["conv1"]["w"], params["conv1"]["b"]

    def a_fn(u8):
        x = prep.preprocess(u8, cfg.resolution, jnp.bfloat16)
        return jnp.sum(x.astype(jnp.float32)).reshape(1)

    def b_fn(u8):
        x = prep.preprocess(u8, cfg.resolution, jnp.bfloat16)
        y = ops.conv2d_same(x, w1, 2, bias=b1, relu6=cfg.relu6)
        return jnp.sum(y.astype(jnp.float32)).reshape(1)

    def c_fn(u8):
        x = prep.preprocess(u8, cfg.resolution, jnp.bfloat16)
        y = s2d_conv1(x, w1, b1, cfg.relu6)
        return jnp.sum(y.astype(jnp.float32)).reshape(1)

    rng = np.random.default_rng(0)
    img = jax.device_put(jnp.asarray(rng.integers(
        0, 256, (args.batch, args.res, args.res, 3), dtype=np.uint8)))

    # correctness: s2d == XLA conv (same function, bf16 tolerance)
    small = img[:4]
    x = prep.preprocess(small, cfg.resolution, jnp.bfloat16)
    yb = np.asarray(ops.conv2d_same(x, w1, 2, bias=b1, relu6=cfg.relu6),
                    np.float32)
    yc = np.asarray(s2d_conv1(x, w1, b1, cfg.relu6), np.float32)
    err = np.max(np.abs(yb - yc))
    print(f"s2d vs conv max_abs err: {err:.5f} (bf16 tolerance)", flush=True)

    for name, fn in [("a:pre", a_fn), ("b:pre+conv", b_fn), ("c:pre+s2d", c_fn)]:
        f = jax.jit(fn)
        _ = np.asarray(f(img))
        _ = np.asarray(f(img))
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = f(img)
        _ = np.asarray(out)
        ms = (time.perf_counter() - t0) / args.steps * 1e3
        print(f"{name:>12}: {ms:7.3f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
