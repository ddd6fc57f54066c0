"""A/B stem (preprocess + conv1) formulations on the chip.

The roofline audit (tools/roofline.py) puts conv1+pre at ~2.3 ms/batch-256
measured vs a 0.30 ms HBM floor (~13%) — the single worst segment. Round-1
attacks (Pallas stem, stem+B0 mega-kernel, im2col stem — docs/design.md
SS3.3c) lost to XLA's native conv; this tool attacks the XLA FORMULATION
instead: a 3-channel 3x3 s2 conv maps terribly onto 128-lane tiles, but the
same computation can be phrased as a space-to-depth patch matmul whose
operand shapes tile far better.

Candidates (all mathematically the stem: normalize -> 3x3 s2 SAME conv ->
bias -> relu6):
  base     preprocess + lax.conv_general_dilated (what ships today)
  s2d9     9 strided patch slices -> [N,112,112,27] @ [27,32]
  s2d4     2x2 phase space-to-depth -> [N,113,113,12] -> 2x2 VALID conv

(A normalize-folded-into-weights u8 variant was tried and is mathematically
WRONG at SAME-padded borders — zero padding in u8 space normalizes to -1,
not 0 — and buys nothing anyway: the scalar affine fuses into the conv
input production under XLA.)

Every candidate is gated against base within bf16 tolerance before timing
(--check runs the gate alone on any backend).

  python tools/ab_stem2.py --check              # CPU numerics gate
  python tools/ab_stem2.py                      # race on the chip
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax


def _stem_params(cfg, seed=0):
    from mobilenet_tpu.checkpoints import fold_bn, init_params

    params = fold_bn(init_params(cfg, seed=seed), eps=cfg.bn_eps)
    w = np.asarray(params["conv1"]["w"], np.float32)  # [3,3,3,C1] HWIO
    b = np.asarray(params["conv1"]["b"], np.float32)  # [C1]
    return w, b


def _w9(w):
    """[3,3,3,C] HWIO -> [27,C] patch-matmul weights, (dy,dx,c) minor-c."""
    return w.reshape(27, w.shape[-1])


def _w4(w):
    """[3,3,3,C] -> [2,2,12,C] for the 2x2-phase space-to-depth conv.
    Channel packing follows the (2,2,3) reshape: idx = p*6 + q*3 + c."""
    c1 = w.shape[-1]
    w2 = np.zeros((2, 2, 12, c1), w.dtype)
    for a in range(2):
        for b_ in range(2):
            for p in range(2):
                for q in range(2):
                    ky, kx = 2 * a + p, 2 * b_ + q
                    if ky < 3 and kx < 3:
                        w2[a, b_, p * 6 + q * 3: p * 6 + q * 3 + 3] = w[ky, kx]
    return w2


def _relu6b(y, b):
    return jnp.clip(y + b, 0.0, 6.0)


def build_candidates(cfg, dtype=jnp.bfloat16):
    """{name: jit_fn(u8 NHWC) -> stem activation [N,112,112,C1]}."""
    from mobilenet_tpu.ops import conv as ops
    from mobilenet_tpu.ops import preprocess as prep

    w, b = _stem_params(cfg)
    res = cfg.resolution
    ho = res // 2

    def as_dt(a):
        return jnp.asarray(a, dtype)

    wD, bD = as_dt(w), as_dt(b)
    w9D = as_dt(_w9(w))
    w4D = as_dt(_w4(w))

    def patches9(x):
        """x [N,res,res,3] -> [N,ho,ho,27]; SAME pad for even res is
        (0,1) x (0,1)."""
        xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        cols = [xp[:, dy:dy + res - 1:2, dx:dx + res - 1:2, :]
                for dy in range(3) for dx in range(3)]
        return jnp.concatenate(cols, axis=-1)

    def phases4(x):
        """x -> [N, res/2+1, res/2+1, 12] 2x2 space-to-depth (pad to
        res+2 so the +1 block row holds input row res (zeros beyond))."""
        n = x.shape[0]
        h2 = res // 2 + 1
        xp = jnp.pad(x, ((0, 0), (0, 2), (0, 2), (0, 0)))
        return (xp.reshape(n, h2, 2, h2, 2, 3)
                .transpose(0, 1, 3, 2, 4, 5)
                .reshape(n, h2, h2, 12))

    def base(u8):
        x = prep.preprocess(u8, res, dtype)
        return ops.conv2d_same(x, wD, 2, bias=bD, relu6=True)

    def s2d9(u8):
        x = prep.preprocess(u8, res, dtype)
        y = jnp.dot(patches9(x), w9D, preferred_element_type=jnp.float32)
        return _relu6b(y, b).astype(dtype)

    def conv4(x, wc, bc):
        y = lax.conv_general_dilated(
            x, wc, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return _relu6b(y[:, :ho, :ho, :], jnp.asarray(bc, jnp.float32)
                       ).astype(dtype)

    def s2d4(u8):
        x = prep.preprocess(u8, res, dtype)
        return conv4(phases4(x), w4D, b)

    return {"base": jax.jit(base), "s2d9": jax.jit(s2d9),
            "s2d4": jax.jit(s2d4)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--alpha", type=float, default=1.0)
    ap.add_argument("--res", type=int, default=224)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--check", action="store_true",
                    help="numerics gate only (any backend)")
    ap.add_argument("--backend", default=None)
    ap.add_argument("--candidates", default=None,
                    help="comma list; default all")
    args = ap.parse_args()

    if args.backend:
        jax.config.update("jax_platforms", args.backend)

    from mobilenet_tpu import ModelConfig
    from mobilenet_tpu.utils.timing import fenced_window

    cfg = ModelConfig(alpha=args.alpha, resolution=args.res,
                      compute_dtype="bfloat16")
    cands = build_candidates(cfg)
    if args.candidates:
        keep = args.candidates.split(",")
        cands = {k: v for k, v in cands.items() if k in keep or k == "base"}

    nb = 8 if args.check else args.batch
    rng = np.random.default_rng(0)
    img = jax.device_put(jnp.asarray(rng.integers(
        0, 256, (nb, args.res, args.res, 3), dtype=np.uint8)))

    ref = None
    for name, fn in cands.items():
        t0 = time.perf_counter()
        out = np.asarray(fn(img), np.float32)
        dt = time.perf_counter() - t0
        if ref is None:
            ref = out
            print(f"compile {name}: {dt:5.1f}s (reference)", flush=True)
            continue
        # bf16 tolerance: one rounding step on inputs ~1e-2 relative over a
        # 27-term dot; relu6 bounds activations to [0,6]
        err = np.abs(out - ref).max()
        ok = err < 6e-2
        print(f"compile {name}: {dt:5.1f}s  max_abs vs base {err:.4f} "
              f"{'OK' if ok else 'FAIL'}", flush=True)
        if not ok:
            raise SystemExit(f"{name} numerics gate failed ({err})")
    if args.check:
        print("CHECK OK: all candidates match base within the bf16 gate")
        return

    def sync(o):
        return np.asarray(o[0, :4])

    meas = {p: [] for p in cands}
    for _ in range(args.rounds):
        for p, fn in cands.items():
            sync(fn(img))
            dt, n = fenced_window(lambda fn=fn: fn(img), sync, args.steps)
            meas[p].append(dt / n * 1e3)
    for p in cands:
        med = float(np.median(meas[p]))
        print(json.dumps({"candidate": p, "ms_per_batch": round(med, 3),
                          "images_per_sec": round(args.batch / med * 1e3, 1),
                          "runs_ms": [round(v, 3) for v in meas[p]]}),
              flush=True)


if __name__ == "__main__":
    main()
