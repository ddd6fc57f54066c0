"""abx — the ONE parameterized e2e A/B race driver (round-5 VERDICT #9).

The 24 single-purpose ab_*/probe_* scripts each hand-rolled the same
scaffold: build a family forward, flip a module flag at trace time, gate
numerics, interleave fenced timing rounds. Several predate the tunnel-
health stamp and would record unstamped rows if re-run. This driver is
that scaffold ONCE, with the stamp, interleaving, and fencing discipline
unconditional:

  # race a module flag e2e (labels:values -> one variant per value)
  python tools/abx.py --model v2 --flag \
      mobilenet_tpu.ops.pallas_expand_s2:FASTMASK=False,True

  # arbitrary labeled variant sets (repeatable; comma-joined assignments)
  python tools/abx.py --model v3 \
      --set base: \
      --set nofm:mobilenet_tpu.ops.pallas_expand_s2:FASTMASK=False

  # int8 path, routing choice, recording
  python tools/abx.py --model v3small --int8 --gate exact --record

Gates: 'exact' (bit-identical logits — flag flips that claim exactness),
'agree' (top-1 agreement == 1.0, bf16 reassociation-class changes),
'none'. Timing: _bench_common.interleave_bench (fenced, interleaved,
medians). --record appends stamped rows to benchmarks/ab_races_v5e.jsonl.

Flags are flipped at TRACE time (module attribute set around the jit
trace), the same mechanism every ab_* tool used; flags resolved inside
impl-jits must be threaded as `=None -> module default` the way
pallas_expand_s2.EO_EXPAND/FASTMASK are.
"""

import argparse
import importlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "benchmarks", "ab_races_v5e.jsonl")


def _split_top(spec: str, sep: str = ","):
    """Split on sep at bracket depth 0 only, so container literals like
    PACKED_SE={4,5} survive ('mod:A={4,5},mod:B=1' -> two parts)."""
    parts, depth, cur = [], 0, []
    for ch in spec:
        if ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        if ch == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return parts


def parse_assignments(spec: str):
    """'mod:FLAG=val,mod2:FLAG2=val2' -> [(module, flag, value)]."""
    out = []
    if not spec:
        return out
    for part in _split_top(spec):
        modflag, val = part.rsplit("=", 1)
        mod, flag = modflag.rsplit(":", 1)
        out.append((mod, flag, eval(val, {}, {})))  # noqa: S307 — literals
    return out


class flag_ctx:
    """Set module flags for the duration of a trace; restore after."""

    def __init__(self, assignments):
        self.assignments = assignments
        self.saved = []

    def __enter__(self):
        for mod, flag, val in self.assignments:
            m = importlib.import_module(mod)
            self.saved.append((m, flag, getattr(m, flag)))
            setattr(m, flag, val)

    def __exit__(self, *exc):
        for m, flag, old in reversed(self.saved):
            setattr(m, flag, old)


def build_forward(args):
    """(cfg, fn(images_u8)->logits) for the family/dtype/routing asked.

    The int8 entries mirror cli._bench_int8_family / Int8Pipeline (one
    construction path with production padding/quantization/routing)."""
    import jax
    import jax.numpy as jnp

    from mobilenet_tpu.ops import preprocess as prep

    dtype = "float32" if args.int8 else "bfloat16"
    if args.model == "v1":
        from mobilenet_tpu import ModelConfig

        cfg = ModelConfig(alpha=args.alpha, resolution=args.res,
                          compute_dtype=dtype)
    elif args.model == "v2":
        from mobilenet_tpu.models.mobilenet_v2 import V2Config

        cfg = V2Config(alpha=args.alpha, resolution=args.res,
                       compute_dtype=dtype)
    else:
        from mobilenet_tpu.models.mobilenet_v3 import V3Config

        cfg = V3Config(variant="large" if args.model == "v3" else "small",
                       alpha=args.alpha, resolution=args.res,
                       minimalistic=args.minimalistic,
                       compute_dtype=dtype)

    if args.int8:
        from mobilenet_tpu.checkpoints import default_folded

        folded = default_folded(cfg, seed=args.seed)
        if args.model == "v1":
            from mobilenet_tpu.quant.model import Int8Pipeline

            return cfg, Int8Pipeline(cfg, seed=args.seed)._infer
        if args.model == "v2":
            from mobilenet_tpu.quant.v2 import make_int8_infer_v2, quantize_v2

            infer, _ = make_int8_infer_v2(quantize_v2(folded, cfg), cfg)
        else:
            from mobilenet_tpu.quant.v3 import make_int8_infer_v3, quantize_v3

            infer, _ = make_int8_infer_v3(quantize_v3(folded, cfg), cfg)
        return cfg, infer

    if args.model == "v1":
        from mobilenet_tpu.checkpoints.io import fold_bn, init_params
        from mobilenet_tpu.models import mobilenet_v1

        folded = fold_bn(init_params(cfg, seed=args.seed), eps=cfg.bn_eps)
        fwd = lambda p, x: mobilenet_v1.forward(
            p, x, cfg, dw_backend=args.routing)
    elif args.model == "v2":
        from mobilenet_tpu.checkpoints.padding import pad_block0_v2
        from mobilenet_tpu.checkpoints.v2 import fold_bn_v2, init_params_v2
        from mobilenet_tpu.models.mobilenet_v2 import forward_v2

        folded = pad_block0_v2(fold_bn_v2(init_params_v2(cfg, seed=args.seed),
                                          eps=cfg.bn_eps))
        fwd = lambda p, x: forward_v2(p, x, cfg, dw_backend=args.routing)
    else:
        from mobilenet_tpu.checkpoints.v3 import fold_bn_v3, init_params_v3
        from mobilenet_tpu.models.mobilenet_v3 import forward_v3

        folded = fold_bn_v3(init_params_v3(cfg, seed=args.seed),
                            eps=cfg.bn_eps)
        fwd = lambda p, x: forward_v3(p, x, cfg, dw_backend=args.routing)

    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), folded)

    def fn(images_u8):
        x = prep.preprocess(images_u8, cfg.resolution, jnp.bfloat16)
        return fwd(params, x)

    return cfg, fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="v1",
                    choices=["v1", "v2", "v3", "v3small"])
    ap.add_argument("--alpha", type=float, default=1.0)
    ap.add_argument("--res", type=int, default=224)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--minimalistic", action="store_true")
    ap.add_argument("--routing", default="fused")
    ap.add_argument("--flag", default=None,
                    help="mod:FLAG=v1,v2,... -> one variant per value")
    ap.add_argument("--set", action="append", default=[],
                    help="label:assignments variant (repeatable)")
    ap.add_argument("--gate", default="exact",
                    choices=["exact", "agree", "none"])
    ap.add_argument("--record", action="store_true",
                    help="append a stamped row to benchmarks/"
                         "ab_races_v5e.jsonl")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from _bench_common import (check_health_band, h2d_class, interleave_bench,
                               load_health_band, make_batch, tunnel_health)

    # The stamp is UNCONDITIONAL (VERDICT r4 #9) — every abx run knows the
    # tunnel state it measured in, and refuses a degraded one.
    stamp = tunnel_health()
    ok, reasons = check_health_band(stamp, load_health_band())
    if not ok:
        print(f"TUNNEL DEGRADED: {'; '.join(reasons)} — refusing to race")
        return 2

    variants = []
    if args.flag:
        modflag, vals = args.flag.rsplit("=", 1)
        for v in _split_top(vals):
            variants.append((f"{modflag.rsplit(':', 1)[1]}={v}",
                             parse_assignments(f"{modflag}={v}")))
    for s in getattr(args, "set"):
        label, _, assigns = s.partition(":")
        variants.append((label, parse_assignments(assigns)))
    if len(variants) < 2:
        print("need >= 2 variants (--flag with 2+ values, or 2+ --set)")
        return 1

    # Build EACH arm's forward under its flag context: build_forward may
    # pre-jit (the int8 infer entries are jax.jit closures) and a single
    # shared inner jit would serve arm 1's cached trace to arm 2 — a
    # fresh build per arm gives every arm its own inner jit objects, and
    # the trace itself also runs under the context (first call below).
    entries = {}
    arm_fns = {}
    for label, assigns in variants:
        with flag_ctx(assigns):
            cfg, arm_fn = build_forward(args)
        arm_fns[label] = (arm_fn, tuple(assigns))

        def fn(u8, _label=label):
            _arm, _assigns = arm_fns[_label]
            with flag_ctx(list(_assigns)):
                return _arm(u8)

        entries[label] = jax.jit(fn)

    img = make_batch(args.batch, args.res, seed=args.seed)
    ys = {}
    for label, fn in entries.items():
        t0 = time.perf_counter()
        ys[label] = np.asarray(fn(img)).astype(np.float64)
        print(f"{label}: compile+warm {time.perf_counter() - t0:.1f}s",
              flush=True)
    labels = list(entries)
    ref = ys[labels[0]]
    for label in labels[1:]:
        d = np.abs(ys[label] - ref)
        agree = float((ys[label].argmax(1) == ref.argmax(1)).mean())
        print(f"{label} vs {labels[0]}: max_abs {d.max():.4e}, "
              f"top-1 agreement {agree:.4f}", flush=True)
        if args.gate == "exact":
            assert d.max() == 0.0, f"{label}: exact gate FAILED"
        elif args.gate == "agree":
            assert agree == 1.0, f"{label}: agreement gate FAILED"

    meds = interleave_bench(entries, img, args.batch, args.steps,
                            args.rounds)
    if args.record:
        row = {"tool": "abx", "variant": cfg.variant_name(),
               "model": args.model, "batch": args.batch,
               "dtype": "int8" if args.int8 else "bfloat16",
               "routing": args.routing, "gate": args.gate,
               "medians_ms": {k: round(v, 3) for k, v in meds.items()},
               "images_per_sec": {k: round(args.batch / v * 1e3, 1)
                                  for k, v in meds.items()},
               "health": {k: stamp[k] for k in
                          ("rtt_ms", "h2d_gbps", "utc") if k in stamp},
               "h2d_class": h2d_class(stamp)}
        with open(ART, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(f"recorded to {ART}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
