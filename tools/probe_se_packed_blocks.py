"""Per-block standalone race: lane-packed s1 SE kernel vs the dense
whole-image V3 kernel, at each geometry the PACKED_SE route captures.

The e2e A/B (tools/ab_se_packed.py, 2026-08-19) measured the route a
LOSS at V3-Large 1.0-224 (15,207 vs 16,009 img/s dense, top-1
identical); this probe answers whether the loss is uniform or one
block's. Geometries are captured from the real model trace (both
routings, shape-only via jax.eval_shape with recording wrappers), so
each arm times exactly what the network would run — including the
widened cin the packed-s2 producers hand downstream blocks.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def capture_geometries(cfg, params, batch):
    """Trace forward_v3 twice (packed route on/off); record every
    se_block_packed call and every dense v3_block_pallas call."""
    from mobilenet_tpu.models import mobilenet_v3 as mod
    from mobilenet_tpu.models.mobilenet_v3 import forward_v3
    from mobilenet_tpu.ops import pallas_ir_v3 as dense_mod
    from mobilenet_tpu.ops import pallas_se_packed as packed_mod

    packed_calls, dense_calls = [], []
    orig_packed = packed_mod.se_block_packed
    orig_dense = dense_mod.v3_block_pallas

    def rec_packed(x_packed, exp_w, exp_b, dw_w, dw_b, sw1, sb1, sw2, sb2,
                   pw_w, pw_b, cin, k, act, residual, se_width, **kw):
        packed_calls.append(dict(
            x=tuple(x_packed.shape), cp=int(cin), k=int(k), act=act,
            residual=bool(residual), se=int(se_width),
            e=int(exp_w.shape[1]), cout=int(pw_w.shape[1])))
        return orig_packed(x_packed, exp_w, exp_b, dw_w, dw_b, sw1, sb1,
                           sw2, sb2, pw_w, pw_b, cin, k, act, residual,
                           se_width, **kw)

    def rec_dense(x, exp_w, exp_b, dw_w, dw_b, prj_w, prj_b, *, k, stride,
                  act, se_w1=None, se_b1=None, se_w2=None, se_b2=None,
                  residual=False, **kw):
        dense_calls.append(dict(
            x=tuple(x.shape), k=int(k), stride=int(stride), act=act,
            residual=bool(residual),
            se=0 if se_w1 is None else int(se_w1.shape[1]),
            e=int(exp_w.shape[1]) if exp_w is not None else int(x.shape[-1]),
            cout=int(prj_w.shape[1])))
        return orig_dense(x, exp_w, exp_b, dw_w, dw_b, prj_w, prj_b, k=k,
                          stride=stride, act=act, se_w1=se_w1, se_b1=se_b1,
                          se_w2=se_w2, se_b2=se_b2, residual=residual, **kw)

    x_spec = jax.ShapeDtypeStruct(
        (batch, cfg.resolution, cfg.resolution, 3), jnp.bfloat16)
    old = mod.PACKED_SE
    packed_mod.se_block_packed = rec_packed
    dense_mod.v3_block_pallas = rec_dense
    try:
        mod.PACKED_SE = True
        jax.eval_shape(
            lambda x: forward_v3(params, x, cfg, dw_backend="fused"), x_spec)
        mod.PACKED_SE = False
        jax.eval_shape(
            lambda x: forward_v3(params, x, cfg, dw_backend="fused"), x_spec)
    finally:
        mod.PACKED_SE = old
        packed_mod.se_block_packed = orig_packed
        dense_mod.v3_block_pallas = orig_dense
    return packed_calls, dense_calls


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--alpha", type=float, default=1.0)
    ap.add_argument("--res", type=int, default=224)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--model", default="v3", choices=["v3", "v3small"])
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    from mobilenet_tpu.checkpoints.v3 import fold_bn_v3, init_params_v3
    from mobilenet_tpu.models.mobilenet_v3 import V3Config
    from mobilenet_tpu.ops.pallas_ir_v3 import v3_block_pallas
    from mobilenet_tpu.ops.pallas_se_packed import se_block_packed
    from mobilenet_tpu.utils.timing import fenced_window

    cfg = V3Config(variant="large" if args.model == "v3" else "small",
                   alpha=args.alpha, resolution=args.res,
                   compute_dtype="bfloat16")
    folded = fold_bn_v3(init_params_v3(cfg, seed=0), eps=cfg.bn_eps)
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), folded)
    packed_calls, dense_calls = capture_geometries(cfg, params, args.batch)
    print(f"captured {len(packed_calls)} packed calls, "
          f"{len(dense_calls)} dense calls", flush=True)

    rng = np.random.default_rng(0)

    def arr(*shape, dt=jnp.bfloat16):
        return jax.device_put(jnp.asarray(
            rng.uniform(-1, 1, shape) * 0.5, dt))

    def scalarize(y):
        return jnp.sum(y.astype(jnp.float32) * 1e-6)

    cases = []
    for pc in packed_calls:
        # the dense arm at the same nominal block (match on H, E, Cout)
        h_p = pc["x"][1]
        dmatches = [dc for dc in dense_calls
                    if dc["x"][1] == h_p and dc["e"] == pc["e"]
                    and dc["cout"] == pc["cout"]
                    and dc["stride"] == 1 and dc["k"] == pc["k"]]
        if not dmatches:
            # packed producers widen downstream cout (b5 carries b4's
            # cout_p); the dense network's own width is the comparator
            dmatches = [dc for dc in dense_calls
                        if dc["x"][1] == h_p and dc["e"] == pc["e"]
                        and dc["stride"] == 1 and dc["k"] == pc["k"]]
        if not dmatches:
            print(f"NO dense match for packed call {pc}", flush=True)
            continue
        dc = dmatches[0]
        dense_calls.remove(dc)
        cases.append((pc, dc))

    results = []
    for pc, dc in cases:
        n, h, w4, _ = pc["x"]
        cp, k, e, cout, se = pc["cp"], pc["k"], pc["e"], pc["cout"], pc["se"]
        label = (f"h={h} cp={cp} cin={dc['x'][3]} e={e} cout={cout} "
                 f"k={k} se={se} act={pc['act']}")
        print(f"\n=== {label} ===", flush=True)
        xp = arr(n, h, w4, 128)
        ew_p, eb = arr(cp, e), arr(e)
        dww, dwb = arr(k, k, 1, e), arr(e)
        pww, pwb = arr(e, cout), arr(cout)
        if se:
            # biases bf16, as the model's device tree carries them
            sargs_p = (arr(e, se), arr(se), arr(se, e), arr(e))
        else:
            sargs_p = (None, None, None, None)

        def f_packed(t, bn=None):
            return scalarize(se_block_packed(
                t, ew_p, eb, dww, dwb, *sargs_p, pww, pwb,
                cp, k, pc["act"], pc["residual"], se, block_n=bn))

        cin_d = dc["x"][3]
        xd = arr(n, dc["x"][1], dc["x"][2], cin_d)
        ew_d = arr(cin_d, e)
        pww_d, pwb_d = arr(e, dc["cout"]), arr(dc["cout"])
        se_kw = {}
        if se:
            se_kw = dict(se_w1=arr(e, se), se_b1=arr(se),
                         se_w2=arr(se, e), se_b2=arr(e))

        def f_dense(t):
            return scalarize(v3_block_pallas(
                t, ew_d, eb, dww, dwb, pww_d, pwb_d, k=k, stride=1,
                act=dc["act"], residual=dc["residual"], **se_kw))

        fns = []
        for name, f, x in [("dense", jax.jit(f_dense), xd),
                           ("packed", jax.jit(f_packed), xp),
                           ("packed bn1",
                            jax.jit(lambda t: f_packed(t, bn=1)), xp),
                           ("packed bn2",
                            jax.jit(lambda t: f_packed(t, bn=2)), xp)]:
            try:
                np.asarray(f(x))
                fns.append((name, f, x))
                print(f"compiled {name}", flush=True)
            except Exception as exc:
                print(f"{name}: FAILED ({type(exc).__name__})", flush=True)
        meds = {}
        for name, f, x in fns:
            ts = []
            for _ in range(args.rounds):
                dt_, k_ = fenced_window(lambda f=f, x=x: f(x),
                                        np.asarray, 20)
                ts.append(dt_ / k_ * 1e3)
            meds[name] = float(np.median(ts))
            print(f"  {name:12s} {meds[name]:7.3f} ms/batch "
                  f"(rounds {[round(t, 3) for t in ts]})", flush=True)
        results.append((label, meds))

    print("\n==== SUMMARY ====", flush=True)
    for label, meds in results:
        best_packed = min((v for k_, v in meds.items()
                           if k_.startswith("packed")), default=float("nan"))
        d = meds.get("dense", float("nan"))
        verdict = "PACKED WINS" if best_packed < d else "dense wins"
        print(f"{label}: dense {d:.3f} vs packed(best) {best_packed:.3f} "
              f"-> {verdict}", flush=True)


if __name__ == "__main__":
    main()
