"""End-to-end accuracy agreement gate: device pipeline vs golden CPU oracle.

The reference's system-level acceptance check was top-1 accuracy *identical
to the CPU reference* on sample images (SURVEY.md §4 "Accuracy check",
BASELINE.json:5). The per-layer gates (`cli verify`) cover numerics layer by
layer; this module covers the same contract end to end, at the granularity a
user cares about: for every evaluated image, does the device pipeline pick
the same class as the golden CPU model?

Images may come from disk (any PIL-decodable files, any sizes — the device
path resizes on device) or be synthesized at the model's native resolution.
Per-shape jit entries mirror the per-bitstream compile model: images are
grouped by decoded shape and batched within each group.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from ..config import ModelConfig
from ..ops import preprocess as prep


def _topk_rows(scores: np.ndarray, k: int) -> np.ndarray:
    return np.argsort(-scores, axis=-1)[:, :k]


def synth_images(config: ModelConfig, n: int, seed: int,
                 structured: bool = True) -> List[np.ndarray]:
    """Seeded uint8 images at native resolution (no-network stand-in for
    sample ImageNet images, SURVEY.md §0).

    structured=True (default) cycles four deterministic families instead of
    pure noise — noise, linear gradients, block patches/checkerboards, and
    smooth low-frequency blobs. Natural-image-like structure stresses the
    resize/normalize path and produces less-uniform logits than iid noise,
    so top-1 margins vary more realistically (round-2 VERDICT weak #3:
    N=16 noise images was thin evidence for the 'top-1 identical' contract).
    structured=False reproduces the round-1/2 pure-noise recordings."""
    rng = np.random.default_rng(seed)
    res = config.resolution
    yy, xx = np.mgrid[0:res, 0:res].astype(np.float32) / max(res - 1, 1)
    images: List[np.ndarray] = []
    for i in range(n):
        kind = i % 4 if structured else 0
        if kind == 0:  # iid noise
            img = rng.integers(0, 256, (res, res, 3), dtype=np.uint8)
        elif kind == 1:  # linear gradient, random direction/colors per channel
            a, b = rng.uniform(-1, 1, 2)
            t = (a * xx + b * yy - min(a, 0) - min(b, 0)) / (abs(a) + abs(b) + 1e-6)
            lo, hi = rng.integers(0, 256, (2, 3))
            img = (lo + t[..., None] * (hi.astype(np.float32) - lo)).astype(np.uint8)
        elif kind == 2:  # block patches (checkerboard-like, random cell size)
            cell = int(rng.integers(4, max(5, res // 4)))
            gy = (np.arange(res) // cell)
            colors = rng.integers(0, 256, (gy.max() + 1, gy.max() + 1, 3))
            img = colors[gy[:, None], gy[None, :]].astype(np.uint8)
        else:  # smooth low-frequency blobs (sums of 2-D sinusoids)
            img = np.zeros((res, res, 3), np.float32)
            for c in range(3):
                fx, fy = rng.uniform(0.5, 4.0, 2)
                px, py = rng.uniform(0, 2 * np.pi, 2)
                img[..., c] = (np.sin(2 * np.pi * fx * xx + px)
                               * np.sin(2 * np.pi * fy * yy + py))
            img = ((img + 1) * 127.5).astype(np.uint8)
        images.append(img)
    return images


def load_dir_images(path: str) -> List[np.ndarray]:
    """Decode every readable image under `path` (sorted for determinism).

    Uses the native thread-pooled batch decoder when it builds on this
    machine (native_io.decode_batch — decodes concurrently off the GIL, the
    reference host's staged-ingest analog); per-image PIL fallback
    otherwise. Non-image files are skipped either way."""
    import os

    from ..ops.preprocess import decode_image_host

    paths = [os.path.join(path, name) for name in sorted(os.listdir(path))
             if os.path.isfile(os.path.join(path, name))]
    images: List[np.ndarray] = []
    try:
        from .. import native_io

        native_ok = native_io.available()
    except Exception:
        native_ok = False
    if native_ok:
        decoded = native_io.decode_batch(paths, strict=False)
        for full, img in zip(paths, decoded):
            if img is not None:
                images.append(img)
                continue
            try:  # format native_io doesn't cover (e.g. BMP) — let PIL try
                images.append(decode_image_host(full, backend="pil"))
            except Exception:
                continue  # non-image file in the directory
    else:
        for full in paths:
            try:
                images.append(decode_image_host(full))
            except Exception:
                continue  # non-image file in the directory
    if not images:
        raise ValueError(f"no decodable images found under {path!r}")
    return images


def _is_v2(config) -> bool:
    from ..models.mobilenet_v2 import V2Config  # noqa: PLC0415

    return isinstance(config, V2Config)


def _is_v3(config) -> bool:
    from ..models.mobilenet_v3 import V3Config  # noqa: PLC0415

    return isinstance(config, V3Config)


def _oracle_scores(folded, q, batch_u8: np.ndarray, config, *,
                   int8: bool, oracle: str) -> np.ndarray:
    """Golden logits for a uint8 batch, preprocessed identically to the
    device path (resize isn't an oracle layer — SURVEY.md §3.4). `q` is the
    pre-quantized weight set for the int8 path (quantized ONCE by the
    caller, not per batch). V2 configs route the V2 oracle twins."""
    x = np.asarray(prep.preprocess(batch_u8, config.resolution, np.float32))
    if int8:
        from ..quant import quantize_input

        x_i8 = quantize_input(x)
        if _is_v2(config):
            # cpu_ref has no int8 V2 twin (quant/v2.py module doc): the
            # NumPy int8 V2 oracle is THE exactness reference here.
            from ..quant.v2 import forward_all_v2_i8

            logits, _ = forward_all_v2_i8(q, x_i8, config)
        elif _is_v3(config):
            from ..quant.v3 import forward_all_v3_i8

            logits, _ = forward_all_v3_i8(q, x_i8, config)
        elif oracle == "cpp":
            from ..quant.verify import _cpp_forward_all

            logits, _ = _cpp_forward_all(q, x_i8, config)
        else:
            from ..quant import oracle as qoracle

            logits, _ = qoracle.forward_all(q, x_i8, config)
        return np.asarray(logits, np.float32)
    if _is_v2(config):
        if oracle == "cpp":
            from .. import cpu_ref

            logits, _ = cpu_ref.forward_all_v2(folded, x, config)
        else:
            from ..oracle import numpy_ref

            logits, _ = numpy_ref.forward_all_v2(folded, x, config)
        return np.asarray(logits, np.float32)
    if _is_v3(config):
        if oracle == "cpp":
            from .. import cpu_ref

            logits, _ = cpu_ref.forward_all_v3(folded, x, config)
        else:
            from ..oracle import numpy_ref

            logits, _ = numpy_ref.forward_all_v3(folded, x, config)
        return np.asarray(logits, np.float32)
    if oracle == "cpp":
        from .. import cpu_ref

        logits, _ = cpu_ref.forward_all(folded, x, config)
    else:
        from ..oracle import numpy_ref

        logits, _ = numpy_ref.forward_all(folded, x, config)
    return np.asarray(logits, np.float32)


def evaluate_agreement(
    config: ModelConfig,
    images: Sequence[np.ndarray],
    *,
    params: Optional[Dict[str, Any]] = None,
    seed: int = 0,
    int8: bool = False,
    oracle: str = "numpy",
    batch_size: int = 16,
    top_k: int = 5,
    tie_margin: float = 0.0,
) -> Dict[str, Any]:
    """Run every image through the device pipeline AND the golden oracle;
    report top-1 / top-k agreement. `images`: HWC uint8 arrays, any sizes.

    `tie_margin`: relative oracle-logit margin below which a top-1
    disagreement counts as a NEAR TIE rather than a mismatch in
    `top1_agreement_tie_aware`. The float device path is tolerance-gated
    (not bit-exact) vs the fp32 oracle, so two logits within rounding of
    each other can legitimately swap top-1 — with random-init weights such
    razor-thin margins are common, and a strict 1.0 gate would flake on
    them. Raw `top1_agreement` is always reported unmodified; int8 is exact
    arithmetic, so the two numbers can only differ on float paths."""
    from ..checkpoints import default_folded

    folded = params if params is not None else default_folded(
        config, seed=seed)

    q = None
    if int8 and _is_v2(config):
        from ..quant.v2 import Int8PipelineV2

        pipe = Int8PipelineV2(config, params=folded)
        # Reuse the pipeline's quantized set for the oracle side — V2
        # calibration is deterministic but costs an oracle sweep; quantize
        # once for both (same as the V1 branch's 'both derive from folded').
        q = pipe.q
    elif int8 and _is_v3(config):
        from ..quant.v3 import Int8PipelineV3

        pipe = Int8PipelineV3(config, params=folded)
        q = pipe.q  # same quantize-once reuse as the V2 branch
    elif int8:
        from ..quant.model import Int8Pipeline

        pipe = Int8Pipeline(config, params=folded)
        from ..quant import quantize

        # Quantize once for the oracle side (the device side quantizes
        # internally at pipeline construction; both derive from `folded`).
        q = quantize(folded, config)
    else:
        from .pipeline import InferencePipeline

        pipe = InferencePipeline(config, params=folded)

    n = len(images)
    dev_top = np.zeros((n, top_k), np.int64)
    ora_top = np.zeros((n, top_k), np.int64)
    # Oracle-logit margin between the oracle's top-1 and the DEVICE's top-1
    # class, relative to max(1, |top-1 logit|): 0 when they agree, tiny when
    # a near-tie flipped, large on a real mismatch.
    rel_margin = np.zeros(n, np.float64)

    # Group by decoded shape: one jit entry per input shape (the per-
    # bitstream compile analog), batches within each group.
    by_shape: Dict[tuple, List[int]] = {}
    for i, img in enumerate(images):
        by_shape.setdefault(img.shape, []).append(i)

    for shape, idxs in by_shape.items():
        for start in range(0, len(idxs), batch_size):
            chunk = idxs[start:start + batch_size]
            batch = np.stack([images[i] for i in chunk])
            if len(chunk) < batch_size and len(idxs) > batch_size:
                # Pad the trailing partial chunk so the group reuses its one
                # compiled (shape, batch) entry — a fresh entry is a 30-60 s
                # remote compile on the tunneled TPU.
                pad = np.repeat(batch[:1], batch_size - len(chunk), axis=0)
                batch = np.concatenate([batch, pad])
            probs = pipe.run_batch(batch)[: len(chunk)]
            dev_top[chunk] = _topk_rows(probs, top_k)
            golden = _oracle_scores(folded, q, batch[: len(chunk)], config,
                                    int8=int8, oracle=oracle)
            ora_top[chunk] = _topk_rows(golden, top_k)
            rows = np.arange(len(chunk))
            g_ora1 = golden[rows, ora_top[chunk, 0]]
            g_dev1 = golden[rows, dev_top[chunk, 0]]
            rel_margin[chunk] = (g_ora1 - g_dev1) / np.maximum(1.0, np.abs(g_ora1))

    top1_match = dev_top[:, 0] == ora_top[:, 0]
    near_tie = ~top1_match & (rel_margin <= tie_margin)
    # Fraction of the oracle's top-k set the device also ranks in its top-k
    # (order-insensitive: ULP-level ties may swap neighboring ranks).
    topk_overlap = np.array([
        len(set(dev_top[i]) & set(ora_top[i])) / top_k for i in range(n)
    ])
    mismatches = [
        {"index": int(i), "device_top1": int(dev_top[i, 0]),
         "oracle_top1": int(ora_top[i, 0]),
         "oracle_rel_margin": float(rel_margin[i]),
         "near_tie": bool(near_tie[i])}
        for i in np.nonzero(~top1_match)[0]
    ]
    return {
        "n_images": n,
        # Unrounded: the CLI gate compares this against --min-agreement, and
        # rounding could mask a lone mismatch in a large set (49999/50000
        # rounds to 1.0). Display-rounding happens at the print site.
        "top1_agreement": float(top1_match.mean()),
        "top1_agreement_tie_aware": float((top1_match | near_tie).mean()),
        "near_ties": int(near_tie.sum()),
        f"top{top_k}_overlap": float(topk_overlap.mean()),
        "dtype": "int8" if int8 else config.compute_dtype,
        "oracle": oracle,
        "tie_margin": tie_margin,
        "mismatches": mismatches,
    }
