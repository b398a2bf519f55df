"""Perplexity evaluation CLI — the BASELINE.md quality metric
(wikitext PPL Δ vs FP16 at equal bit-width).

Evaluates a checkpoint (plain HF or compressed-tensors) on a local text
file (e.g. wikitext test split exported to .txt) with a sliding window,
mirroring the standard wikitext PPL protocol. Compare two checkpoints by
running twice and differencing.

    python -m quantizers_tpu.cli.eval_ppl <ckpt_dir> <text_file> \
        [--window 2048] [--stride 2048] [--platform cpu] [--max-windows N]
"""

from __future__ import annotations

import argparse
import logging
import sys
import time
from pathlib import Path

logger = logging.getLogger("quantizers_tpu.eval_ppl")


def main(argv=None) -> int:
    from ..utils import enable_persistent_cache

    enable_persistent_cache()  # first-seen XLA programs cost 1-40 s remote compile
    p = argparse.ArgumentParser()
    p.add_argument("ckpt_dir")
    p.add_argument("text_file")
    p.add_argument("--window", type=int, default=2048)
    p.add_argument("--stride", type=int, default=2048)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--max-windows", type=int, default=None)
    p.add_argument("--head-bits", type=int, default=None,
                   help="quantize the logits head to this many bits before "
                        "scoring (serving-layout option, e.g. 8)")
    p.add_argument("--moe-layout", choices=["w8pc"], default=None,
                   help="apply a MoE expert serving layout before scoring "
                        "(w8pc = fused int8-per-channel requant, the TPU "
                        "serving default — quantifies its quality cost)")
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO, force=True)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from ..data.simple_tokenizer import load_tokenizer
    from ..models import load_compressed_model, load_hf_model
    from ..serve import perplexity

    ckpt = Path(args.ckpt_dir)
    import json

    cfg = json.loads((ckpt / "config.json").read_text())
    t0 = time.time()
    if cfg.get("quantization_config"):
        spec, params = load_compressed_model(ckpt)
    else:
        spec, params = load_hf_model(ckpt)
    logger.info("loaded %s in %.1fs", ckpt, time.time() - t0)

    if args.head_bits:
        from ..models.transformer import quantize_lm_head

        params = quantize_lm_head(spec, params, num_bits=args.head_bits)
        logger.info("quantized logits head to w%d-channel", args.head_bits)

    if args.moe_layout == "w8pc":
        from ..ops.linear import moe_w8pc_layout

        params = moe_w8pc_layout(params)
        logger.info("applied the w8pc fused MoE expert serving layout")

    tokenizer = load_tokenizer(str(ckpt))
    text = Path(args.text_file).read_text()
    enc = tokenizer(text, truncation=False)
    ids = np.asarray(enc["input_ids"], dtype=np.int32)
    logger.info("tokenized %d chars -> %d tokens", len(text), len(ids))

    # Standard strided wikitext protocol: with stride < window, each window
    # after the first scores ONLY its last `stride` tokens — the first
    # window-stride positions are context-only (mask 0). Scoring them too
    # would double-count overlap tokens with favorable context and bias
    # PPL low.
    windows = []  # (ids, n_context) pairs
    for start in range(0, max(1, len(ids) - 1), args.stride):
        w = ids[start : start + args.window]
        if len(w) < 2:
            break
        ctx = 0 if start == 0 else max(0, min(args.window - args.stride, len(w) - 1))
        windows.append((w, ctx))
        if start + args.window >= len(ids):
            # this window reached the corpus end; further strided windows
            # would only re-score already-counted tail tokens
            break
        if args.max_windows and len(windows) >= args.max_windows:
            break

    batches = []
    for i in range(0, len(windows), args.batch_size):
        chunk = windows[i : i + args.batch_size]
        T = max(len(w) for w, _ in chunk)
        b = np.zeros((len(chunk), T), np.int32)
        m = np.zeros((len(chunk), T), np.float32)
        for j, (w, ctx) in enumerate(chunk):
            b[j, : len(w)] = w
            m[j, ctx : len(w)] = 1.0
        batches.append((b, m))

    t0 = time.time()
    ppl = perplexity(spec, params, batches)
    dt = time.time() - t0
    n_tok = sum(int(m.sum()) for _, m in batches)
    print(f"ppl={ppl:.4f} tokens={n_tok} windows={len(windows)} "
          f"eval_s={dt:.1f} tok/s={n_tok/dt:.0f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
