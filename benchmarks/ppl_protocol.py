#!/usr/bin/env python
"""Perplexity-delta protocol (BASELINE.md quality north star), pinned.

The real metric is wikitext PPL Δ vs FP16 for the shipped recipes — this
box has zero egress and no real checkpoints, so this script pins the
*protocol* end-to-end on a local tiny model and a synthetic corpus, via
the exact user surface (make_tiny_model → do_oneshot → eval_ppl). When a
round gets real weights, point the same flow at them.

Prints one JSON line:
  {"bf16": P0, "w4a16_awq": P1, "nvfp4_rtn": P2,
   "delta_w4a16": P1-P0, "delta_nvfp4": P2-P0}

Run: python benchmarks/ppl_protocol.py  (CPU, ~2 min)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_corpus(path: Path, n_sent: int = 400, seed: int = 0) -> None:
    """Zipf-ish synthetic text: deterministic, byte-tokenizer friendly."""
    rng = np.random.default_rng(seed)
    vocab = [f"w{i:03d}" for i in range(200)]
    probs = 1.0 / np.arange(1, len(vocab) + 1) ** 1.1
    probs /= probs.sum()
    sents = []
    for _ in range(n_sent):
        n = int(rng.integers(5, 18))
        sents.append(" ".join(rng.choice(vocab, size=n, p=probs)) + ".")
    path.write_text(" ".join(sents))


def run_ppl(ckpt: Path, corpus: Path) -> float:
    """eval_ppl CLI in-process, parsing its printed PPL."""
    import contextlib
    import io

    from quantizers_tpu.cli.eval_ppl import main as eval_ppl_main

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = eval_ppl_main([str(ckpt), str(corpus), "--window", "128",
                            "--stride", "64", "--max-windows", "8"])
    assert rc == 0, buf.getvalue()
    last = buf.getvalue().strip().splitlines()[-1]  # "ppl=NNN tokens=..."
    return float(dict(kv.split("=") for kv in last.split())["ppl"])


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from quantizers_tpu.cli.do_oneshot import main as do_oneshot_main
    from quantizers_tpu.cli.make_tiny_model import main as make_tiny_main

    repo = Path(__file__).resolve().parent.parent
    work = Path(tempfile.mkdtemp(prefix="ppl_protocol_"))
    try:
        model_dir = work / "tiny_bf16"
        assert make_tiny_main([str(model_dir), "--hidden", "128", "--layers",
                               "4", "--vocab", "512", "--platform", ""]) == 0
        corpus = work / "corpus.txt"
        make_corpus(corpus)

        results = {}
        results["bf16"] = run_ppl(model_dir, corpus)
        log(f"bf16 ppl: {results['bf16']:.3f}")

        for tag, recipe in (("w4a16_awq", "recipe_awq_w4a16.yaml"),
                            ("nvfp4_rtn", "recipe_dense_nvfp4.yaml")):
            run_cfg = work / f"run_{tag}.yaml"
            run_cfg.write_text(f"""
model:
  name: {model_dir}
quantization:
  recipe: {repo}/configs/recipes/{recipe}
calibration_set: {repo}/configs/calibration_sets/test-calibrate_quick.yaml
""")
            out = work / f"out_{tag}"
            rc = do_oneshot_main([
                "--config", str(run_cfg), "--output", str(out),
                "--cache-dir", str(work / "cache"),
                "--max-seq-length", "64",
            ])
            assert rc == 0, f"do_oneshot failed for {tag}"
            results[tag] = run_ppl(out, corpus)
            log(f"{tag} ppl: {results[tag]:.3f}")

        results["delta_w4a16"] = results["w4a16_awq"] - results["bf16"]
        results["delta_nvfp4"] = results["nvfp4_rtn"] - results["bf16"]
        print(json.dumps({k: round(v, 4) for k, v in results.items()}))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
