"""Serving CLI: continuous-batching generation from a checkpoint.

The reference only sanity-generates after quantization
(``scripts/quantization_multiple_modifiers.py:112-118``); this CLI is the
north-star serving surface — it loads a compressed-tensors (or plain HF)
checkpoint into kernel-ready layouts and decodes prompts through the
:class:`~quantizers_tpu.serve.session.ContinuousBatcher`.

    python -m quantizers_tpu.cli.serve <ckpt_dir> --prompt "..." \
        [--prompt-file prompts.txt] [--max-new-tokens 64] \
        [--max-batch 8] [--max-len 2048] [--platform cpu] \
        [--mesh dp=1,tp=4]

Prompts come from ``--prompt`` (repeatable) and/or ``--prompt-file``
(one prompt per line); outputs print as ``<rid>\t<text>`` lines.

``--mesh`` shards weights over the local devices under the framework's
GSPMD rules (tp column/row splits, ep for experts). Multi-host runs
additionally set the ``QTPU_COORDINATOR`` / ``QTPU_NUM_PROCESSES`` /
``QTPU_PROCESS_ID`` environment (see ``parallel.distributed``); the
hybrid mesh then keeps tp/ep on ICI and dp across hosts.
"""

from __future__ import annotations

import argparse
import logging
import sys
import time
from pathlib import Path

logger = logging.getLogger("quantizers_tpu.serve")


def main(argv=None) -> int:
    from ..utils import enable_persistent_cache

    enable_persistent_cache()  # first-seen XLA programs cost 1-40 s remote compile
    p = argparse.ArgumentParser(description="Continuous-batching generation")
    p.add_argument("ckpt_dir")
    p.add_argument("--prompt", action="append", default=[],
                   help="prompt text (repeatable)")
    p.add_argument("--prompt-file", default=None,
                   help="file with one prompt per line")
    p.add_argument("--max-new-tokens", type=int, default=64)
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--max-len", type=int, default=2048)
    p.add_argument("--platform", default=None)
    p.add_argument("--head-bits", type=int, default=None,
                   help="quantize the logits head for serving (8 = "
                        "near-lossless w8-channel; halves the tied-head "
                        "HBM stream per decode step)")
    p.add_argument("--mesh", default=None,
                   help="mesh axes, e.g. dp=1,tp=4 (shards weights over devices)")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO, force=True)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import json

    from ..data.simple_tokenizer import load_tokenizer
    from ..models import load_compressed_model, load_hf_model
    from ..serve.session import ContinuousBatcher

    prompts = list(args.prompt)
    if args.prompt_file:
        prompts += [ln for ln in Path(args.prompt_file).read_text().splitlines()
                    if ln.strip()]
    if not prompts:
        p.error("no prompts: pass --prompt and/or --prompt-file")

    ckpt = Path(args.ckpt_dir)
    cfg = json.loads((ckpt / "config.json").read_text())
    t0 = time.time()
    if cfg.get("quantization_config"):
        spec, params = load_compressed_model(ckpt)
    else:
        spec, params = load_hf_model(ckpt)
    logger.info("loaded %s in %.1fs", ckpt, time.time() - t0)
    tokenizer = load_tokenizer(str(ckpt))

    eos = []
    for k in ("eos_token_id",):
        v = cfg.get(k)
        if isinstance(v, int):
            eos.append(v)
        elif isinstance(v, list):
            eos.extend(int(e) for e in v)

    import contextlib

    ctx = contextlib.nullcontext()
    if args.mesh:
        from ..parallel import shard_params
        from ..parallel.distributed import (
            initialize,
            make_pod_mesh,
            parse_mesh_arg,
        )

        initialize()  # no-op unless QTPU_* multi-process env is set
        mesh = make_pod_mesh(parse_mesh_arg(args.mesh))
        params = shard_params(spec, params, mesh)
        logger.info("sharded params over mesh %s", dict(
            zip(mesh.axis_names, mesh.devices.shape)))
        ctx = mesh

    with ctx:
        batcher = ContinuousBatcher(spec, params, max_batch=args.max_batch,
                                    max_len=args.max_len, eos_ids=eos,
                                    head_bits=args.head_bits)
        rid_to_prompt = {}
        for text in prompts:
            ids = tokenizer(text)["input_ids"]
            rid = batcher.submit(ids, max_new_tokens=args.max_new_tokens)
            rid_to_prompt[rid] = text

        t0 = time.time()
        results = batcher.run()
        dt = time.time() - t0
    n_tok = sum(len(v) for v in results.values())
    for rid in sorted(results):
        out = results[rid]
        try:
            text = tokenizer.decode(out)
        except Exception:
            text = " ".join(str(t) for t in out)
        print(f"{rid}\t{text}")
    logger.info("generated %d tokens for %d prompts in %.1fs (%.1f tok/s)",
                n_tok, len(prompts), dt, n_tok / max(dt, 1e-9))
    return 0


if __name__ == "__main__":
    sys.exit(main())
