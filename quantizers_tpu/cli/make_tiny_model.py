"""Write a tiny random HF-format checkpoint for offline smoke runs.

The zero-egress environment cannot download hub models; this provides a
local model directory that the full CLI pipeline (do_oneshot → serve)
can run against, including a MoE variant.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("out_dir")
    p.add_argument("--moe", action="store_true")
    p.add_argument("--mla", action="store_true",
                   help="MLA attention (with --moe: the MiniMax/DeepSeek-"
                        "class MLA+MoE shape — shared experts, sigmoid "
                        "router, first layer dense)")
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--layers", type=int, default=2)
    p.add_argument("--vocab", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default="cpu",
                   help="jax platform for weight init (default cpu)")
    p.add_argument("--fit-corpus", default=None,
                   help="text file to fit the model on before saving "
                        "(makes PPL deltas discriminative)")
    p.add_argument("--fit-steps", type=int, default=300)
    p.add_argument("--fit-lr", type=float, default=3e-3)
    p.add_argument("--fit-seq", type=int, default=64)
    p.add_argument("--fit-batch", type=int, default=8)
    args = p.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from ..models import ModelSpec, init_params
    from ..models.loader import save_hf_model

    spec = ModelSpec.tiny(moe=args.moe, mla=args.mla, hidden_size=args.hidden,
                          num_layers=args.layers, vocab_size=args.vocab)
    params = init_params(spec, jax.random.PRNGKey(args.seed))
    fitted = ""
    if args.fit_corpus:
        import numpy as np

        from ..data.simple_tokenizer import ByteTokenizer
        from ..models.fit import fit_lm

        text = open(args.fit_corpus).read()
        ids = np.asarray(ByteTokenizer()(text)["input_ids"], np.int32)
        params = fit_lm(spec, params, ids, steps=args.fit_steps,
                        batch_size=args.fit_batch, seq_len=args.fit_seq,
                        lr=args.fit_lr, seed=args.seed)
        fitted = f"fitted ({args.fit_steps} steps) "
    save_hf_model(spec, params, args.out_dir)
    kind = ("MLA+MoE " if (args.moe and args.mla) else
            "MoE " if args.moe else "MLA " if args.mla else "")
    print(f"wrote tiny {fitted}{kind}model to {args.out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
