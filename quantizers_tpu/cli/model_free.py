"""Data-free PTQ CLI (reference ``scripts/quant_GLM-4.7-Flash-FP8.py``)."""

from __future__ import annotations

import argparse
import logging
import sys


def main(argv=None) -> int:
    from ..utils import enable_persistent_cache

    enable_persistent_cache()  # first-seen XLA programs cost 1-40 s remote compile
    p = argparse.ArgumentParser(description="Data-free PTQ over a local checkpoint")
    p.add_argument("model_dir")
    p.add_argument("save_directory")
    p.add_argument("--scheme", default="FP8_BLOCK")
    p.add_argument("--ignore", nargs="*", default=[
        "lm_head", "re:.*mlp\\.gate$", "re:.*embed_tokens$"])
    p.add_argument("--max-workers", type=int, default=8)
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO, force=True)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from ..oneshot.model_free import model_free_ptq

    quantized = model_free_ptq(
        args.model_dir, args.save_directory, scheme=args.scheme,
        ignore=args.ignore, max_workers=args.max_workers)
    print(f"quantized {len(quantized)} tensors -> {args.save_directory}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
