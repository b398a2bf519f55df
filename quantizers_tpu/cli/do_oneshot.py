"""Main CLI — end-to-end calibrated quantization run.

TPU-native equivalent of the reference's ``scripts/do_oneshot.py``
(args :47-79, stage flow :99-203): YAML run config → calibration set
(cache-or-build) → model + tokenizer → tokenize → oneshot → compressed
checkpoint, with wall-clock timing of every stage.

Usage::

    python -m quantizers_tpu.cli.do_oneshot --config configs/test-quantize_tiny-awq.yaml \
        [--output outputs/...] [--cache-dir ./cache] [--log-file run.log] [--debug] \
        [--pipeline sequential|independent|basic] [--batch-size 4] [--platform cpu]
"""

from __future__ import annotations

import argparse
import logging
import os
import shutil
import sys
import time
from pathlib import Path

logger = logging.getLogger("quantizers_tpu.do_oneshot")


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="Calibrated oneshot quantization")
    p.add_argument("--config", required=True, help="run-config YAML path")
    p.add_argument("--output", default=None,
                   help="output dir (default outputs/<model>-<recipe>)")
    p.add_argument("--cache-dir", default="./cache",
                   help="calibration-set Parquet cache dir")
    p.add_argument("--log-file", default=None)
    p.add_argument("--debug", action="store_true")
    p.add_argument("--pipeline", default=None,
                   choices=["sequential", "independent", "basic"])
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--num-calibration-samples", type=int, default=None)
    p.add_argument("--max-seq-length", type=int, default=None)
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. cpu) before backend init")
    p.add_argument("--no-moe-calibrate-all-experts", action="store_true")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace of the oneshot stage "
                        "into this directory (view with TensorBoard / xprof)")
    return p.parse_args(argv)


def setup_logging(log_file=None, debug=False) -> None:
    handlers = [logging.StreamHandler()]
    if log_file:
        handlers.append(logging.FileHandler(log_file))
    logging.basicConfig(
        level=logging.DEBUG if debug else logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
        handlers=handlers, force=True)


def default_output_dir(config_path: str, model_name: str, recipe: str) -> str:
    model_leaf = model_name.rstrip("/").split("/")[-1]
    recipe_leaf = Path(recipe).stem.replace("recipe_", "")
    return str(Path("outputs") / f"{model_leaf}-{recipe_leaf}")


def main(argv=None) -> int:
    from ..utils import enable_persistent_cache

    enable_persistent_cache()  # first-seen XLA programs cost 1-40 s remote compile
    os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")
    args = parse_args(argv)
    setup_logging(args.log_file, args.debug)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from ..config import load_quantization_config
    from ..data.calibration_sets import CalibrationSet
    from ..data.simple_tokenizer import load_tokenizer
    from ..formats.checkpoint import save_compressed_model
    from ..models import load_hf_model
    from ..models.loader import iter_model_linears, model_plain_tensors
    from ..oneshot import make_batches, oneshot
    from ..recipes import parse_recipe, resolve_recipe_path

    t_start = time.time()
    run = load_quantization_config(args.config)
    recipe_path = resolve_recipe_path(run.quantization.recipe, args.config)
    recipe = parse_recipe(recipe_path)
    if args.pipeline:
        recipe.pipeline = args.pipeline
    out_dir = args.output or default_output_dir(
        args.config, run.model.name, run.quantization.recipe)
    logger.info("model=%s recipe=%s output=%s", run.model.name, recipe_path, out_dir)

    # ---- calibration set: cache-or-build ---------------------------------
    t0 = time.time()
    calib = None
    if run.calibration_set_config is not None:
        cfg = run.calibration_set_config
        if args.max_seq_length:
            cfg.max_seq_length = args.max_seq_length
        if CalibrationSet.is_cached(cfg, args.cache_dir):
            calib = CalibrationSet.from_cache(cfg, args.cache_dir)
            logger.info("calibration set loaded from cache in %.1fs", time.time() - t0)
        else:
            calib = CalibrationSet.from_config(cfg, args.cache_dir)
            calib.save_to_cache()
            logger.info("calibration set built+cached in %.1fs (%d samples)",
                        time.time() - t0, calib.total_num_samples)

    # ---- model + tokenizer ------------------------------------------------
    t0 = time.time()
    model_path = Path(run.model.name)
    if not model_path.exists():
        logger.error(
            "model %s is not a local directory; this environment has no hub "
            "egress — download the checkpoint first", run.model.name)
        return 2
    spec, params = load_hf_model(model_path)
    tokenizer = load_tokenizer(str(model_path))
    logger.info("model loaded in %.1fs (%d layers, hidden %d, moe=%s)",
                time.time() - t0, spec.num_layers, spec.hidden_size, spec.is_moe)

    # ---- tokenize ----------------------------------------------------------
    t0 = time.time()
    batches = []
    if calib is not None:
        tokenized = calib.get_tokenized(tokenizer)
        rows = [r["input_ids"] for r in tokenized]
        if args.num_calibration_samples:
            rows = rows[: args.num_calibration_samples]
        batches = make_batches(
            rows, max_seq_length=calib.config.max_seq_length,
            batch_size=args.batch_size)
        logger.info("tokenized %d samples -> %d batches in %.1fs",
                    len(rows), len(batches), time.time() - t0)

    # ---- oneshot -----------------------------------------------------------
    # SURVEY §5: the reference's only tracing is wall-clock spans around
    # each stage; the TPU-native equivalent adds a jax.profiler capture of
    # the calibrate/compress stage on request.
    import contextlib

    import jax

    prof = (jax.profiler.trace(args.profile_dir) if args.profile_dir
            else contextlib.nullcontext())
    t0 = time.time()
    with prof:
        res = oneshot(spec, params, recipe, batches,
                      moe_calibrate_all_experts=not args.no_moe_calibrate_all_experts)
    if args.profile_dir:
        logger.info("jax.profiler trace written to %s", args.profile_dir)
    logger.info("oneshot done in %.1fs (%d quantized modules)",
                time.time() - t0, len(res.records))

    # ---- save --------------------------------------------------------------
    t0 = time.time()
    import jax.numpy as jnp

    plain = model_plain_tensors(spec, res.params)
    for prefix, lin in iter_model_linears(spec, res.params):
        if prefix not in res.records:
            plain[f"{prefix}.weight"] = np.asarray(lin.dequantize(jnp.bfloat16)).T
            if lin.bias is not None:
                plain[f"{prefix}.bias"] = np.asarray(lin.bias)
    for name, arr in res.extra_tensors.items():
        plain[name] = arr
    save_compressed_model(
        out_dir, plain, res.records,
        config_groups=res.config_groups, ignore=res.ignore,
        base_config=spec.to_hf_config(), kv_cache_scheme=res.kv_cache_scheme)
    tokenizer.save_pretrained(out_dir)
    # carry tokenizer assets from the source dir as well
    for f in model_path.iterdir():
        if f.name.startswith("tokenizer") or f.name in ("special_tokens_map.json",
                                                        "generation_config.json"):
            shutil.copy2(f, Path(out_dir) / f.name)
    logger.info("saved compressed model to %s in %.1fs", out_dir, time.time() - t0)
    logger.info("total wall clock: %.1fs", time.time() - t_start)
    return 0


if __name__ == "__main__":
    sys.exit(main())
