"""Data-free PTQ — quantize a checkpoint shard-by-shard, no model graph.

TPU-native equivalent of ``llmcompressor.model_free_ptq`` as the reference
drives it (``scripts/quant_GLM-4.7-Flash-FP8.py:11-24``): stream safetensors
shards, quantize every matching 2-D weight under the scheme on a worker
pool, write compressed shards + config. Host RAM stays bounded by the shard
LRU (same property the reference's merger relies on,
``recombine_weights_MiniMax-M2.1.py:26,208-222``); no calibration data and
no full-model load.
"""

from __future__ import annotations

import logging
import shutil
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Any, Dict, Iterable, List, Optional, Sequence, Tuple, Union

import jax.numpy as jnp
import ml_dtypes
import numpy as np

from ..core.numerics import quantize
from ..core.scheme import QuantScheme, is_ignored, resolve_scheme
from ..formats.compressed_tensors import build_quantization_config, compress_tensor
from ..formats.safetensors_io import (
    ShardedReader,
    ShardedWriter,
    dump_json,
    load_json,
)

logger = logging.getLogger(__name__)

# name fragments that are never weight-quantized even without an ignore entry
_ALWAYS_PLAIN = ("embed_tokens", "rotary_emb", "layernorm", ".norm.")


def _quantizable(name: str, arr: np.ndarray, ignore: Sequence[str]) -> Optional[str]:
    if not name.endswith(".weight") or arr.ndim != 2:
        return None
    prefix = name[: -len(".weight")]
    if any(frag in name for frag in _ALWAYS_PLAIN):
        return None
    if is_ignored(prefix, list(ignore)):
        return None
    return prefix


def model_free_ptq(
    model_dir: Union[str, Path],
    save_directory: Union[str, Path],
    scheme: Union[str, QuantScheme, Dict[str, Any]] = "FP8_BLOCK",
    ignore: Sequence[str] = (),
    max_workers: int = 8,
    max_shard_bytes: int = 5 * 1024**3,
) -> List[str]:
    """Quantize ``model_dir`` (HF safetensors layout) into a
    compressed-tensors checkpoint at ``save_directory``. Returns the list of
    quantized module prefixes."""
    model_dir, save_directory = Path(model_dir), Path(save_directory)
    sch = resolve_scheme(scheme) if not isinstance(scheme, QuantScheme) else scheme
    args = sch.weights
    if args is None:
        raise ValueError("scheme must quantize weights")

    save_directory.mkdir(parents=True, exist_ok=True)
    writer = ShardedWriter(save_directory, max_shard_bytes=max_shard_bytes)
    quantized: List[str] = []

    def _process(name: str) -> Tuple[str, Optional[str], Dict[str, np.ndarray]]:
        arr = reader.get(name)
        prefix = _quantizable(name, arr, ignore)
        if prefix is None:
            return name, None, {name: arr}
        qt = quantize(jnp.asarray(arr, jnp.float32), args)
        qt_host = qt._replace(
            values=np.asarray(qt.values),
            scale=np.asarray(qt.scale),
            zero_point=None if qt.zero_point is None else np.asarray(qt.zero_point),
            global_scale=None if qt.global_scale is None else np.asarray(qt.global_scale),
        )
        return name, prefix, compress_tensor(prefix, qt_host, args)

    with ShardedReader(model_dir) as reader:
        names = reader.keys()
        with ThreadPoolExecutor(max_workers=max_workers) as pool:
            for name, prefix, tensors in pool.map(_process, names):
                if prefix is not None:
                    quantized.append(prefix)
                writer.add_many(tensors)
    writer.finalize(metadata={"format": "pt"})

    # config.json: source config + quantization_config block
    cfg: Dict[str, Any] = {}
    src_cfg = model_dir / "config.json"
    if src_cfg.exists():
        cfg = load_json(src_cfg)
    cfg["quantization_config"] = build_quantization_config(
        {"group_0": sch}, list(ignore))
    dump_json(cfg, save_directory / "config.json")

    # carry over tokenizer / generation assets verbatim
    for f in model_dir.iterdir():
        if f.name == "config.json" or f.suffix == ".safetensors" or \
                f.name == "model.safetensors.index.json":
            continue
        if f.is_file():
            shutil.copy2(f, save_directory / f.name)

    logger.info("model_free_ptq: quantized %d tensors -> %s",
                len(quantized), save_directory)
    return quantized
