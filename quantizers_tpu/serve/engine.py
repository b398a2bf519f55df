"""Decode engine: jit-compiled prefill + lax.scan token loop.

Design for TPU:

* the whole decode loop is ONE compiled program (``lax.scan`` over steps)
  — no per-token host round trips; weights stay resident in HBM in their
  quantized layouts and every step hits the fused dequant-matmul kernels.
* KV caches are static-shape ring-less buffers (B, S_max, H_kv, hd) updated
  with ``dynamic_update_slice`` — XLA keeps them donated/in-place.
* under a mesh, params keep their committed shardings (tp column/row
  splits) and XLA overlaps the decode all-gathers with compute; batch is
  ``dp``-sharded.

Greedy + temperature/top-k sampling; ``perplexity`` is the quality-eval
primitive (wikitext PPL Δ — BASELINE.md north star).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelSpec
from ..models.transformer import KVCache, forward, mla_absorb_layout
from ..ops.linear import i4_device_layout

_PAD_MULT = 64


def _sample(logits: jnp.ndarray, key: Optional[jnp.ndarray],
            temperature: float, top_k: int) -> jnp.ndarray:
    """logits (B, V) -> token ids (B,)."""
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits.astype(jnp.float32) / temperature
    if top_k > 0:
        kth = jax.lax.top_k(logits, top_k)[0][:, -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("spec",))
def prefill(params: Dict[str, Any], spec: ModelSpec, ids: jnp.ndarray,
            caches: List[KVCache]) -> Tuple[jnp.ndarray, List[KVCache]]:
    """Run the prompt; returns (last-position logits (B, V), caches)."""
    params = mla_absorb_layout(spec, i4_device_layout(params))
    logits, caches = forward(params, spec, ids, caches=caches)
    return logits[:, -1], caches


@partial(jax.jit, static_argnames=("spec", "steps", "temperature", "top_k"))
def _decode_scan(params: Dict[str, Any], spec: ModelSpec, caches: List[KVCache],
                 first: jnp.ndarray, key: jnp.ndarray, *, steps: int,
                 temperature: float, top_k: int
                 ) -> Tuple[jnp.ndarray, List[KVCache]]:
    """Emit ``steps`` tokens after ``first``; returns ((B, steps), caches)."""
    # once per scan, not per step: fast device layouts + MLA absorbed
    # weights (inline derivation would re-dequantize kv_b every token)
    params = mla_absorb_layout(spec, i4_device_layout(params))

    def step(carry, _):
        caches, tok, key = carry
        logits, caches = forward(params, spec, tok[:, None], caches=caches)
        key, sub = jax.random.split(key)
        nxt = _sample(logits[:, 0], sub, temperature, top_k)
        return (caches, nxt, key), nxt

    (caches, _, _), toks = jax.lax.scan(step, (caches, first, key), None,
                                        length=steps)
    return jnp.swapaxes(toks, 0, 1), caches  # (B, steps)


def generate(
    spec: ModelSpec,
    params: Dict[str, Any],
    prompt_ids: Any,
    max_new_tokens: int = 32,
    temperature: float = 0.0,
    top_k: int = 0,
    seed: int = 0,
    kv_dtype=jnp.bfloat16,
    fp8_kv: bool = False,
    max_len: Optional[int] = None,
) -> np.ndarray:
    """Batch generation. ``prompt_ids`` (B, T) — equal-length prompts (pad
    upstream to a bucket). Returns (B, max_new_tokens) generated ids."""
    ids = jnp.asarray(np.asarray(prompt_ids), jnp.int32)
    B, T = ids.shape
    if max_len is None:
        max_len = -(-(T + max_new_tokens) // _PAD_MULT) * _PAD_MULT
    caches = KVCache.init(spec, B, max_len, dtype=kv_dtype, fp8=fp8_kv)

    last_logits, caches = prefill(params, spec, ids, caches)
    key = jax.random.PRNGKey(seed)
    key, sub = jax.random.split(key)
    first = _sample(last_logits, sub, temperature, top_k)
    if max_new_tokens == 1:
        return np.asarray(first[:, None])
    rest, _ = _decode_scan(params, spec, caches, first, key,
                           steps=max_new_tokens - 1,
                           temperature=float(temperature), top_k=int(top_k))
    return np.asarray(jnp.concatenate([first[:, None], rest], axis=1))


@partial(jax.jit, static_argnames=("spec",))
def _nll(params: Dict[str, Any], spec: ModelSpec, ids: jnp.ndarray,
         mask: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    params = mla_absorb_layout(spec, i4_device_layout(params))
    logits, _ = forward(params, spec, ids)
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = ids[:, 1:]
    tok_lp = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    m = mask[:, 1:].astype(jnp.float32)
    return -(tok_lp * m).sum(), m.sum()


def perplexity(spec: ModelSpec, params: Dict[str, Any], batches) -> float:
    """Masked next-token perplexity over (ids, mask) batches."""
    total, count = 0.0, 0.0
    for ids, mask in batches:
        nll, n = _nll(params, spec, jnp.asarray(ids), jnp.asarray(mask))
        total += float(nll)
        count += float(n)
    return float(np.exp(total / max(count, 1.0)))
