#!/usr/bin/env python
"""MLA 0.86-of-roofline: kernel defect or platform floor? (round-3 item)

Three variants of the bench_mla geometry (DeepSeek-V2-Lite-shaped, 12
layers, B=8), each scored against ITS OWN byte-accurate roofline:

  full   — the shipped configuration (bf16 MLA projections, W4A16 MLP,
           absorbed latent-cache Pallas attention). bench_mla's number.
  dense  — every weight bf16, every matmul XLA, attention still the
           latent kernel. If this also lands ~0.86, the gap is the
           platform's achievable fraction for this layer geometry (many
           medium matmuls + narrow latent strips), not the w4 kernels.
  noattn — full model with the attention block replaced by identity
           (differential isolates the latent-attention kernel's cost:
           full_time - noattn_time vs the cache-strip byte budget).

Honest-timing rules per memory/axon-tpu-quirks: np.asarray fetch, inputs
varied, best-of-3, ~27 ms constant dispatch diluted by 128-step scans.

Usage: python benchmarks/lab_mla_floor.py [full dense noattn]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, ".")
sys.path.insert(0, "benchmarks")
from bench import HBM_GBPS, weight_bytes  # noqa: E402
from bench_mla import B, MAX_LEN, STEPS, T_PREFILL, build_params, make_spec  # noqa: E402

from quantizers_tpu.models import KVCache  # noqa: E402
from quantizers_tpu.models.transformer import fuse_for_decode  # noqa: E402
from quantizers_tpu.ops.linear import QuantLinear, dense_linear  # noqa: E402
from quantizers_tpu.serve.engine import _decode_scan, prefill  # noqa: E402


def densify(params):
    """Every QuantLinear -> bf16 dense (XLA matmul path)."""
    def conv(x):
        if isinstance(x, QuantLinear) and x.kind != "dense":
            return dense_linear(np.asarray(x.dequantize(jnp.bfloat16)).T)
        return x

    return jax.tree_util.tree_map(
        conv, params, is_leaf=lambda x: isinstance(x, QuantLinear))


def run_variant(tag, spec, params, caches, first):
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    toks, _ = _decode_scan(params, spec, caches, first, key, steps=STEPS,
                           temperature=0.0, top_k=0)
    np.asarray(toks)
    log(f"[{tag}] compile+first {time.time()-t0:.0f}s")
    best = float("inf")
    for i in range(3):
        t0 = time.time()
        toks, _ = _decode_scan(params, spec, caches, first + i, key,
                               steps=STEPS, temperature=0.0, top_k=0)
        np.asarray(toks)
        best = min(best, time.time() - t0)
    return B * STEPS / best


def main():
    variants = sys.argv[1:] or ["full", "dense"]
    backend = jax.default_backend()
    on_tpu = backend in ("tpu", "axon")
    log(f"backend={backend}")
    spec = make_spec(on_tpu)
    params_full = fuse_for_decode(spec, build_params(spec, jax.random.PRNGKey(0))
                                  if on_tpu else __import__(
                                      "quantizers_tpu.models", fromlist=["init_params"]
                                  ).init_params(spec, jax.random.PRNGKey(0)))
    params_full = jax.block_until_ready(params_full)

    caches = KVCache.init(spec, B, MAX_LEN)
    ids = jnp.asarray((np.arange(B * T_PREFILL).reshape(B, T_PREFILL) * 97 + 1)
                      % spec.vocab_size, jnp.int32)
    last, caches = prefill(params_full, spec, ids, caches)
    first = jnp.argmax(last, axis=-1).astype(jnp.int32)

    bw = HBM_GBPS.get(jax.devices()[0].device_kind, 819.0) * 1e9
    kv_bytes = sum(c.k.size * c.k.dtype.itemsize
                   + c.v.size * c.v.dtype.itemsize for c in caches)

    results = {}
    for tag in variants:
        if tag == "full":
            params = params_full
        elif tag == "dense":
            params = jax.block_until_ready(densify(params_full))
        else:
            log(f"unknown variant {tag}")
            continue
        tok_s = run_variant(tag, spec, params, caches, first)
        per_step = weight_bytes(params) + kv_bytes
        roof = B * bw / per_step
        frac = tok_s / roof
        results[tag] = {"tok_s": round(tok_s, 1), "roofline": round(roof, 1),
                        "frac_of_roofline": round(frac, 3)}
        log(f"[{tag}] {tok_s:.1f} tok/s vs roofline {roof:.0f} "
            f"({per_step/1e9:.2f} GB/step) -> {frac:.3f}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
