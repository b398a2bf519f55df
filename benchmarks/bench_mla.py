#!/usr/bin/env python
"""MLA (latent-cache) decode benchmark — DeepSeek/GLM-Flash-family path.

DeepSeek-V2-Lite-shaped per-layer geometry (D=2048, H=16 MLA heads,
kv_lora_rank=512, rope 64 / nope 128 / v 128, dense W4A16 MLP F=8192),
depth-scaled to fit the chip; per-layer timings extrapolate (decode is
bandwidth-bound). MLA projections stay bf16 per the reference's
sensitive-layer policy (`scripts/quant_GLM-4.7-Flash-FP8.py:15-22`).

The decode step runs the absorbed latent-cache Pallas kernel
(ops/kernels.py:mla_decode_attention): the cache holds one shared
(c_kv, rope-k) row per token — r+128=640 elements vs H*(192+128)=5120
expanded (8x smaller), and the old dk%128 XLA fallback is gone.

Prints ONE JSON line like bench.py.
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
from bench import HBM_GBPS, make_w4_linear, weight_bytes  # noqa: E402

from quantizers_tpu.models import KVCache, ModelSpec  # noqa: E402
# (serving layout comes from serve.session.serving_layout)
from quantizers_tpu.ops.linear import dense_linear  # noqa: E402
from quantizers_tpu.serve.engine import _decode_scan, prefill  # noqa: E402

B, T_PREFILL, STEPS, MAX_LEN = 8, 128, 128, 512
LAYERS = 12  # of ~27 (DeepSeek-V2-Lite); extrapolates linearly


def make_spec(on_tpu: bool) -> ModelSpec:
    if not on_tpu:
        return ModelSpec.tiny(mla=True)
    return ModelSpec(
        vocab_size=102400, hidden_size=2048, num_layers=LAYERS,
        num_heads=16, num_kv_heads=16, head_dim=128,
        intermediate_size=8192, qk_norm=False, tie_word_embeddings=True,
        q_lora_rank=0, kv_lora_rank=512, qk_rope_head_dim=64,
        qk_nope_head_dim=128, v_head_dim=128, model_type="deepseek_v3",
    )


def build_params(spec, key):
    D = spec.hidden_size
    H, dn, dr, dv = (spec.num_heads, spec.qk_nope_head_dim,
                     spec.qk_rope_head_dim, spec.v_head_dim)
    r = spec.kv_lora_rank
    layers = []
    keys = jax.random.split(key, spec.num_layers + 1)

    def dense(k, k_in, n_out):
        w = jax.random.normal(k, (n_out, k_in), jnp.bfloat16) * 0.02
        return dense_linear(np.asarray(w))

    for i in range(spec.num_layers):
        ks = jax.random.split(keys[i], 8)
        layers.append({
            "input_layernorm": jnp.ones((D,), jnp.bfloat16),
            "post_attention_layernorm": jnp.ones((D,), jnp.bfloat16),
            "q_proj": dense(ks[0], D, H * (dn + dr)),
            "kv_a_proj_with_mqa": dense(ks[1], D, r + dr),
            "kv_a_layernorm": jnp.ones((r,), jnp.bfloat16),
            "kv_b_proj": dense(ks[2], r, H * (dn + dv)),
            "o_proj": make_w4_linear(ks[3], H * dv, D),
            "mlp": {
                "gate_proj": make_w4_linear(ks[4], D, spec.intermediate_size),
                "up_proj": make_w4_linear(ks[5], D, spec.intermediate_size),
                "down_proj": make_w4_linear(ks[6], spec.intermediate_size, D),
            },
        })
    embed = jax.random.normal(keys[-1], (spec.vocab_size, D), jnp.bfloat16) * 0.02
    return {"embed": embed, "layers": layers,
            "final_norm": jnp.ones((D,), jnp.bfloat16), "lm_head": None}


def main():
    from quantizers_tpu.utils import enable_persistent_cache

    enable_persistent_cache()  # tunnel compiles are 1-40 s; cache loads ~0.1 s
    backend = jax.default_backend()
    on_tpu = backend in ("tpu", "axon")
    log(f"backend={backend}")
    spec = make_spec(on_tpu)

    t0 = time.time()
    if on_tpu:
        params = build_params(spec, jax.random.PRNGKey(0))
    else:
        from quantizers_tpu.models import init_params

        params = init_params(spec, jax.random.PRNGKey(0))
    # THE session layout pipeline (serve.session.serving_layout): the
    # benched artifact is the served artifact by construction. Roofline
    # denominator: the recipe-faithful model bytes (bf16 tied head); the
    # w8 padded head (head_bits=8) moves only the numerator.
    from quantizers_tpu.serve.session import serving_layout

    raw = params
    params = jax.block_until_ready(serving_layout(spec, raw))
    wbytes = weight_bytes(params)
    if on_tpu:
        params = None  # free the accounting layout before the timed one
        params = jax.block_until_ready(serving_layout(spec, raw, head_bits=8))
        log("serving layout: w8 padded logits head")
    del raw
    log(f"params {wbytes/1e9:.2f} GB in {time.time()-t0:.0f}s")

    caches = KVCache.init(spec, B, MAX_LEN)
    ids = jnp.asarray((np.arange(B * T_PREFILL).reshape(B, T_PREFILL) * 97 + 1)
                      % spec.vocab_size, jnp.int32)
    last, caches = prefill(params, spec, ids, caches)
    first = jnp.argmax(last, axis=-1).astype(jnp.int32)
    log("prefill done")

    key = jax.random.PRNGKey(1)
    steps = STEPS if on_tpu else 8
    t0 = time.time()
    toks, _ = _decode_scan(params, spec, caches, first, key, steps=steps,
                           temperature=0.0, top_k=0)
    np.asarray(toks)
    log(f"decode compile+first {time.time()-t0:.0f}s")
    best = float("inf")
    for i in range(3):
        t0 = time.time()
        toks, _ = _decode_scan(params, spec, caches, first + i, key, steps=steps,
                               temperature=0.0, top_k=0)
        np.asarray(toks)
        best = min(best, time.time() - t0)
        log(f"run {i}: {(time.time()-t0)*1e3:.0f} ms / {steps} steps")

    tok_s = B * steps / best
    kv_bytes = sum(c.k.size * c.k.dtype.itemsize
                   + c.v.size * c.v.dtype.itemsize for c in caches)
    per_step = wbytes + kv_bytes
    bw = HBM_GBPS.get(jax.devices()[0].device_kind, 819.0) * 1e9
    roofline = B * bw / per_step
    log(f"roofline {roofline:.0f} tok/s ({per_step/1e9:.2f} GB/step, "
        f"latent cache {kv_bytes/1e6:.0f} MB)")
    print(json.dumps({
        "metric": f"decode_tokens_per_s_per_chip_mla{spec.num_layers}L_w4a16",
        "value": round(tok_s, 1),
        "unit": "tok/s/chip",
        "vs_baseline": round(tok_s / (0.9 * roofline), 3) if on_tpu else 0,
    }))


if __name__ == "__main__":
    main()
