#!/usr/bin/env python
"""Decode-step breakdown on real hardware: which part of the 1-chip W4A16
decode step eats the time budget?

Variants (all: Qwen3-4B geometry, B=8, 32-step lax.scan, honest host-fetch
timing per the axon tunnel rules):

  full          — the bench.py configuration (w4 kernels everywhere)
  no_attn       — attention block replaced by identity (isolates KV/attn cost)
  no_head       — logits head replaced by a cheap reduction (isolates the
                  tied-embedding (151936x2560 bf16) matmul cost)
  dense_bf16    — same model with bf16 dense weights (XLA matmul; 4x weight
                  bytes — if not ~4x slower, we're not bandwidth-bound)
  xla_dequant   — w4 weights but the XLA dequant-then-matmul fallback path
                  (kernel benefit check)
  matmul_only   — scan over just the 7 projections per layer, no attention,
                  no norms, no embed/head (pure kernel throughput)

Usage: python benchmarks/profile_decode.py [variant ...]  (default: all)
"""

from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(fn, *args, n=3):
    """Compile+run once, then best of n with host fetch."""
    t0 = time.time()
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.time() - t0)
    return best, compile_s


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, ".")

from bench import build_params  # noqa: E402
from quantizers_tpu.models import KVCache, ModelSpec  # noqa: E402
from quantizers_tpu.models.transformer import (  # noqa: E402
    apply_layer,
    dense_mlp,
    embed,
    logits_head,
    rms_norm,
)
from quantizers_tpu.serve.engine import prefill  # noqa: E402

B, T_PREFILL, STEPS, MAX_LEN = 8, 128, 128, 512

SPEC = ModelSpec(
    vocab_size=151936, hidden_size=2560, num_layers=36, num_heads=32,
    num_kv_heads=8, head_dim=128, intermediate_size=9728,
    qk_norm=True, tie_word_embeddings=True, model_type="qwen3",
)


def decode_scan_variant(params, spec, caches, first, *, steps,
                        skip_attn=False, skip_head=False, skip_mlp=False):
    from quantizers_tpu.models.transformer import attention
    from quantizers_tpu.ops.linear import i4_device_layout

    params = i4_device_layout(params)  # match the serving path (in-jit)

    def fwd(params, tok, caches):
        x = embed(params, tok[:, None])
        positions = caches[0].length[:, None]
        new_caches = []
        for i, layer in enumerate(params["layers"]):
            if skip_attn:
                c = caches[i]
                new_caches.append(c._replace(length=c.length + 1))
            else:
                h = rms_norm(x, layer["input_layernorm"], spec.rms_norm_eps)
                a, nc = attention(layer, spec, h, positions, caches[i])
                x = x + a
                new_caches.append(nc)
            if not skip_mlp:
                h = rms_norm(x, layer["post_attention_layernorm"], spec.rms_norm_eps)
                x = x + dense_mlp(layer["mlp"], h)
        if skip_head:
            # keep a data dependency on x so nothing is dead-code-eliminated
            return x[:, 0, :2].sum(axis=-1).astype(jnp.float32), new_caches
        return logits_head(params, spec, x)[:, 0].astype(jnp.float32), new_caches

    def step(carry, _):
        caches, tok = carry
        logits, caches = fwd(params, tok, caches)
        if skip_head:
            nxt = ((tok + 1) % spec.vocab_size) + (logits > 1e30).astype(jnp.int32)
        else:
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (caches, nxt), nxt

    (caches, _), toks = jax.lax.scan(step, (caches, first), None, length=steps)
    return toks


def matmul_only_scan(params, spec, first, *, steps, fused=False):
    from quantizers_tpu.ops.linear import i4_device_layout

    params = i4_device_layout(params)
    D = spec.hidden_size

    def step(carry, _):
        x = carry  # (B, D)
        for layer in params["layers"]:
            if fused:
                qkv = layer["qkv_proj"].apply(x)
                q = qkv[:, : spec.q_dim]
                rest = qkv[:, spec.q_dim :].sum(-1, keepdims=True)
                x = layer["o_proj"].apply(q) + rest
                gu = layer["mlp"]["gateup_proj"].apply(x)
                g, u = jnp.split(gu, 2, axis=-1)
            else:
                q = layer["q_proj"].apply(x)
                k = layer["k_proj"].apply(x)
                v = layer["v_proj"].apply(x)
                x = layer["o_proj"].apply(q) + k.sum(-1, keepdims=True) + v.sum(-1, keepdims=True)
                g = layer["mlp"]["gate_proj"].apply(x)
                u = layer["mlp"]["up_proj"].apply(x)
            x = layer["mlp"]["down_proj"].apply(jax.nn.silu(g.astype(jnp.float32)).astype(x.dtype) * u)
        return x, x.sum()

    x0 = jnp.ones((B, D), jnp.bfloat16) * first.astype(jnp.bfloat16)[:, None] * 1e-3
    _, ys = jax.lax.scan(step, x0, None, length=steps)
    return ys


def densify(params):
    from quantizers_tpu.ops.linear import QuantLinear, dense_linear

    def conv(l):
        if isinstance(l, QuantLinear) and l.kind != "dense":
            return dense_linear(np.asarray(l.dequantize(jnp.float32).T), dtype=jnp.bfloat16)
        return l

    return jax.tree_util.tree_map(
        conv, params, is_leaf=lambda x: isinstance(x, QuantLinear))


def main():
    variants = sys.argv[1:] or ["full", "no_attn", "no_head", "matmul_only",
                                "dense_bf16", "xla_dequant"]
    log(f"backend={jax.default_backend()} devices={jax.devices()}")

    params = build_params(SPEC, jax.random.PRNGKey(0))
    params = jax.block_until_ready(params)

    caches = KVCache.init(SPEC, B, MAX_LEN)
    ids = jnp.asarray((np.arange(B * T_PREFILL).reshape(B, T_PREFILL) * 97 + 1)
                      % SPEC.vocab_size, jnp.int32)
    last, caches = prefill(params, SPEC, ids, caches)
    first = jnp.argmax(last, axis=-1).astype(jnp.int32)
    caches = jax.block_until_ready(caches)
    log("prefill done")

    results = {}
    for v in variants:
        if v == "full":
            fn = jax.jit(partial(decode_scan_variant, spec=SPEC, steps=STEPS))
            best, comp = timed(lambda: fn(params, caches=caches, first=first))
        elif v == "full_fused":
            from quantizers_tpu.models.transformer import fuse_for_decode
            fparams = jax.block_until_ready(fuse_for_decode(SPEC, params))
            fn = jax.jit(partial(decode_scan_variant, spec=SPEC, steps=STEPS))
            best, comp = timed(lambda: fn(fparams, caches=caches, first=first))
        elif v == "matmul_fused":
            from quantizers_tpu.models.transformer import fuse_for_decode
            fparams = jax.block_until_ready(fuse_for_decode(SPEC, params))
            fn = jax.jit(partial(matmul_only_scan, spec=SPEC, steps=STEPS, fused=True))
            best, comp = timed(lambda: fn(fparams, first=first))
        elif v == "no_attn":
            fn = jax.jit(partial(decode_scan_variant, spec=SPEC, steps=STEPS,
                                 skip_attn=True))
            best, comp = timed(lambda: fn(params, caches=caches, first=first))
        elif v == "no_head":
            fn = jax.jit(partial(decode_scan_variant, spec=SPEC, steps=STEPS,
                                 skip_head=True))
            best, comp = timed(lambda: fn(params, caches=caches, first=first))
        elif v == "attn_only":
            fn = jax.jit(partial(decode_scan_variant, spec=SPEC, steps=STEPS,
                                 skip_head=True, skip_mlp=True))
            best, comp = timed(lambda: fn(params, caches=caches, first=first))
        elif v == "matmul_only":
            fn = jax.jit(partial(matmul_only_scan, spec=SPEC, steps=STEPS))
            best, comp = timed(lambda: fn(params, first=first))
        elif v == "dense_bf16":
            dparams = jax.block_until_ready(densify(params))
            fn = jax.jit(partial(decode_scan_variant, spec=SPEC, steps=STEPS))
            best, comp = timed(lambda: fn(dparams, caches=caches, first=first))
        elif v == "xla_dequant":
            import quantizers_tpu.ops.dispatch as dispatch
            old = dispatch._on_tpu
            dispatch._on_tpu = lambda: False  # forces the XLA dequant path
            try:
                fn = jax.jit(partial(decode_scan_variant, spec=SPEC, steps=STEPS))
                best, comp = timed(lambda: fn(params, caches=caches, first=first))
            finally:
                dispatch._on_tpu = old
        else:
            log(f"unknown variant {v}")
            continue
        ms = best / STEPS * 1e3
        results[v] = ms
        log(f"{v:12s}: {ms:7.2f} ms/step  ({B*STEPS/best:7.0f} tok/s)  compile {comp:.0f}s")

    log("---- summary ----")
    for v, ms in results.items():
        log(f"{v:12s}: {ms:7.2f} ms/step")


if __name__ == "__main__":
    main()
