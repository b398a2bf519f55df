#!/usr/bin/env python
"""MoE decode-step breakdown on real hardware: where does the gap to the
served-layout roofline go? (round-3: 1329.7 tok/s vs ~1894 int8-layout
roofline before the w8 head.)

Variants (bench_moe geometry — Qwen3-30B-A3B per-layer, 8 layers, B=8,
128-step scan, honest host-fetch timing per the axon tunnel rules):

  full       — the bench_moe configuration (w4 attention, nvfp4-int8
               experts via the slot kernel, w8 logits head)
  bf16_head  — same but the tied bf16 head (the old configuration;
               isolates the w8-head win)
  no_head    — logits head replaced by a cheap reduction
  no_moe     — expert FFN skipped (attention + head + router cost)
  no_attn    — attention skipped (experts + head cost)
  moe_only   — experts only (no attention, no head): the slot kernel's
               achieved GB/s against its exact routed-bytes budget

Usage: python benchmarks/profile_moe.py [variant ...]  (default: all)
"""

from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, ".")
sys.path.insert(0, "benchmarks")
from bench_moe import B, MAX_LEN, SPEC, STEPS, T_PREFILL, build_params  # noqa: E402

from quantizers_tpu.models import KVCache  # noqa: E402
from quantizers_tpu.models.moe import moe_forward  # noqa: E402
from quantizers_tpu.models.transformer import (  # noqa: E402
    attention,
    embed,
    logits_head,
    rms_norm,
)
from quantizers_tpu.serve.engine import prefill  # noqa: E402


def timed(fn, n=3):
    t0 = time.time()
    out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    comp = time.time() - t0
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        out = fn()
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.time() - t0)
    return best, comp


def decode_scan_variant(params, spec, caches, first, *, steps,
                        skip_attn=False, skip_head=False, skip_moe=False,
                        static_route=False):
    from quantizers_tpu.models.moe import _gathered_topk_ffn
    from quantizers_tpu.ops.linear import i4_device_layout

    params = i4_device_layout(params)

    # static_route: fixed routing constants (64 distinct experts, uniform
    # combine weights) — removes the router matmul + softmax + top_k +
    # take_along_axis chain from the step; the differential vs moe_only
    # is the routing chain's in-scan cost.
    topi_const = jnp.asarray(
        (np.arange(B * 8).reshape(B, 8) * 2 + 1) % SPEC.num_experts,
        jnp.int32)
    topv_const = jnp.full((B, 8), 1.0 / 8, jnp.float32)

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
            if static_route:
                h = rms_norm(x, layer["post_attention_layernorm"],
                             spec.rms_norm_eps)
                y = _gathered_topk_ffn(layer["moe"], h.reshape(B, -1),
                                       topi_const, topv_const)
                x = x + y.astype(x.dtype).reshape(B, 1, -1)
            elif not skip_moe:
                h = rms_norm(x, layer["post_attention_layernorm"],
                             spec.rms_norm_eps)
                x = x + moe_forward(layer["moe"], spec, h)
        if skip_head:
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


VARIANT_FLAGS = {
    "full": {},
    "bf16_head": {},
    "no_head": {"skip_head": True},
    "no_moe": {"skip_moe": True},
    "no_attn": {"skip_attn": True},
    "moe_only": {"skip_attn": True, "skip_head": True},
    "moe_static": {"skip_attn": True, "skip_head": True,
                   "static_route": True},
}


def main():
    variants = sys.argv[1:] or list(VARIANT_FLAGS)
    log(f"backend={jax.default_backend()} devices={jax.devices()}")

    params = build_params(SPEC, jax.random.PRNGKey(0))
    params = jax.block_until_ready(params)
    bf16_params = dict(params, lm_head=None)  # tied bf16 head variant

    caches = KVCache.init(SPEC, B, MAX_LEN)
    ids = jnp.asarray((np.arange(B * T_PREFILL).reshape(B, T_PREFILL) * 97 + 1)
                      % SPEC.vocab_size, jnp.int32)
    last, caches = prefill(params, SPEC, ids, caches)
    first = jnp.argmax(last, axis=-1).astype(jnp.int32)
    caches = jax.block_until_ready(caches)
    log("prefill done")

    results = {}
    for v in variants:
        flags = VARIANT_FLAGS[v]
        p = bf16_params if v == "bf16_head" else params
        fn = jax.jit(partial(decode_scan_variant, spec=SPEC, steps=STEPS,
                             **flags))
        best, comp = timed(lambda fn=fn, p=p: fn(p, caches=caches, first=first))
        ms_step = best / STEPS * 1e3
        results[v] = ms_step
        log(f"[{v:10s}] {ms_step:6.2f} ms/step ({B*STEPS/best:7.1f} tok/s; "
            f"compile {comp:.0f}s)")

    if {"full", "no_head", "no_moe", "no_attn"} <= results.keys():
        log("--- differential attribution (ms/step) ---")
        log(f"head : {results['full'] - results['no_head']:6.2f}")
        log(f"moe  : {results['full'] - results['no_moe']:6.2f}")
        log(f"attn : {results['full'] - results['no_attn']:6.2f}")


if __name__ == "__main__":
    main()
