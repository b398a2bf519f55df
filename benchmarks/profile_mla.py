#!/usr/bin/env python
"""MLA decode-step breakdown on real hardware: where does the gap to the
roofline go? (round-3: lab_mla_floor measured full=0.80 of its roofline
while all-bf16-dense=0.87 — the absolute excess is ~0.35 ms/step in BOTH,
i.e. a fixed per-step cost, not a w4-kernel defect. This profiler
attributes that fixed cost.)

Variants (bench_mla geometry — DeepSeek-V2-Lite-shaped, 12 layers, B=8,
128-step scan, honest host-fetch timing per the axon tunnel rules):

  full      — the bench_mla configuration (bf16 MLA projections, W4A16
              MLP, absorbed latent-cache Pallas attention, tied bf16 head)
  no_head   — logits head replaced by a cheap reduction
  no_attn   — attention block skipped (latent kernel + MLA projections)
  no_mlp    — MLP skipped
  attn_only — attention alone (no MLP, no head)

Differential attribution: full - no_X = X's marginal ms/step. Compare each
against its byte budget to find which component is off its own roofline.

Usage: python benchmarks/profile_mla.py [variant ...]  (default: all)
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
from bench_mla import B, MAX_LEN, STEPS, T_PREFILL, build_params, make_spec  # noqa: E402

from quantizers_tpu.models import KVCache  # noqa: E402
from quantizers_tpu.models.transformer import (  # noqa: E402
    dense_mlp,
    embed,
    fuse_for_decode,
    logits_head,
    mla_attention,
    mla_absorb_layout,
    rms_norm,
)
from quantizers_tpu.ops.linear import i4_device_layout  # noqa: E402
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
                        skip_attn=False, skip_head=False, skip_mlp=False):
    params = mla_absorb_layout(spec, i4_device_layout(params))

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
                a, nc = mla_attention(layer, spec, h, positions, caches[i])
                x = x + a
                new_caches.append(nc)
            if not skip_mlp:
                h = rms_norm(x, layer["post_attention_layernorm"],
                             spec.rms_norm_eps)
                x = x + dense_mlp(layer["mlp"], h)
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
    "no_head": {"skip_head": True},
    "no_attn": {"skip_attn": True},
    "no_mlp": {"skip_mlp": True},
    "attn_only": {"skip_mlp": True, "skip_head": True},
}


def main():
    variants = sys.argv[1:] or list(VARIANT_FLAGS)
    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    on_tpu = jax.default_backend() in ("tpu", "axon")
    spec = make_spec(on_tpu)

    params = fuse_for_decode(spec, build_params(spec, jax.random.PRNGKey(0)))
    params = jax.block_until_ready(params)

    caches = KVCache.init(spec, B, MAX_LEN)
    ids = jnp.asarray((np.arange(B * T_PREFILL).reshape(B, T_PREFILL) * 97 + 1)
                      % spec.vocab_size, jnp.int32)
    last, caches = prefill(params, spec, ids, caches)
    first = jnp.argmax(last, axis=-1).astype(jnp.int32)
    caches = jax.block_until_ready(caches)
    log("prefill done")

    results = {}
    for v in variants:
        flags = VARIANT_FLAGS[v]
        fn = jax.jit(partial(decode_scan_variant, spec=spec, steps=STEPS,
                             **flags))
        best, comp = timed(lambda fn=fn: fn(params, caches=caches, first=first))
        ms_step = best / STEPS * 1e3
        results[v] = ms_step
        log(f"[{v:10s}] {ms_step:6.2f} ms/step ({B*STEPS/best:7.1f} tok/s; "
            f"compile {comp:.0f}s)")

    if {"full", "no_head", "no_attn", "no_mlp"} <= results.keys():
        log("--- differential attribution (ms/step) ---")
        log(f"head : {results['full'] - results['no_head']:6.2f}")
        log(f"attn : {results['full'] - results['no_attn']:6.2f}")
        log(f"mlp  : {results['full'] - results['no_mlp']:6.2f}")


if __name__ == "__main__":
    main()
