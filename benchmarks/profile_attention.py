#!/usr/bin/env python
"""Decode-attention cost isolation: KV-cache update strategy shootout.

Simulates the bench geometry (36 layers, B=8, S=512 window, 8 KV heads,
hd=128, 32 GQA query heads) with caches stacked (L, B, S, KV, hd) and a
lax.scan over decode steps; per step an inner scan over layers runs the
cache update + GQA attention math with synthetic q/k/v (no projections —
this isolates attention + cache traffic only).

Variants:
  read_only  — attention over the existing cache, no update (lower bound:
               pure K+V read bandwidth)
  dus_vmap   — per-row vmap'd dynamic_update_slice (framework semantics,
               per-row lengths)
  dus_scalar — single scalar-offset DUS (uniform lengths)
  onehot     — cache = cache*(1-oh) + new*oh full-rewrite update
  none       — no attention at all (scan overhead floor)

Ideal read-only: 36*2*(8*512*8*128)*2B = 600 MB/step -> 0.74 ms @ 819 GB/s.
"""

from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

L, B, S, KV, REP, HD = 36, 8, 512, 8, 4, 128
H = KV * REP
STEPS = 32


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def attn_math(q, k_all, v_all, pos):
    """q (B,KV,REP,HD); k/v (B,S,KV,HD); pos (B,) current position."""
    scores = jnp.einsum("bkrd,bskd->bkrs", q, k_all,
                        preferred_element_type=jnp.float32)
    mask = jnp.arange(S)[None, :] <= pos[:, None]  # (B,S)
    scores = jnp.where(mask[:, None, None, :], scores * (1.0 / np.sqrt(HD)), -1e30)
    p = jax.nn.softmax(scores, axis=-1).astype(jnp.bfloat16)
    return jnp.einsum("bkrs,bskd->bkrd", p, v_all)


def step_fn(carry, _, *, mode):
    caches_k, caches_v, pos, x = carry  # (L,B,S,KV,HD) x2, (B,), (B,HD)

    def layer(acc, kv):
        k_cache, v_cache = kv  # (B,S,KV,HD)
        xx = acc
        q = jnp.broadcast_to(xx[:, None, None, :], (B, KV, REP, HD)).astype(jnp.bfloat16)
        new_k = jnp.broadcast_to(xx[:, None, :], (B, KV, HD)).astype(jnp.bfloat16)
        new_v = new_k

        if mode == "read_only":
            k_all, v_all = k_cache, v_cache
        elif mode == "dus_vmap":
            k_all = jax.vmap(lambda c, n, o: jax.lax.dynamic_update_slice(
                c, n[None], (o, 0, 0)))(k_cache, new_k, pos)
            v_all = jax.vmap(lambda c, n, o: jax.lax.dynamic_update_slice(
                c, n[None], (o, 0, 0)))(v_cache, new_v, pos)
        elif mode == "dus_scalar":
            k_all = jax.lax.dynamic_update_slice(k_cache, new_k[:, None], (0, pos[0], 0, 0))
            v_all = jax.lax.dynamic_update_slice(v_cache, new_v[:, None], (0, pos[0], 0, 0))
        elif mode == "dus_loop":
            k_all, v_all = k_cache, v_cache
            for b in range(B):
                k_all = jax.lax.dynamic_update_slice(
                    k_all, new_k[b][None, None], (b, pos[b], 0, 0))
                v_all = jax.lax.dynamic_update_slice(
                    v_all, new_v[b][None, None], (b, pos[b], 0, 0))
        elif mode == "onehot":
            oh = (jnp.arange(S)[None, :] == pos[:, None]).astype(jnp.bfloat16)
            k_all = k_cache * (1 - oh)[:, :, None, None] + new_k[:, None] * oh[:, :, None, None]
            v_all = v_cache * (1 - oh)[:, :, None, None] + new_v[:, None] * oh[:, :, None, None]
        elif mode == "none":
            out = xx + 1e-6
            return out, (k_cache, v_cache)
        else:
            raise ValueError(mode)

        ctx = attn_math(q, k_all, v_all, pos)
        out = xx + ctx.mean(axis=(1, 2)).astype(xx.dtype) * 1e-3
        return out, (k_all, v_all)

    x, (caches_k, caches_v) = jax.lax.scan(layer, x, (caches_k, caches_v))
    return (caches_k, caches_v, pos + 1, x), x[:, 0]


def main():
    modes = sys.argv[1:] or ["none", "read_only", "dus_scalar", "dus_vmap", "onehot"]
    log(f"backend={jax.default_backend()}")
    key = jax.random.PRNGKey(0)
    caches_k = jax.random.normal(key, (L, B, S, KV, HD), jnp.bfloat16)
    caches_v = caches_k + 1
    pos = jnp.full((B,), 128, jnp.int32)
    x = jnp.ones((B, HD), jnp.bfloat16)
    carry0 = (caches_k, caches_v, pos, x)

    for mode in modes:
        fn = jax.jit(lambda c: jax.lax.scan(partial(step_fn, mode=mode), c,
                                            None, length=STEPS)[1])
        t0 = time.time()
        out = fn(carry0)
        np.asarray(out)
        comp = time.time() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            out = fn(carry0)
            np.asarray(out)
            best = min(best, time.time() - t0)
        log(f"{mode:10s}: {best/STEPS*1e3:7.2f} ms/step   compile {comp:.0f}s")


if __name__ == "__main__":
    main()
