#!/usr/bin/env python
"""W8A8 int8-MXU lab: does the int8 x int8 -> int32 dot actually run at
the MXU's double rate on v5e, and what does the W8A8 serving path deliver
at prefill shapes vs the bf16-dequant A16 path?

Variants (prefill-shaped M=2048 x K=2560 x N=9728 — the Qwen3-4B MLP
gate/up geometry, compute-bound at this M):

  bf16     — dense bf16 matmul (the MXU bf16 rate; spec 197 TFLOPs)
  w8_deq   — current A16 path: int8 weight dequant to bf16 + bf16 dot
  w8a8     — ops.dispatch.w8a8_token_matmul (dynamic per-token int8
             activations, int8 dot, int32 accum; spec 394 TOPS)
  i8_raw   — bare int8 dot (no act-quant overhead): the hardware ceiling

Differential timing between two scan lengths over >=4 distinct weight
replicas (axon tunnel rules: ~27 ms constant dispatch overhead,
np.asarray is the only honest sync).
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

M, K, N = 2048, 2560, 9728
NREP = 4
R1, R2 = 8, 32


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_variant(mode: str):
    from quantizers_tpu.ops.dispatch import w8a8_token_matmul, xla_quant_matmul
    from quantizers_tpu.ops.linear import QuantLinear

    def to_lin(w8, scale, act: bool):
        meta = (("k", K), ("n", N), ("group_size", None))
        if act:
            meta += (("act", "token_i8"),)
        return QuantLinear(kind="w8", weight=w8, scale=scale, meta=meta)

    if mode == "bf16":
        def f(x, w8, wbf, scale):
            return jnp.dot(x, wbf, preferred_element_type=jnp.float32)
    elif mode == "w8_deq":
        def f(x, w8, wbf, scale):
            return xla_quant_matmul(x, to_lin(w8, scale, act=False))
    elif mode == "w8a8":
        def f(x, w8, wbf, scale):
            return w8a8_token_matmul(x, to_lin(w8, scale, act=True))
    elif mode == "i8_raw":
        def f(x, w8, wbf, scale):
            xq = jnp.clip(x * 16.0, -127, 127).astype(jnp.int8)
            return jax.lax.dot_general(
                xq, w8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
    else:
        raise ValueError(mode)
    return f


@functools.partial(jax.jit, static_argnames=("mode", "reps"))
def run(x, w8s, wbfs, scales, *, mode, reps):
    f = make_variant(mode)

    def step(carry, i):
        x, acc = carry
        for r in range(NREP):
            y = f(x, w8s[r], wbfs[r], scales[r])
            acc = acc + y[0, 0]
            x = x + y[:, :K].astype(x.dtype) * 1e-9
        return (x, acc), ()

    (xf, acc), _ = jax.lax.scan(step, (x, jnp.zeros((), jnp.float32)),
                                jnp.arange(reps // NREP))
    return acc


def main():
    modes = sys.argv[1:] or ["bf16", "w8_deq", "w8a8", "i8_raw"]
    log(f"backend={jax.default_backend()} M={M} K={K} N={N} reps=({R1},{R2})")
    ks = jax.random.split(jax.random.PRNGKey(0), NREP + 1)
    w8s = jnp.stack([jax.random.randint(ks[r], (K, N), -127, 128, jnp.int8)
                     for r in range(NREP)])
    wbfs = w8s.astype(jnp.bfloat16) * 0.01
    scales = jnp.full((NREP, 1, N), 0.01, jnp.float32)
    x = jax.random.normal(ks[-1], (M, K), jnp.bfloat16)

    flops = 2.0 * M * K * N
    for mode in modes:
        try:
            times = {}
            for reps in (R1, R2):
                t0 = time.time()
                np.asarray(run(x, w8s, wbfs, scales, mode=mode, reps=reps))
                comp = time.time() - t0
                best = float("inf")
                for _ in range(3):
                    t0 = time.time()
                    np.asarray(run(x, w8s, wbfs, scales, mode=mode, reps=reps))
                    best = min(best, time.time() - t0)
                times[reps] = best
                log(f"  {mode} reps={reps}: {best*1e3:.1f} ms (compile {comp:.0f}s)")
            per_call = (times[R2] - times[R1]) / (R2 - R1)
            log(f"{mode:7s}: {per_call*1e3:7.3f} ms/matmul  "
                f"{flops/per_call/1e12:6.1f} TFLOP/s")
        except Exception as e:
            log(f"{mode:7s}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
