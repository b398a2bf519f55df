#!/usr/bin/env python
"""w4 kernel formulation lab, differential timing.

Timing: each variant is compiled at two scan lengths (R1=64, R2=576) and
the per-matmul cost is the slope (t2-t1)/(R2-R1) — the ~27 ms constant
tunnel dispatch overhead cancels (memory: axon-tpu-quirks #4).

Variants (gate_proj-shaped: K=2560, N=9728, g=32, m=16; tile = the real
_pick_tiles choice (256, 9728) full-row):

  copy          — DMA stream floor (checksum only)
  scale_dots    — shipped formulation (per-group dots + offset-correction dots)
  signed_dots   — signed-nibble extraction ((b<<24|28)>>28), per-group dots,
                  NO correction dots (codes already centered)
  scale_repeat  — unsigned codes, jnp.repeat-expanded scales, ONE big dot
                  per plane + correction dots
  signed_repeat — signed extraction + repeat-expanded scales + one dot/plane
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K, N, G = 2560, 9728, 32
BK2, BN = 256, 9728  # the shipped _pick_tiles choice (full-row, 2.49 MB)
R1, R2 = 64, 576


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def body(x_lo, x_hi, w_ref, s_lo, s_hi, o_ref, acc, *, mode, g, bk2, n_k):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _zero():
        acc[:] = jnp.zeros_like(acc)

    gcount = bk2 // g
    packed = w_ref[:].astype(jnp.int32)

    if mode == "copy":
        acc[:] += jnp.sum(packed[:8, :128].astype(jnp.float32)) * 1e-9

    elif mode == "scale_dots":
        rows = jax.lax.broadcasted_iota(jnp.int32, (bk2, gcount), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (bk2, gcount), 1)
        Gm = (rows // g == cols).astype(jnp.bfloat16)
        for x_ref, shift, s_ref in ((x_lo, 0, s_lo), (x_hi, 4, s_hi)):
            x = x_ref[:]
            s = s_ref[:].astype(jnp.float32)
            codes = ((packed >> 4) if shift else (packed & 0x0F)).astype(jnp.bfloat16)
            for gi in range(gcount):
                part = jnp.dot(x[:, gi * g:(gi + 1) * g],
                               codes[gi * g:(gi + 1) * g, :],
                               preferred_element_type=jnp.float32)
                acc[:] += part * s[gi:gi + 1, :]
            xg = jnp.dot(x, Gm, preferred_element_type=jnp.float32)
            acc[:] += jnp.dot(xg, s * -8.0, preferred_element_type=jnp.float32)

    elif mode == "signed_dots":
        for x_ref, lo, s_ref in ((x_lo, True, s_lo), (x_hi, False, s_hi)):
            x = x_ref[:]
            s = s_ref[:].astype(jnp.float32)
            codes = (((packed << 28) >> 28) if lo
                     else ((packed << 24) >> 28)).astype(jnp.bfloat16)
            for gi in range(gcount):
                part = jnp.dot(x[:, gi * g:(gi + 1) * g],
                               codes[gi * g:(gi + 1) * g, :],
                               preferred_element_type=jnp.float32)
                acc[:] += part * s[gi:gi + 1, :]

    elif mode == "scale_repeat":
        rows = jax.lax.broadcasted_iota(jnp.int32, (bk2, gcount), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (bk2, gcount), 1)
        Gm = (rows // g == cols).astype(jnp.bfloat16)
        for x_ref, shift, s_ref in ((x_lo, 0, s_lo), (x_hi, 4, s_hi)):
            x = x_ref[:]
            s = s_ref[:].astype(jnp.float32)
            codes = ((packed >> 4) if shift else (packed & 0x0F)).astype(jnp.bfloat16)
            srep = jnp.repeat(s.astype(jnp.bfloat16), g, axis=0)  # (bk2, bn)
            acc[:] += jnp.dot(x, codes * srep, preferred_element_type=jnp.float32)
            xg = jnp.dot(x, Gm, preferred_element_type=jnp.float32)
            acc[:] += jnp.dot(xg, s * -8.0, preferred_element_type=jnp.float32)

    elif mode == "signed_repeat":
        for x_ref, lo, s_ref in ((x_lo, True, s_lo), (x_hi, False, s_hi)):
            x = x_ref[:]
            codes = (((packed << 28) >> 28) if lo
                     else ((packed << 24) >> 28)).astype(jnp.bfloat16)
            srep = jnp.repeat(s_ref[:].astype(jnp.bfloat16), g, axis=0)
            acc[:] += jnp.dot(x, codes * srep, preferred_element_type=jnp.float32)

    else:
        raise ValueError(mode)

    @pl.when(ki == n_k - 1)
    def _write():
        o_ref[:] = acc[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("mode", "reps"))
def run(x2, packed, scale, *, mode, reps):
    m = x2.shape[0]
    k2 = packed.shape[0]
    n_k = k2 // BK2
    sg = BK2 // G
    grid = (m // 16, N // BN, n_k)
    f = pl.pallas_call(
        functools.partial(body, mode=mode, g=G, bk2=BK2, n_k=n_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((16, BK2), lambda i, j, ki: (i, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, BK2), lambda i, j, ki: (i, ki + n_k), memory_space=pltpu.VMEM),
            pl.BlockSpec((BK2, BN), lambda i, j, ki: (ki, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((sg, BN), lambda i, j, ki: (ki, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((sg, BN), lambda i, j, ki: (ki + n_k, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, BN), lambda i, j, ki: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((16, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )

    def step(carry, _):
        y = f(carry, carry, packed, scale, scale)
        return carry + y[:, :1] * 1e-9, ()

    final, _ = jax.lax.scan(step, x2, None, length=reps)
    return final[0, 0]


def main():
    modes = sys.argv[1:] or ["copy", "scale_dots", "signed_dots",
                             "scale_repeat", "signed_repeat"]
    log(f"backend={jax.default_backend()} tile=({BK2},{BN}) R=({R1},{R2})")
    key = jax.random.PRNGKey(0)
    packed = jax.random.bits(key, (K // 2, N), dtype=jnp.uint8)
    scale = jnp.full((K // G, N), 0.01, jnp.bfloat16)
    x2 = jnp.ones((16, K), jnp.bfloat16)
    wbytes = packed.size + scale.size * 2

    for mode in modes:
        try:
            times = {}
            for reps in (R1, R2):
                t0 = time.time()
                np.asarray(run(x2, packed, scale, mode=mode, reps=reps))
                comp = time.time() - t0
                best = float("inf")
                for _ in range(3):
                    t0 = time.time()
                    np.asarray(run(x2, packed, scale, mode=mode, reps=reps))
                    best = min(best, time.time() - t0)
                times[reps] = best
                log(f"  {mode} reps={reps}: total {best*1e3:.1f} ms (compile {comp:.0f}s)")
            per = (times[R2] - times[R1]) / (R2 - R1)
            log(f"{mode:14s}: {per*1e6:8.1f} us/matmul  {wbytes/per/1e9:7.0f} GB/s")
        except Exception as e:
            log(f"{mode:14s}: FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
