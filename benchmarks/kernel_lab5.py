#!/usr/bin/env python
"""w4 formulation lab, round 2: big-window differential timing.

kernel_lab4's window (64 vs 320 total matmuls, ~10 ms delta) was inside
the tunnel's run-to-run noise (~ms) — the copy floor measured *negative*.
Here the window is 512 vs 4096 matmuls (>= 70 ms delta) with 8 distinct
HBM-resident weight replicas per step, so slopes are trustworthy to a few
percent.

Variants (gate_proj shape K=2560 N=9728 g=32, m=16, real serving tile):

  empty    — pallas launch overhead (grid=1, no DMA beyond one 16x128 tile)
  copy     — DMA stream floor: full weight+scale BlockSpec traffic, token
             compute (consumes 8 rows so nothing is elided)
  ship     — shipped formulation: unsigned codes, per-group dots, analytic
             -8 offset correction via two extra dots
  signed   — two's-complement nibbles ((w<<28)>>28 sign-extend), per-group
             dots, NO correction dots (codes already centered)
  srepeat  — signed nibbles, pltpu.repeat-expanded scales, ONE dot/plane
  i4       — native jnp.int4 weight ref (created device-side; host->device
             transfer of int4 breaks through the axon tunnel), hardware
             cvt to bf16, repeat-expanded scales, one big dot
  bigtile  — ship at BK2=512 (5 MB tiles, half the grid steps)
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
NREP = 8             # distinct weight replicas cycled by the scan
R1, R2 = 512, 4096   # TOTAL matmul counts for differential timing


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _expand_scale(s, g):
    # (sg, bn) -> (sg*g, bn) by sublane repeat
    return pltpu.repeat(s[:, None, :], g, 1).reshape(s.shape[0] * g, s.shape[1])


def body_u8(x_lo, x_hi, w_ref, s_lo, s_hi, o_ref, acc, *, mode, g, bk2, n_k):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _zero():
        acc[:] = jnp.zeros_like(acc)

    gcount = bk2 // g
    packed = w_ref[:].astype(jnp.int32)

    if mode == "copy":
        acc[:] += (jnp.sum(packed[:8, :].astype(jnp.float32))
                   + jnp.sum(s_lo[:1, :].astype(jnp.float32))) * 1e-9
    elif mode in ("ship", "bigtile"):
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
    elif mode == "signed":
        for x_ref, lsh, s_ref in ((x_lo, 28, s_lo), (x_hi, 24, s_hi)):
            x = x_ref[:]
            s = s_ref[:].astype(jnp.float32)
            codes = ((packed << lsh) >> 28).astype(jnp.bfloat16)
            for gi in range(gcount):
                part = jnp.dot(x[:, gi * g:(gi + 1) * g],
                               codes[gi * g:(gi + 1) * g, :],
                               preferred_element_type=jnp.float32)
                acc[:] += part * s[gi:gi + 1, :]
    elif mode == "srepeat":
        for x_ref, lsh, s_ref in ((x_lo, 28, s_lo), (x_hi, 24, s_hi)):
            codes = ((packed << lsh) >> 28).astype(jnp.bfloat16)
            se = _expand_scale(s_ref[:], g)
            acc[:] += jnp.dot(x_ref[:], codes * se,
                              preferred_element_type=jnp.float32)
    else:
        raise ValueError(mode)

    @pl.when(ki == n_k - 1)
    def _write():
        o_ref[:] = acc[:].astype(o_ref.dtype)


def body_i4(x_ref, w_ref, s_ref, o_ref, acc, *, g, bk, n_k):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _zero():
        acc[:] = jnp.zeros_like(acc)

    codes = w_ref[:].astype(jnp.bfloat16)          # hardware int4 -> bf16
    se = _expand_scale(s_ref[:], g)
    acc[:] += jnp.dot(x_ref[:], codes * se, preferred_element_type=jnp.float32)

    @pl.when(ki == n_k - 1)
    def _write():
        o_ref[:] = acc[:].astype(o_ref.dtype)


def body_empty(x_ref, o_ref):
    o_ref[:] = x_ref[:] + 1.0


def make_call(mode, bk2):
    n_k = (K // 2) // bk2
    sg = bk2 // G

    if mode == "empty":
        def call(x2, packed, scale):
            return pl.pallas_call(
                body_empty,
                grid=(1,),
                in_specs=[pl.BlockSpec((16, 128), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((16, 128), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((16, 128), jnp.bfloat16),
            )(x2[:, :128])
        return call

    if mode == "i4":
        bk = bk2 * 2
        def call(x2, w_i4, scale):
            grid = (1, 1, (K // bk))
            return pl.pallas_call(
                functools.partial(body_i4, g=G, bk=bk, n_k=K // bk),
                grid=grid,
                in_specs=[
                    pl.BlockSpec((16, bk), lambda i, j, ki: (i, ki),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((bk, N), lambda i, j, ki: (ki, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((bk // G, N), lambda i, j, ki: (ki, j),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((16, N), lambda i, j, ki: (i, j),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((16, N), jnp.bfloat16),
                scratch_shapes=[pltpu.VMEM((16, N), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel", "arbitrary")),
            )(x2, w_i4, scale)
        return call

    def call(x2, packed, scale):
        grid = (1, 1, n_k)
        return pl.pallas_call(
            functools.partial(body_u8, mode=mode, g=G, bk2=bk2, n_k=n_k),
            grid=grid,
            in_specs=[
                pl.BlockSpec((16, bk2), lambda i, j, ki: (i, ki), memory_space=pltpu.VMEM),
                pl.BlockSpec((16, bk2), lambda i, j, ki: (i, ki + n_k), memory_space=pltpu.VMEM),
                pl.BlockSpec((bk2, N), lambda i, j, ki: (ki, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((sg, N), lambda i, j, ki: (ki, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((sg, N), lambda i, j, ki: (ki + n_k, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((16, N), lambda i, j, ki: (i, j), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((16, N), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((16, N), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(x2, x2, packed, scale, scale)

    return call


@functools.partial(jax.jit, static_argnames=("mode", "reps"))
def run(x2, ws, ss, *, mode, reps):
    bk2 = 512 if mode == "bigtile" else 256
    call = make_call(mode, bk2)

    def step(carry, _):
        x, acc = carry
        for w, s in zip(ws, ss):
            y = call(x, w, s)
            acc = acc + y[0, 0].astype(jnp.float32)
            x = x + y[:, :1].astype(x.dtype) * 1e-9
        return (x, acc), ()

    (xf, acc), _ = jax.lax.scan(step, (x2, jnp.zeros((), jnp.float32)),
                                None, length=reps // NREP)
    return acc


@jax.jit
def to_i4(packed):
    lo = (packed.astype(jnp.int32) & 0x0F) - 8
    hi = (packed.astype(jnp.int32) >> 4) - 8
    return jnp.concatenate([lo, hi], axis=0).astype(jnp.int4)


def main():
    modes = sys.argv[1:] or ["empty", "copy", "ship", "signed", "srepeat",
                             "i4", "bigtile"]
    log(f"backend={jax.default_backend()} NREP={NREP} R=({R1},{R2})")
    key = jax.random.PRNGKey(0)
    packed_all = jax.random.bits(key, (NREP, K // 2, N), dtype=jnp.uint8)
    scale_all = jnp.full((NREP, K // G, N), 0.01, jnp.bfloat16)
    x2 = jnp.ones((16, K), jnp.bfloat16)
    wbytes = (K // 2) * N + (K // G) * N * 2

    for mode in modes:
        tag = mode
        try:
            ws = [packed_all[i] for i in range(NREP)]
            if mode == "i4":
                ws = [to_i4(w) for w in ws]
            ss = [scale_all[i] for i in range(NREP)]
            times = {}
            for reps in (R1, R2):
                t0 = time.time()
                np.asarray(run(x2, ws, ss, mode=mode, reps=reps))
                comp = time.time() - t0
                best = float("inf")
                for _ in range(3):
                    t0 = time.time()
                    np.asarray(run(x2, ws, ss, mode=mode, reps=reps))
                    best = min(best, time.time() - t0)
                times[reps] = best
                log(f"  {tag} reps={reps}: total {best*1e3:.1f} ms (compile {comp:.0f}s)")
            per = (times[R2] - times[R1]) / (R2 - R1)
            eff = wbytes / per / 1e9
            log(f"{tag:10s}: {per*1e6:8.2f} us/call  {eff:7.0f} GB/s")
        except Exception as e:
            log(f"{tag:10s}: FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
