#!/usr/bin/env python
"""w4 lab 3: beat the 7.6 us/tile dequant compute (vs 4.4 us DMA floor).

lab5 facts (differential, 8 HBM replicas, gate shape K=2560 N=9728 g=32):
empty 0.89 us/call; copy floor 630 GB/s (4.44 us/tile incl. scale DMAs);
ship 370 GB/s (7.6 us/tile: compute-bound); signed == ship (correction
dots were free); srepeat 190 (pltpu.repeat scale expand is 2x worse);
int4 weights FAIL through the axon tunnel even when created device-side
(S4 jit-arg recursion); BK2=512 crashes the remote compiler.

New variants:
  i4dots  — S4 weights materialized INSIDE the timed jit (tunnel never
            sees an S4 arg): hardware i4->bf16 cvt, per-group dots
  i4big   — same S4 path, one dot per 128-row slab, scales on partials
            (g=32 folded by pre-scaling x? no — slab dots need g|slab;
            here: per-group dots replaced by 32-row group dots as i4dots
            but slabbed 4 groups with per-group f32 partial scaling)
  fdots   — u8 -> bf16 cvt FIRST (2x unpack, not 4x i32 widen), nibble
            split in float arithmetic (hi=floor(w/16), lo=w-16*hi, both
            exact in bf16), per-group dots + correction dots
  ship320 — ship at BK2=320 (3.1 MB tiles, 4 grid steps)
  ship640 — ship at BK2=640 (6.2 MB tiles, 2 grid steps)
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
NREP = 8
R1, R2 = 512, 4096


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def group_dots(acc, x, codes_bf16_fn, s_ref, gcount, g, correction):
    s = s_ref[:].astype(jnp.float32)
    for gi in range(gcount):
        part = jnp.dot(x[:, gi * g:(gi + 1) * g], codes_bf16_fn(gi),
                       preferred_element_type=jnp.float32)
        acc[:] += part * s[gi:gi + 1, :]
    if correction is not None:
        xg = jnp.dot(x, correction, preferred_element_type=jnp.float32)
        acc[:] += jnp.dot(xg, s * -8.0, preferred_element_type=jnp.float32)


def body_u8(x_lo, x_hi, w_ref, s_lo, s_hi, o_ref, acc, *, mode, g, bk2, n_k):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _zero():
        acc[:] = jnp.zeros_like(acc)

    gcount = bk2 // g

    if mode == "fdots":
        w = w_ref[:].astype(jnp.bfloat16)      # u8 -> bf16, exact 0..255
        hi = jnp.floor(w * jnp.bfloat16(0.0625))
        lo = w - hi * jnp.bfloat16(16.0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (bk2, gcount), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (bk2, gcount), 1)
        Gm = (rows // g == cols).astype(jnp.bfloat16)
        for x_ref, codes, s_ref in ((x_lo, lo, s_lo), (x_hi, hi, s_hi)):
            group_dots(acc, x_ref[:], lambda gi, c=codes: c[gi * g:(gi + 1) * g, :],
                       s_ref, gcount, g, Gm)
    else:  # ship / ship320 / ship640
        packed = w_ref[:].astype(jnp.int32)
        rows = jax.lax.broadcasted_iota(jnp.int32, (bk2, gcount), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (bk2, gcount), 1)
        Gm = (rows // g == cols).astype(jnp.bfloat16)
        for x_ref, shift, s_ref in ((x_lo, 0, s_lo), (x_hi, 4, s_hi)):
            codes = ((packed >> 4) if shift else (packed & 0x0F)).astype(jnp.bfloat16)
            group_dots(acc, x_ref[:], lambda gi, c=codes: c[gi * g:(gi + 1) * g, :],
                       s_ref, gcount, g, Gm)

    @pl.when(ki == n_k - 1)
    def _write():
        o_ref[:] = acc[:].astype(o_ref.dtype)


def body_i4(x_ref, w_ref, s_ref, o_ref, acc, *, mode, g, bk, n_k):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _zero():
        acc[:] = jnp.zeros_like(acc)

    x = x_ref[:]
    s = s_ref[:].astype(jnp.float32)
    gcount = bk // g
    if mode == "i4dots":
        for gi in range(gcount):
            codes = w_ref[gi * g:(gi + 1) * g, :].astype(jnp.bfloat16)
            part = jnp.dot(x[:, gi * g:(gi + 1) * g], codes,
                           preferred_element_type=jnp.float32)
            acc[:] += part * s[gi:gi + 1, :]
    else:  # i4big: whole-tile cvt, 32-row group dots on the cvt result
        codes = w_ref[:].astype(jnp.bfloat16)
        for gi in range(gcount):
            part = jnp.dot(x[:, gi * g:(gi + 1) * g],
                           codes[gi * g:(gi + 1) * g, :],
                           preferred_element_type=jnp.float32)
            acc[:] += part * s[gi:gi + 1, :]

    @pl.when(ki == n_k - 1)
    def _write():
        o_ref[:] = acc[:].astype(o_ref.dtype)


def make_call(mode, bk2):
    if mode.startswith("i4"):
        bk = 2 * bk2
        n_k = K // bk

        def call(x2, w_i4, scale):
            return pl.pallas_call(
                functools.partial(body_i4, mode=mode, g=G, bk=bk, n_k=n_k),
                grid=(1, 1, n_k),
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

    n_k = (K // 2) // bk2
    sg = bk2 // G

    def call(x2, packed, scale):
        return pl.pallas_call(
            functools.partial(body_u8, mode=mode, g=G, bk2=bk2, n_k=n_k),
            grid=(1, 1, n_k),
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
    bk2 = {"ship320": 320, "ship640": 640}.get(mode, 256)
    call = make_call(mode, bk2)

    if mode.startswith("i4"):
        # u8 -> S4 INSIDE the jit: the tunnel never sees an int4 array.
        # One-time relayout, outside the timed scan's per-step cost
        # (differential timing cancels it anyway).
        def conv(p):
            lo = (p.astype(jnp.int32) & 0x0F) - 8
            hi = (p.astype(jnp.int32) >> 4) - 8
            return jnp.concatenate([lo, hi], axis=0).astype(jnp.int4)

        ws = [conv(w) for w in ws]

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


def main():
    modes = sys.argv[1:] or ["i4dots", "i4big", "fdots", "ship320", "ship640"]
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
