#!/usr/bin/env python
"""Round-2 w4 kernel experiments: native int4 dequant paths.

Hypothesis: the 444 GB/s effective (vs 775 streaming floor) of the shipped
w4 kernel is VPU relayout cost — u8 widen->i32, shift/mask, cvt->bf16 per
element. A native ``jnp.int4`` weight ref would let Mosaic use hardware
int4 unpack (one cvt i4->bf16, no masks, no +8 offset-correction dots,
half the x/scale routing since there are no split-half planes).

Variants (one gate_proj-shaped matmul K=2560, N=9728, g=32, m=16, 64x scan):

  copy       — DMA stream floor (u8 tile, checksum only)
  scale_dots — shipped formulation re-measured (baseline)
  i4_floor   — int4 ref, cvt + ONE dot per tile, no scales (int4 path ceiling)
  i4_dots    — int4 ref + per-group-dot scaling (drop-in formulation)
  i4_bcast   — int4 ref + reshape-broadcast scaling
  i4_repeat  — int4 ref + jnp.repeat(scale, g, axis=0) elementwise scaling
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

K, N, G, M = 2560, 9728, 32, 8
BK2, BN = 256, 2432   # u8 tile (half-rows); int4 uses (2*BK2, BN)
REPS = 64


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# -- u8 baseline bodies (copy / scale_dots), same as kernel_lab.py ----------

def u8_body(x_lo, x_hi, w_ref, s_lo, s_hi, o_ref, acc, *, mode, g, bk2, n_k):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _zero():
        acc[:] = jnp.zeros_like(acc)

    gcount = bk2 // g
    packed = w_ref[:].astype(jnp.int32)
    if mode == "copy":
        acc[:] += jnp.sum(packed[:8, :128].astype(jnp.float32)) * 1e-9
    elif mode == "scale_dots":
        for x_ref, codes, s_ref in ((x_lo, packed & 0x0F, s_lo),
                                    (x_hi, packed >> 4, s_hi)):
            c = codes.astype(jnp.bfloat16)
            x = x_ref[:]
            s = s_ref[:].astype(jnp.float32)
            for gi in range(gcount):
                part = jnp.dot(x[:, gi * g:(gi + 1) * g], c[gi * g:(gi + 1) * g, :],
                               preferred_element_type=jnp.float32)
                acc[:] += part * s[gi:gi + 1, :]
    else:
        raise ValueError(mode)

    @pl.when(ki == n_k - 1)
    def _write():
        o_ref[:] = acc[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("mode",))
def run_u8(x2, packed, scale, *, mode):
    m = x2.shape[0]
    k2 = packed.shape[0]
    n_k = k2 // BK2
    sg = BK2 // G
    grid = (m // 16, N // BN, n_k)
    f = pl.pallas_call(
        functools.partial(u8_body, mode=mode, g=G, bk2=BK2, n_k=n_k),
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
        return carry + y[:, :1] * 1e-9, y[0, 0]

    _, ys = jax.lax.scan(step, x2, None, length=REPS)
    return ys


# -- int4 bodies ------------------------------------------------------------

def i4_body(x_ref, w_ref, s_ref, o_ref, acc, *, mode, g, bk, n_k):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _zero():
        acc[:] = jnp.zeros_like(acc)

    gcount = bk // g
    codes = w_ref[:].astype(jnp.bfloat16)  # (bk, bn) — hardware i4 unpack
    x = x_ref[:]
    if mode == "i4_floor":
        acc[:] += jnp.dot(x, codes, preferred_element_type=jnp.float32)
    elif mode == "i4_dots":
        s = s_ref[:].astype(jnp.float32)
        for gi in range(gcount):
            part = jnp.dot(x[:, gi * g:(gi + 1) * g], codes[gi * g:(gi + 1) * g, :],
                           preferred_element_type=jnp.float32)
            acc[:] += part * s[gi:gi + 1, :]
    elif mode == "i4_bcast":
        s = s_ref[:].astype(jnp.bfloat16)
        w = (codes.reshape(gcount, g, -1) * s[:, None, :]).reshape(bk, -1)
        acc[:] += jnp.dot(x, w, preferred_element_type=jnp.float32)
    elif mode == "i4_repeat":
        s = jnp.repeat(s_ref[:].astype(jnp.bfloat16), g, axis=0)  # (bk, bn)
        acc[:] += jnp.dot(x, codes * s, preferred_element_type=jnp.float32)
    else:
        raise ValueError(mode)

    @pl.when(ki == n_k - 1)
    def _write():
        o_ref[:] = acc[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("mode",))
def run_i4(x2, w4, scale, *, mode):
    m = x2.shape[0]
    bk = 2 * BK2
    n_k = K // bk
    sg = bk // G
    grid = (m // 16, N // BN, n_k)
    f = pl.pallas_call(
        functools.partial(i4_body, mode=mode, g=G, bk=bk, n_k=n_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((16, bk), lambda i, j, ki: (i, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, BN), lambda i, j, ki: (ki, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((sg, BN), lambda i, j, ki: (ki, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, BN), lambda i, j, ki: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((16, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )

    def step(carry, _):
        y = f(carry, w4, scale, scale) if False else f(carry, w4, scale)
        return carry + y[:, :1] * 1e-9, y[0, 0]

    _, ys = jax.lax.scan(step, x2, None, length=REPS)
    return ys


def main():
    modes = sys.argv[1:] or ["copy", "scale_dots", "i4_floor", "i4_dots",
                             "i4_bcast", "i4_repeat"]
    log(f"backend={jax.default_backend()}")
    key = jax.random.PRNGKey(0)
    packed = jax.random.bits(key, (K // 2, N), dtype=jnp.uint8)
    scale = jnp.full((K // G, N), 0.01, jnp.bfloat16)
    x2 = jnp.ones((16, K), jnp.bfloat16)
    wbytes = packed.size + scale.size * 2

    # int4 weights created ON DEVICE (host->device int4 transfer breaks the
    # axon tunnel): random i8 in [-8, 8) cast down.
    w4 = None
    try:
        wi8 = jax.random.randint(jax.random.PRNGKey(1), (K, N), -8, 8, jnp.int8)
        w4 = wi8.astype(jnp.int4)
        w4 = jax.block_until_ready(w4)
        log(f"int4 array OK: {w4.shape} {w4.dtype}")
    except Exception as e:
        log(f"int4 array creation FAILED: {e!r}")

    for mode in modes:
        try:
            if mode.startswith("i4"):
                if w4 is None:
                    log(f"{mode:12s}: SKIP (no int4 array)")
                    continue
                fn = lambda mode=mode: run_i4(x2, w4, scale, mode=mode)
            else:
                fn = lambda mode=mode: run_u8(x2, packed, scale, mode=mode)
            t0 = time.time()
            np.asarray(fn())
            comp = time.time() - t0
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                np.asarray(fn())
                best = min(best, time.time() - t0)
            per = best / REPS
            log(f"{mode:12s}: {per*1e6:8.1f} us/matmul  {wbytes/per/1e9:7.0f} GB/s  (compile {comp:.0f}s)")
        except Exception as e:
            log(f"{mode:12s}: FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
