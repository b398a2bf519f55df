#!/usr/bin/env python
"""w4 kernel op-cost isolation on real hardware.

One gate_proj-shaped matmul (K=2560, N=9728, g=32, m=8) run 64x via scan;
variants strip the dequant pipeline down op by op to find which stage eats
the time:

  copy        — kernel just copies the weight tile to a (8,128) checksum
                (pure DMA stream floor)
  dot_raw     — dot(x, packed.astype(bf16)) on the packed (K/2) rows only
                (MXU + cvt floor, no unpack)
  unpack      — lo/hi extract + cvt + dot, no scaling (adds mask/shift)
  scale_bcast — + group scale via reshape-broadcast (the current kernel)
  scale_dots  — + group scale via per-group small dots (no reshape/relayout)
  current     — the shipped _w4_kernel (incl. offset-correction dots)

Prints ms per matmul and effective GB/s of packed-weight streaming.
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
BK2, BN = 256, 2432  # what _pick_tiles chooses at the 1MB budget
REPS = 64


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def kernel_body(x_lo, x_hi, w_ref, s_lo, s_hi, o_ref, acc, *, mode, g, bk2, n_k):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _zero():
        acc[:] = jnp.zeros_like(acc)

    gcount = bk2 // g
    packed = w_ref[:].astype(jnp.int32)

    if mode == "copy":
        acc[:] += jnp.sum(packed[:8, :128].astype(jnp.float32)) * 1e-9
    elif mode == "dot_raw":
        w = packed.astype(jnp.bfloat16)
        acc[:] += jnp.dot(x_lo[:], w, preferred_element_type=jnp.float32)
    elif mode == "unpack":
        lo = (packed & 0x0F).astype(jnp.bfloat16)
        hi = (packed >> 4).astype(jnp.bfloat16)
        acc[:] += jnp.dot(x_lo[:], lo, preferred_element_type=jnp.float32)
        acc[:] += jnp.dot(x_hi[:], hi, preferred_element_type=jnp.float32)
    elif mode == "scale_bcast":
        for x_ref, codes, s_ref in ((x_lo, packed & 0x0F, s_lo),
                                    (x_hi, packed >> 4, s_hi)):
            c = codes.astype(jnp.bfloat16)
            s = s_ref[:].astype(jnp.bfloat16)
            w = (c.reshape(gcount, g, -1) * s[:, None, :]).reshape(bk2, -1)
            acc[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
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
def run_variant(x2, packed, scale, *, mode):
    m = x2.shape[0]
    k2 = packed.shape[0]
    n_k = k2 // BK2
    sg = BK2 // G
    grid = (m // 16, N // BN, n_k)

    f = pl.pallas_call(
        functools.partial(kernel_body, mode=mode, g=G, bk2=BK2, n_k=n_k),
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
        x = carry
        y = f(x, x, packed, scale, scale)
        return x + y[:, :1] * 1e-9, y[0, 0]

    _, ys = jax.lax.scan(step, x2, None, length=REPS)
    return ys


def main():
    modes = sys.argv[1:] or ["copy", "dot_raw", "unpack", "scale_bcast", "scale_dots",
                             "current"]
    log(f"backend={jax.default_backend()}  tile=({BK2},{BN})  grid_nk={K//2//BK2}")
    key = jax.random.PRNGKey(0)
    packed = jax.random.bits(key, (K // 2, N), dtype=jnp.uint8)
    scale = jnp.full((K // G, N), 0.01, jnp.bfloat16)
    x2 = jnp.ones((16, K), jnp.bfloat16)
    wbytes = packed.size + scale.size * 2

    for mode in modes:
        if mode == "current":
            from quantizers_tpu.ops.linear import QuantLinear
            from quantizers_tpu.ops.kernels import w4_matmul
            lin = QuantLinear(kind="w4", weight=packed, scale=scale,
                              meta=(("k", K), ("n", N), ("group_size", G)))

            @jax.jit
            def cur(x2):
                def step(carry, _):
                    y = w4_matmul(carry[:, :K], lin)
                    return carry + y[:, :1] * 1e-9, y[0, 0]
                _, ys = jax.lax.scan(step, x2, None, length=REPS)
                return ys
            fn = lambda: cur(x2)
        else:
            fn = lambda mode=mode: run_variant(x2, packed, scale, mode=mode)
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


if __name__ == "__main__":
    main()
