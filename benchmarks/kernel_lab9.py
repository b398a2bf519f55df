#!/usr/bin/env python
"""fp8-block formulation lab: panel-major relayout.

Every in-place formulation of 128x128 block scaling failed (tiling rules,
Mosaic crashes, 15 GB/s pl.when ladder — bench_kernels.py). New idea:
relayout the weight as (N/128, K, 128) contiguous column panels and the
scales row-expanded per panel as (N/128, K, 1) f32 — then a panel's scale
is a (K, 1) column vector whose multiply over the (K, 128) panel is a
natural LANE broadcast, no expansion ops at all.

  fp8panel — grid (1, N/128): per step one contiguous 327 KB panel DMA,
             wd = w * s (lane broadcast), one (m,K)@(K,128) dot
  fp8p4    — same but 4 panels per grid step (fewer, bigger DMAs)
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

K, N = 2560, 9728
NREP = 8
R1, R2 = 512, 4096


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def body(x_ref, w_ref, s_ref, o_ref, *, npan):
    w = w_ref[:].astype(jnp.float32)      # (npan, K, 128)
    s = s_ref[:]                          # (npan, K, 1) f32
    wd = (w * s).astype(jnp.bfloat16)
    x = x_ref[:]                          # (m, K)
    outs = []
    for p in range(npan):
        outs.append(jnp.dot(x, wd[p], preferred_element_type=jnp.float32))
    o_ref[:] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def make_call(npan):
    def call(x2, wp, sp):
        return pl.pallas_call(
            functools.partial(body, npan=npan),
            grid=(1, N // (128 * npan)),
            in_specs=[
                pl.BlockSpec((8, K), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((npan, K, 128), lambda i, j: (j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((npan, K, 1), lambda i, j: (j, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, 128 * npan), lambda i, j: (0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, N), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(x2, wp, sp)

    return call


@functools.partial(jax.jit, static_argnames=("npan", "reps"))
def run(x2, ws, ss, *, npan, reps):
    call = make_call(npan)

    def step(carry, _):
        x, acc = carry
        for w, s in zip(ws, ss):
            y = call(x, w, s)
            acc = acc + y[0, 0].astype(jnp.float32)
            x = x + y[:, :1].astype(x.dtype) * 1e-9
        return (x, acc), ()

    (_, acc), _ = jax.lax.scan(step, (x2, jnp.zeros((), jnp.float32)),
                               None, length=reps // NREP)
    return acc


def main():
    npans = [int(a) for a in sys.argv[1:]] or [1, 4]
    log(f"backend={jax.default_backend()}")
    key = jax.random.PRNGKey(0)
    # panel-major weight (N/128, K, 128) fp8 + row-expanded panel scales
    ws = [(jax.random.normal(k, (N // 128, K, 128), jnp.float32) * 0.1
           ).astype(jnp.float8_e4m3fn)
          for k in jax.random.split(key, NREP)]
    ss = [jnp.full((N // 128, K, 1), 1.0, jnp.float32) for _ in range(NREP)]
    x2 = jnp.ones((8, K), jnp.bfloat16)
    wbytes = K * N + (K // 128) * (N // 128) * 4

    for npan in npans:
        try:
            times = {}
            for reps in (R1, R2):
                t0 = time.time()
                np.asarray(run(x2, ws, ss, npan=npan, reps=reps))
                comp = time.time() - t0
                best = float("inf")
                for _ in range(3):
                    t0 = time.time()
                    np.asarray(run(x2, ws, ss, npan=npan, reps=reps))
                    best = min(best, time.time() - t0)
                times[reps] = best
                log(f"  npan={npan} reps={reps}: {best*1e3:.1f} ms (compile {comp:.0f}s)")
            per = (times[R2] - times[R1]) / (R2 - R1)
            log(f"npan={npan}: {per*1e6:7.2f} us/call  {wbytes/per/1e9:5.0f} GB/s")
        except Exception as e:
            log(f"npan={npan}: FAILED {type(e).__name__}: {str(e)[:250]}")


if __name__ == "__main__":
    main()
