#!/usr/bin/env python
"""w4 streaming truth: distinct weights per scan step.

kernel_lab3 timed one weight array re-fed every scan rep — 14 MB fits in
VMEM, so the measured "bandwidth" (3.5 TB/s) was cache-resident compute,
not HBM streaming. Here each scan step reads a DIFFERENT replica out of a
stacked (R, K/2, N) HBM array (dynamic-sliced outside the kernel), so
every step pays real HBM traffic — exactly like the 36-layer decode loop.

Also tests GROUPED calls: `fused2` runs the same total bytes as ONE
pallas_call over a 2x-K weight (fewer call launches per step) to expose
per-call overhead.
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
BK2, BN = 256, 9728
NREP = 8          # distinct weight replicas cycled by the scan
R1, R2 = 64, 320  # TOTAL matmul counts for differential timing (divided by NREP inside)


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
    else:
        raise ValueError(mode)

    @pl.when(ki == n_k - 1)
    def _write():
        o_ref[:] = acc[:].astype(o_ref.dtype)


def make_call(mode, k, n):
    k2 = k // 2
    n_k = k2 // BK2
    sg = BK2 // G

    def call(x2, packed, scale):
        grid = (1, n // BN, n_k)
        return pl.pallas_call(
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
            out_shape=jax.ShapeDtypeStruct((16, n), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((16, BN), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(x2, x2, packed, scale, scale)

    return call


@functools.partial(jax.jit, static_argnames=("mode", "reps", "fuse"))
def run(x2, packed_all, scale_all, *, mode, reps, fuse):
    # NREP distinct weight arrays closed over STATICALLY (tuple unstacked
    # outside) — a dynamic slice here would make XLA materialize a 12 MB
    # copy per step and poison the measurement.
    k = K * fuse
    call = make_call(mode, k, N)
    ws = [packed_all[i] for i in range(NREP)]
    ss = [scale_all[i] for i in range(NREP)]
    if fuse > 1:
        ws = [jnp.concatenate(ws[i:i + fuse], axis=0) for i in range(0, NREP, fuse)]
        ss = [jnp.concatenate(ss[i:i + fuse], axis=0) for i in range(0, NREP, fuse)]

    def step(carry, _):
        x, acc = carry
        xx = jnp.concatenate([x] * fuse, axis=1) if fuse > 1 else x
        for w, s in zip(ws, ss):
            y = call(xx, w, s)
            acc = acc + y[0, 0]
            xx = xx + y[:, :1].astype(xx.dtype) * 1e-9
        return (xx[:, :K], acc), ()

    (xf, acc), _ = jax.lax.scan(step, (x2, jnp.zeros((), jnp.float32)),
                                None, length=reps // NREP)
    return acc


def main():
    cases = [("copy", 1), ("scale_dots", 1), ("scale_dots", 2)]
    log(f"backend={jax.default_backend()} NREP={NREP} R=({R1},{R2})")
    key = jax.random.PRNGKey(0)
    packed_all = jax.random.bits(key, (NREP, K // 2, N), dtype=jnp.uint8)
    scale_all = jnp.full((NREP, K // G, N), 0.01, jnp.bfloat16)
    x2 = jnp.ones((16, K), jnp.bfloat16)
    wbytes = (K // 2) * N + (K // G) * N * 2

    for mode, fuse in cases:
        tag = f"{mode}/x{fuse}"
        try:
            times = {}
            for reps in (R1, R2):
                t0 = time.time()
                np.asarray(run(x2, packed_all, scale_all, mode=mode, reps=reps, fuse=fuse))
                comp = time.time() - t0
                best = float("inf")
                for _ in range(3):
                    t0 = time.time()
                    np.asarray(run(x2, packed_all, scale_all, mode=mode, reps=reps, fuse=fuse))
                    best = min(best, time.time() - t0)
                times[reps] = best
                log(f"  {tag} reps={reps}: total {best*1e3:.1f} ms (compile {comp:.0f}s)")
            per = (times[R2] - times[R1]) / (R2 - R1) * fuse
            eff = wbytes * fuse / per / 1e9
            log(f"{tag:16s}: {per*1e6:8.1f} us/step  {eff:7.0f} GB/s")
        except Exception as e:
            log(f"{tag:16s}: FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
