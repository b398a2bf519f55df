#!/usr/bin/env python
"""w4-int4 tile-size sweep on the PRODUCTION kernel (_w4i_matmul_2d).

The i4 kernel runs at the 630 GB/s DMA floor with (512, 9728) tiles
(5 grid steps at gate shape); fewer, larger tiles amortize per-step
pipeline overhead — if (1280, 9728) fits scoped VMEM, the floor itself
should rise.

Usage: python benchmarks/kernel_lab8.py [bk ...]   (default 512 1280)
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from quantizers_tpu.ops.kernels import _w4i_matmul_2d  # noqa: E402
from quantizers_tpu.ops.linear import w4_packed_to_int4  # noqa: E402

K, N, G, NREP = 2560, 9728, 32, 8
R1, R2 = 512, 4096


def log(*a):
    print(*a, file=sys.stderr, flush=True)


@functools.partial(jax.jit, static_argnames=("bk", "reps"))
def run(x, ws_u8, ss, *, bk, reps):
    ws = [w4_packed_to_int4(w) for w in ws_u8]

    def step(carry, _):
        x, acc = carry
        for w, s in zip(ws, ss):
            y = _w4i_matmul_2d(x, w, s, g=G, bm=16, bn=N, bk=bk,
                               interpret=False)
            acc = acc + y[0, 0].astype(jnp.float32)
            x = x + y[:, :1].astype(x.dtype) * 1e-9
        return (x, acc), ()

    (_, acc), _ = jax.lax.scan(step, (x, jnp.zeros((), jnp.float32)),
                               None, length=reps // NREP)
    return acc


def main():
    bks = [int(a) for a in sys.argv[1:]] or [512, 1280]
    log(f"backend={jax.default_backend()}")
    keys = jax.random.split(jax.random.PRNGKey(0), NREP)
    ws = [jax.random.bits(k, (K // 2, N), dtype=jnp.uint8) for k in keys]
    ss = [jnp.full((K // G, N), 0.008, jnp.bfloat16) for _ in range(NREP)]
    x = jnp.ones((16, K), jnp.bfloat16)
    wbytes = (K // 2) * N + (K // G) * N * 2

    for bk in bks:
        try:
            times = {}
            for reps in (R1, R2):
                t0 = time.time()
                np.asarray(run(x, ws, ss, bk=bk, reps=reps))
                comp = time.time() - t0
                best = float("inf")
                for _ in range(3):
                    t0 = time.time()
                    np.asarray(run(x, ws, ss, bk=bk, reps=reps))
                    best = min(best, time.time() - t0)
                times[reps] = best
                log(f"  bk={bk} reps={reps}: {best*1e3:.1f} ms (compile {comp:.0f}s)")
            per = (times[R2] - times[R1]) / (R2 - R1)
            log(f"bk={bk:5d}: {per*1e6:7.2f} us/call  {wbytes/per/1e9:5.0f} GB/s")
        except Exception as e:
            log(f"bk={bk:5d}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
