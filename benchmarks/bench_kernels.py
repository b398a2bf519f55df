#!/usr/bin/env python
"""Per-kernel decode-matmul throughput: the PRODUCTION kernels, timed.

Times quantizers_tpu.ops.kernels.* through the real QuantLinear API at
the decode shape (m=8, gate_proj-sized K=2560 N=9728) with the honest
methodology (differential between two scan lengths, 8 distinct
HBM-resident weight replicas — memory: axon-tpu-quirks).

Effective GB/s = (payload + scale bytes) / per-call time. Each kind's
HBM traffic differs (w4/nvfp4 ~0.56 B/weight, w8/fp8 ~1 B/weight), so
tok/s impact = bytes/GBps, not GB/s alone.

Usage: python benchmarks/bench_kernels.py [w4i4 w4u8 w8 fp8 nvfp4]
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from quantizers_tpu.ops.linear import QuantLinear, w4_packed_to_int4  # noqa: E402

K, N, NREP = 2560, 9728, 8
R1, R2 = 512, 4096


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_lin(kind: str, key) -> QuantLinear:
    if kind == "nvfp4i8":
        kind = "nvfp4"
    if kind in ("w4u8", "w4i4"):
        w = jax.random.bits(key, (K // 2, N), dtype=jnp.uint8)
        return QuantLinear(kind="w4", weight=w,
                           scale=jnp.full((K // 32, N), 0.008, jnp.bfloat16),
                           meta=(("k", K), ("n", N), ("group_size", 32)))
    if kind == "w8":
        w = jax.random.randint(key, (K, N), -127, 128, jnp.int8)
        return QuantLinear(kind="w8", weight=w,
                           scale=jnp.full((1, N), 0.008, jnp.bfloat16),
                           meta=(("k", K), ("n", N), ("group_size", None)))
    if kind == "fp8":
        w = (jax.random.normal(key, (K, N), jnp.float32) * 0.1
             ).astype(jnp.float8_e4m3fn)
        return QuantLinear(kind="fp8", weight=w,
                           scale=jnp.full((K // 128, N // 128), 1.0, jnp.float32),
                           meta=(("k", K), ("n", N), ("strategy", "block"),
                                 ("block_k", 128), ("block_n", 128)))
    if kind == "nvfp4":
        w = jax.random.bits(key, (K // 2, N), dtype=jnp.uint8)
        return QuantLinear(kind="nvfp4", weight=w,
                           scale=jnp.full((K // 16, N), 0.02, jnp.bfloat16),
                           meta=(("k", K), ("n", N), ("group_size", 16)))
    raise ValueError(kind)


def lin_bytes(lin: QuantLinear) -> int:
    total = lin.weight.size * lin.weight.dtype.itemsize
    if lin.scale is not None:
        total += lin.scale.size * lin.scale.dtype.itemsize
    return total


@functools.partial(jax.jit, static_argnames=("kind", "reps"))
def run(x, lins, *, kind, reps):
    from quantizers_tpu.ops import kernels as KK

    if kind == "w4i4":
        import dataclasses

        lins = [dataclasses.replace(l, weight=w4_packed_to_int4(l.weight))
                for l in lins]
    elif kind == "nvfp4i8":
        import dataclasses

        from quantizers_tpu.ops.linear import nvfp4_packed_to_i8

        lins = [dataclasses.replace(
            l, weight=nvfp4_packed_to_i8(l.weight),
            scale=(l.scale.astype(jnp.float32) * 0.5).astype(l.scale.dtype))
            for l in lins]
    fn = KK.KERNELS[{"w4u8": "w4", "w4i4": "w4", "nvfp4i8": "nvfp4"}.get(kind, kind)]

    def step(carry, _):
        x, acc = carry
        for lin in lins:
            y = fn(x, lin)
            acc = acc + y[0, 0].astype(jnp.float32)
            x = x + y[:, :1].astype(x.dtype) * 1e-9
        return (x, acc), ()

    (_, acc), _ = jax.lax.scan(step, (x, jnp.zeros((), jnp.float32)),
                               None, length=reps // NREP)
    return acc


def main():
    kinds = sys.argv[1:] or ["w4i4", "w4u8", "w8", "fp8", "nvfp4i8"]
    log(f"backend={jax.default_backend()} K={K} N={N} m=8")
    results = {}
    for kind in kinds:
        try:
            keys = jax.random.split(jax.random.PRNGKey(0), NREP)
            lins = [make_lin(kind, k) for k in keys]
            wbytes = lin_bytes(lins[0])
            x = jnp.ones((8, K), jnp.bfloat16)
            times = {}
            for reps in (R1, R2):
                t0 = time.time()
                np.asarray(run(x, lins, kind=kind, reps=reps))
                comp = time.time() - t0
                best = float("inf")
                for _ in range(3):
                    t0 = time.time()
                    np.asarray(run(x, lins, kind=kind, reps=reps))
                    best = min(best, time.time() - t0)
                times[reps] = best
                log(f"  {kind} reps={reps}: {best*1e3:.1f} ms (compile {comp:.0f}s)")
            per = (times[R2] - times[R1]) / (R2 - R1)
            eff = wbytes / per / 1e9
            results[kind] = (per * 1e6, eff)
            log(f"{kind:6s}: {per*1e6:7.2f} us/call  {eff:5.0f} GB/s eff "
                f"({wbytes/1e6:.1f} MB payload)")
        except Exception as e:
            log(f"{kind:6s}: FAILED {type(e).__name__}: {str(e)[:250]}")
    import json

    print(json.dumps({k: {"us_per_call": round(v[0], 2),
                          "eff_gbps": round(v[1], 1)}
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
