#!/usr/bin/env python
"""MoE slot-FFN kernel decomposition: where do ~20 us/slot go?

bench_moe shows 691 tok/s vs a 2861 roofline; the gap is ~the 512 per-step
slot grid steps (64 slots x 8 layers), so each slot costs ~20 us where the
expert-payload DMA floor is 3.8 us (2.95 MB @ 775 GB/s). Candidates: the
E2M1 branchless decode (~4.7M values/slot), the M=1 MXU dots (latency-
bound), the one-hot row select/scatter dots, DMA serialization.

Variants time ONE layer's 64-slot pallas call (differential over scan
reps, 2 HBM expert-stack replicas, Qwen3-30B-A3B geometry D=2048 Fe=768
E=128 top8 B=8):

  full    — the shipped kernel behavior (copy of _moe_slot_ffn_kernel)
  nodec   — dequant replaced by raw-u8 cast+scale-broadcast (no E2M1
            chain; measures decode cost by difference)
  nodots  — full dequant, FFN dots replaced by row-sum reductions
  dmaonly — payload DMA + token select + trivial consume (floor)
  w4dec   — dequant via int4-style signed arithmetic (measures what a
            hardware-friendly 4-bit decode would save vs E2M1)
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

D, Fe, E, S = 2048, 768, 128, 64   # hidden, expert-ffn, experts, slots
G = 16                             # nvfp4 group
NREP = 2
R1, R2 = 16, 128                   # layer-call counts for differential


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _fp4_values(codes):
    m = (codes & 1).astype(jnp.float32)
    e = (codes >> 1) & 0x3
    mag = jnp.where(
        e == 0, 0.5 * m,
        jnp.where(e == 1, 1.0 + 0.5 * m,
                  jnp.where(e == 2, 2.0 + m, 4.0 + 2.0 * m)))
    return jnp.where((codes >> 3) & 1 == 1, -mag, mag)


def _dequant(codes_src, scale_ref, *, mode, k):
    if mode == "f4":
        # native float4_e2m1fn payload: ONE cvt instead of the ~14-op
        # branchless E2M1 arithmetic chain
        vals = codes_src[:].astype(jnp.bfloat16)
        n = vals.shape[-1]
        s = scale_ref[:]  # bf16
        w = (vals.reshape(k // G, G, n) * s[:, None, :]).reshape(k, n)
        return w
    packed = codes_src[:].astype(jnp.int32)
    if mode == "nodec":
        vals = jnp.concatenate([packed, packed], axis=0).astype(jnp.float32)
    elif mode == "w4dec":
        lo = (packed << 28) >> 28
        hi = (packed << 24) >> 28
        vals = jnp.concatenate([lo, hi], axis=0).astype(jnp.float32)
    else:
        vals = _fp4_values(jnp.concatenate([packed & 0x0F, packed >> 4], axis=0))
    n = vals.shape[-1]
    s = scale_ref[:].astype(jnp.float32)
    w = (vals.reshape(k // G, G, n) * s[:, None, :]).reshape(k, n)
    return w.astype(jnp.bfloat16)


def kernel2(idx_ref, x_ref, gw_ref, gs_ref, uw_ref, us_ref, dw_ref, ds_ref,
            o_ref, gbuf, gsb, ubuf, usb, dbuf, dsb, acc, sems, *, mode):
    """pair2: TWO slots per grid step, single-buffered (no prefetch) —
    measures whether independent per-slot dot chains ILP-overlap on the
    MXU (the hypothesis for the 15.6 us/slot sequencing gap)."""
    g_i = pl.program_id(0)
    banks = ((gw_ref, gbuf, 0), (gs_ref, gsb, 1), (uw_ref, ubuf, 2),
             (us_ref, usb, 3), (dw_ref, dbuf, 4), (ds_ref, dsb, 5))

    @pl.when(g_i == 0)
    def _first():
        acc[:] = jnp.zeros_like(acc)

    cps = []
    for sl in (0, 1):
        e = idx_ref[g_i * 2 + sl]
        cps += [pltpu.make_async_copy(src.at[e], dst.at[sl],
                                      sems.at[sl * 6 + j])
                for src, dst, j in banks]
    for cp in cps:
        cp.start()

    ys = []
    xs = []
    for sl in (0, 1):
        sel = (jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
               == g_i * 2 + sl).astype(jnp.bfloat16)
        xs.append(jnp.dot(sel, x_ref[:], preferred_element_type=jnp.float32
                          ).astype(jnp.bfloat16))
    for cp in cps:
        cp.wait()
    for sl in (0, 1):
        gate_w = _dequant(gbuf.at[sl], gsb.at[sl], mode="full", k=D)
        up_w = _dequant(ubuf.at[sl], usb.at[sl], mode="full", k=D)
        gv = jnp.dot(xs[sl], gate_w, preferred_element_type=jnp.float32)
        uv = jnp.dot(xs[sl], up_w, preferred_element_type=jnp.float32)
        a = (jax.nn.silu(gv) * uv).astype(jnp.bfloat16)
        down_w = _dequant(dbuf.at[sl], dsb.at[sl], mode="full", k=Fe)
        ys.append(jnp.dot(a, down_w, preferred_element_type=jnp.float32))
    for sl in (0, 1):
        sel = (jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
               == g_i * 2 + sl).astype(jnp.bfloat16)
        acc[:] += jnp.dot(sel.T, ys[sl].astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    @pl.when(g_i == S // 2 - 1)
    def _write():
        o_ref[:] = acc[:]


def kernel(idx_ref, x_ref, gw_ref, gs_ref, uw_ref, us_ref, dw_ref, ds_ref,
           o_ref, gbuf, gsb, ubuf, usb, dbuf, dsb, acc, sems, *, mode):
    s_i = pl.program_id(0)
    banks = ((gw_ref, gbuf, 0), (gs_ref, gsb, 1), (uw_ref, ubuf, 2),
             (us_ref, usb, 3), (dw_ref, dbuf, 4), (ds_ref, dsb, 5))

    def copies(step, bank):
        e = idx_ref[step]
        return [pltpu.make_async_copy(src.at[e], dst.at[bank],
                                      sems.at[bank * 6 + j])
                for src, dst, j in banks]

    bank = jax.lax.rem(s_i, 2)

    @pl.when(s_i == 0)
    def _first():
        acc[:] = jnp.zeros_like(acc)
        for cp in copies(0, 0):
            cp.start()

    @pl.when(s_i + 1 < S)
    def _prefetch_next():
        for cp in copies(s_i + 1, jax.lax.rem(s_i + 1, 2)):
            cp.start()

    sel = (jax.lax.broadcasted_iota(jnp.int32, (1, S), 1) == s_i).astype(jnp.bfloat16)
    x_s = jnp.dot(sel, x_ref[:], preferred_element_type=jnp.float32
                  ).astype(jnp.bfloat16)

    for cp in copies(s_i, bank):
        cp.wait()

    if mode == "dmaonly":
        y = (x_s[:, :1] * 0.0
             + gbuf[bank, :1, :1].astype(jnp.float32)
             + ubuf[bank, :1, :1].astype(jnp.float32)
             + dbuf[bank, :1, :1].astype(jnp.float32)
             + gsb[bank, :1, :1].astype(jnp.float32)
             + usb[bank, :1, :1].astype(jnp.float32)
             + dsb[bank, :1, :1].astype(jnp.float32))
        y = jnp.broadcast_to(y, (1, D)).astype(jnp.bfloat16)
        acc[:] += jnp.dot(sel.T, y, preferred_element_type=jnp.float32)
    elif mode == "nodots":
        gate_w = _dequant(gbuf.at[bank], gsb.at[bank], mode=mode, k=D)
        up_w = _dequant(ubuf.at[bank], usb.at[bank], mode=mode, k=D)
        down_w = _dequant(dbuf.at[bank], dsb.at[bank], mode=mode, k=Fe)
        y = (gate_w[:1, :1] + up_w[:1, :1] + down_w[:1, :1]
             ).astype(jnp.float32) + x_s[:, :1] * 0.0
        y = jnp.broadcast_to(y, (1, D)).astype(jnp.bfloat16)
        acc[:] += jnp.dot(sel.T, y, preferred_element_type=jnp.float32)
    else:
        gate_w = _dequant(gbuf.at[bank], gsb.at[bank], mode=mode, k=D)
        up_w = _dequant(ubuf.at[bank], usb.at[bank], mode=mode, k=D)
        gv = jnp.dot(x_s, gate_w, preferred_element_type=jnp.float32)
        uv = jnp.dot(x_s, up_w, preferred_element_type=jnp.float32)
        a = (jax.nn.silu(gv) * uv).astype(jnp.bfloat16)
        down_w = _dequant(dbuf.at[bank], dsb.at[bank], mode=mode, k=Fe)
        y = jnp.dot(a, down_w, preferred_element_type=jnp.float32)
        acc[:] += jnp.dot(sel.T, y.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    @pl.when(s_i == S - 1)
    def _write():
        o_ref[:] = acc[:]


def make_call(mode, shapes):
    def call(x, idx, gw, gs, uw, us, dw, ds):
        pair = mode == "pair2"
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(S // 2 if pair else S,),
            in_specs=[pl.BlockSpec((S, D), lambda s, *_: (0, 0),
                                   memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(memory_space=pltpu.ANY)] * 6,
            out_specs=pl.BlockSpec((S, D), lambda s, *_: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2,) + gw.shape[1:], gw.dtype),
                pltpu.VMEM((2,) + gs.shape[1:], gs.dtype),
                pltpu.VMEM((2,) + uw.shape[1:], uw.dtype),
                pltpu.VMEM((2,) + us.shape[1:], us.dtype),
                pltpu.VMEM((2,) + dw.shape[1:], dw.dtype),
                pltpu.VMEM((2,) + ds.shape[1:], ds.dtype),
                pltpu.VMEM((S, D), jnp.float32),
                pltpu.SemaphoreType.DMA((12,)),
            ],
        )
        return pl.pallas_call(
            functools.partial(kernel2 if pair else kernel, mode=mode),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((S, D), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(idx, x, gw, gs, uw, us, dw, ds)

    return call


@functools.partial(jax.jit, static_argnames=("mode", "reps"))
def run(x, idxs, stacks, *, mode, reps):
    call = make_call(mode, None)

    if mode == "f4":
        def conv(st):
            gw, gs, uw, us, dw, ds = st
            def to_f4(p):
                wide = p.astype(jnp.int32)
                codes = jnp.concatenate([wide & 0x0F, wide >> 4], axis=1)
                return _fp4_values(codes).astype(jnp.float4_e2m1fn)
            return (to_f4(gw), gs, to_f4(uw), us, to_f4(dw), ds)
        stacks = [conv(st) for st in stacks]

    def step(carry, i):
        x, acc = carry
        for r, (gw, gs, uw, us, dw, ds) in enumerate(stacks):
            idx = idxs[(i + r) % idxs.shape[0]]
            y = call(x, idx, gw, gs, uw, us, dw, ds)
            acc = acc + y[0, 0]
            x = x + y[:, :1].astype(x.dtype) * 1e-9
        return (x, acc), ()

    (xf, acc), _ = jax.lax.scan(step, (x, jnp.zeros((), jnp.float32)),
                                jnp.arange(reps // NREP))
    return acc


def main():
    modes = sys.argv[1:] or ["dmaonly", "nodots", "nodec", "w4dec", "full"]
    log(f"backend={jax.default_backend()} S={S} E={E} R=({R1},{R2})")
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    stacks = []
    for r in range(NREP):
        gw = jax.random.bits(ks[r * 3], (E, D // 2, Fe), dtype=jnp.uint8)
        gs = jnp.full((E, D // G, Fe), 0.01, jnp.bfloat16)
        uw = jax.random.bits(ks[r * 3 + 1], (E, D // 2, Fe), dtype=jnp.uint8)
        us = jnp.full((E, D // G, Fe), 0.01, jnp.bfloat16)
        dw = jax.random.bits(ks[r * 3 + 2], (E, Fe // 2, D), dtype=jnp.uint8)
        ds = jnp.full((E, Fe // G, D), 0.01, jnp.bfloat16)
        stacks.append((gw, gs, uw, us, dw, ds))
    idxs = jax.random.randint(ks[7], (16, S), 0, E, dtype=jnp.int32)
    x = jnp.ones((S, D), jnp.bfloat16)

    payload = 3 * (D * Fe // 2) + 3 * (D // G) * Fe * 2  # ~per-slot bytes
    for mode in modes:
        try:
            times = {}
            for reps in (R1, R2):
                t0 = time.time()
                np.asarray(run(x, idxs, stacks, mode=mode, reps=reps))
                comp = time.time() - t0
                best = float("inf")
                for _ in range(3):
                    t0 = time.time()
                    np.asarray(run(x, idxs, stacks, mode=mode, reps=reps))
                    best = min(best, time.time() - t0)
                times[reps] = best
                log(f"  {mode} reps={reps}: total {best*1e3:.1f} ms (compile {comp:.0f}s)")
            per_call = (times[R2] - times[R1]) / (R2 - R1)
            per_slot = per_call / S
            eff = payload / per_slot / 1e9
            log(f"{mode:8s}: {per_call*1e3:7.2f} ms/layer  {per_slot*1e6:6.2f} us/slot  {eff:5.0f} GB/s")
        except Exception as e:
            log(f"{mode:8s}: FAILED {type(e).__name__}: {str(e)[:250]}")


if __name__ == "__main__":
    main()
