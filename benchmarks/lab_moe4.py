#!/usr/bin/env python
"""MoE slot-kernel round-4 variants: per-channel expert scales.

Round 3 left the expert stream at ~585 GB/s in-scan / 630 standalone vs
819 spec (VERDICT weak #1). Per-step VPU accounting says why: the int8
g16 layout spends ~2 VPU ops/weight on dequant (int8->bf16 cvt + the
(k//g, g, n) group-scale multiply) — ~9.4M VPU ops per 4.7M-weight slot,
which exceeds the ~6 us DMA time of the payload and makes the kernel
compute-bound. A **per-channel** (per-n) scale layout removes the
multiply entirely: y_n = (x @ W_int8)_n * s_n folds the scale into the
(1, n) matmul output, leaving one hardware cvt per weight. It also
shrinks scales from (k/16, n) bf16 (0.2 MB/matrix) to (n,) — small
enough to keep ALL experts' scales VMEM-resident, so payloads become the
only per-slot stream. Quality: int8-per-channel is a requant of the
already-quantized NVFP4 values on a 4-16x finer grid (col_max/127 vs
group_max/6 steps) — measured in benchmarks/ppl_protocol.py.

Variants (Qwen3-30B-A3B per-layer geometry, expert-sorted slots,
differential timing per memory:axon-tpu-quirks):

  base  — shipped kernel, int8 g16 scales (round-3 layout; ~630 GB/s)
  pc    — per-channel scales, 3 payload streams, scales resident
  pcgu  — pc + gate|up fused on the n axis: one (E, D, 2Fe) payload
          and one (1,D)@(D,2Fe) MXU call per slot
  pcone — single coalesced (E, 2Fe+Fe, D) payload: gate^T|up^T|down
          stacked on rows; gate/up run contraction-on-last-dim (NT)
  a8    — pcgu with the x row dynamically quantized to int8 and
          int8 x int8 MXU dots: ZERO weight-dequant VPU work (the DMA
          floor probe for this stream structure; also the W8A8-experts
          serving option)

Usage: python benchmarks/lab_moe4.py [base pc pcgu pcone a8 ...]
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D, Fe, E, S = 2048, 768, 128, 64
G = 16
NREP = 2
R1, R2 = 16, 96


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# --- pc: per-channel scales, 3 payload streams, scales VMEM-resident ------

def pc_kernel(idx_ref, x_ref, gw_ref, uw_ref, dw_ref,
              gs_ref, us_ref, ds_ref, o_ref):
    x_s = x_ref[0]  # (1, D) bf16
    gv = jnp.dot(x_s, gw_ref[0].astype(jnp.bfloat16),
                 preferred_element_type=jnp.float32)
    gv = gv * gs_ref[0].astype(jnp.float32)
    uv = jnp.dot(x_s, uw_ref[0].astype(jnp.bfloat16),
                 preferred_element_type=jnp.float32)
    uv = uv * us_ref[0].astype(jnp.float32)
    a = (jax.nn.silu(gv) * uv).astype(jnp.bfloat16)
    y = jnp.dot(a, dw_ref[0].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    o_ref[0] = y * ds_ref[0].astype(jnp.float32)


def make_pc():
    def call(x, idx, gw, uw, dw, gs, us, ds):
        x3 = x.reshape(S, 1, D)

        def pay(arr):
            return pl.BlockSpec((1,) + arr.shape[1:],
                                lambda s, idx_ref: (idx_ref[s], 0, 0),
                                memory_space=pltpu.VMEM)

        def sblock(arr):
            return pl.BlockSpec((1, 1, arr.shape[-1]),
                                lambda s, idx_ref: (idx_ref[s], 0, 0),
                                memory_space=pltpu.VMEM)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(S,),
            in_specs=[pl.BlockSpec((1, 1, D), lambda s, *_: (s, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pay(gw), pay(uw), pay(dw),
                      sblock(gs), sblock(us), sblock(ds)],
            out_specs=pl.BlockSpec((1, 1, D), lambda s, *_: (s, 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        out = pl.pallas_call(
            pc_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((S, 1, D), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(idx, x3, gw, uw, dw, gs, us, ds)
        return out.reshape(S, D)

    return call


# --- pcgu: gate|up fused on n; one (D, 2Fe) payload + down ----------------

def pcgu_kernel(idx_ref, x_ref, guw_ref, dw_ref, gus_ref, ds_ref, o_ref,
                *, a8: bool):
    x_s = x_ref[0]  # (1, D) bf16
    if a8:
        amax = jnp.max(jnp.abs(x_s.astype(jnp.float32))) + 1e-12
        x8 = jnp.round(x_s.astype(jnp.float32) * (127.0 / amax)
                       ).astype(jnp.int8)
        acc = jnp.dot(x8, guw_ref[0], preferred_element_type=jnp.int32)
        guv = acc.astype(jnp.float32) * (amax / 127.0)
    else:
        guv = jnp.dot(x_s, guw_ref[0].astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
    guv = guv * gus_ref[0].astype(jnp.float32)
    gv, uv = guv[:, :Fe], guv[:, Fe:]
    a = jax.nn.silu(gv) * uv  # (1, Fe) f32
    if a8:
        am = jnp.max(jnp.abs(a)) + 1e-12
        a8v = jnp.round(a * (127.0 / am)).astype(jnp.int8)
        yi = jnp.dot(a8v, dw_ref[0], preferred_element_type=jnp.int32)
        y = yi.astype(jnp.float32) * (am / 127.0)
    else:
        y = jnp.dot(a.astype(jnp.bfloat16), dw_ref[0].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
    o_ref[0] = y * ds_ref[0].astype(jnp.float32)


def make_pcgu(a8: bool):
    def call(x, idx, guw, dw, gus, ds):
        x3 = x.reshape(S, 1, D)

        def pay(arr):
            return pl.BlockSpec((1,) + arr.shape[1:],
                                lambda s, idx_ref: (idx_ref[s], 0, 0),
                                memory_space=pltpu.VMEM)

        def sblock(arr):
            return pl.BlockSpec((1, 1, arr.shape[-1]),
                                lambda s, idx_ref: (idx_ref[s], 0, 0),
                                memory_space=pltpu.VMEM)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(S,),
            in_specs=[pl.BlockSpec((1, 1, D), lambda s, *_: (s, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pay(guw), pay(dw), sblock(gus), sblock(ds)],
            out_specs=pl.BlockSpec((1, 1, D), lambda s, *_: (s, 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        out = pl.pallas_call(
            functools.partial(pcgu_kernel, a8=a8),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((S, 1, D), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(idx, x3, guw, dw, gus, ds)
        return out.reshape(S, D)

    return call


# --- pcone: single (3Fe, D) payload, gate^T|up^T|down stacked on rows -----

def pcone_kernel(idx_ref, x_ref, w_ref, gus_ref, ds_ref, o_ref):
    x_s = x_ref[0]  # (1, D)
    guT = w_ref[0, :2 * Fe].astype(jnp.bfloat16)   # (2Fe, D)
    guv = jax.lax.dot_general(
        x_s, guT, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)        # (1, 2Fe)
    guv = guv * gus_ref[0].astype(jnp.float32)
    gv, uv = guv[:, :Fe], guv[:, Fe:]
    a = (jax.nn.silu(gv) * uv).astype(jnp.bfloat16)
    down = w_ref[0, 2 * Fe:].astype(jnp.bfloat16)  # (Fe, D)
    y = jnp.dot(a, down, preferred_element_type=jnp.float32)
    o_ref[0] = y * ds_ref[0].astype(jnp.float32)


def make_pcone():
    def call(x, idx, w, gus, ds):
        x3 = x.reshape(S, 1, D)

        def pay(arr):
            return pl.BlockSpec((1,) + arr.shape[1:],
                                lambda s, idx_ref: (idx_ref[s], 0, 0),
                                memory_space=pltpu.VMEM)

        def sblock(arr):
            return pl.BlockSpec((1, 1, arr.shape[-1]),
                                lambda s, idx_ref: (idx_ref[s], 0, 0),
                                memory_space=pltpu.VMEM)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(S,),
            in_specs=[pl.BlockSpec((1, 1, D), lambda s, *_: (s, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pay(w), sblock(gus), sblock(ds)],
            out_specs=pl.BlockSpec((1, 1, D), lambda s, *_: (s, 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        out = pl.pallas_call(
            pcone_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((S, 1, D), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(idx, x3, w, gus, ds)
        return out.reshape(S, D)

    return call


def make_base():
    from quantizers_tpu.ops.kernels import _moe_slot_ffn_call

    def call(x, idx, gw, gs, uw, us, dw, ds):
        order = jnp.arange(S, dtype=jnp.int32)
        return _moe_slot_ffn_call(x, idx, order, gw, gs, uw, us, dw, ds,
                                  kind="nvfp4", g=G, nf=1, interpret=False)

    return call


# --- pcgu2: two slots per grid step (halved per-step overhead) -------------

def pcgu2_kernel(idx_ref, x_ref, guw0, dw0, guw1, dw1,
                 gus0, gus1, ds0, ds1, o_ref):
    x2 = x_ref[0]  # (2, D) bf16 — two slot rows
    for j, (guw, dw, gus, dsr) in enumerate(
            ((guw0, dw0, gus0, ds0), (guw1, dw1, gus1, ds1))):
        x_s = x2[j:j + 1]
        guv = jnp.dot(x_s, guw[0].astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        guv = guv * gus[0].astype(jnp.float32)
        gv, uv = guv[:, :Fe], guv[:, Fe:]
        a = (jax.nn.silu(gv) * uv).astype(jnp.bfloat16)
        y = jnp.dot(a, dw[0].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        o_ref[0, j] = (y * dsr[0].astype(jnp.float32))[0]


def make_pcgu2():
    def call(x, idx, guw, dw, gus, ds):
        x3 = x.reshape(S // 2, 2, D)

        def pay(arr, j):
            return pl.BlockSpec((1,) + arr.shape[1:],
                                lambda s, idx_ref, j=j: (idx_ref[2 * s + j], 0, 0),
                                memory_space=pltpu.VMEM)

        def sblock2(arr, j):
            return pl.BlockSpec((1, 1, arr.shape[-1]),
                                lambda s, idx_ref, j=j: (idx_ref[2 * s + j], 0, 0),
                                memory_space=pltpu.VMEM)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(S // 2,),
            in_specs=[pl.BlockSpec((1, 2, D), lambda s, *_: (s, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pay(guw, 0), pay(dw, 0), pay(guw, 1), pay(dw, 1),
                      sblock2(gus, 0), sblock2(gus, 1),
                      sblock2(ds, 0), sblock2(ds, 1)],
            out_specs=pl.BlockSpec((1, 2, D), lambda s, *_: (s, 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        out = pl.pallas_call(
            pcgu2_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((S // 2, 2, D), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(idx, x3, guw, dw, guw, dw, gus, gus, ds, ds)
        return out.reshape(S, D)

    return call



MAKERS = {
    "base": make_base,
    "pc": make_pc,
    "pcgu": lambda: make_pcgu(a8=False),
    "a8": lambda: make_pcgu(a8=True),
    "pcone": make_pcone,
    "pcgu2": make_pcgu2,
}


@functools.partial(jax.jit, static_argnames=("mode", "reps"))
def run(x, idxs, stacks, *, mode, reps):
    call = MAKERS[mode]()

    def step(carry, i):
        x, acc = carry
        for r, st in enumerate(stacks):
            idx = idxs[(i * NREP + r) % idxs.shape[0]]
            y = call(x, idx, *st)
            acc = acc + y[0, 0]
            x = x + y[:, :1].astype(x.dtype) * 1e-9
        return (x, acc), ()

    (xf, acc), _ = jax.lax.scan(step, (x, jnp.zeros((), jnp.float32)),
                                jnp.arange(reps // NREP))
    return acc


def main():
    modes = sys.argv[1:] or ["base", "pc", "pcgu", "pcone", "a8"]
    log(f"backend={jax.default_backend()} S={S} E={E} R=({R1},{R2})")
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)

    # g16 stacks for base (shipped layout) + derived per-channel stacks.
    # Per-channel weights are kept IDENTICAL int8 codes with s_pc = 0.005
    # so pc outputs match base outputs exactly (constant group scales) —
    # the real layout requantizes; quality is ppl_protocol's job.
    g16_stacks, pc_stacks, gu_stacks, one_stacks = [], [], [], []
    for r in range(NREP):
        gw = jax.random.randint(ks[r * 3], (E, D, Fe), -8, 8, jnp.int8)
        uw = jax.random.randint(ks[r * 3 + 1], (E, D, Fe), -8, 8, jnp.int8)
        dw = jax.random.randint(ks[r * 3 + 2], (E, Fe, D), -8, 8, jnp.int8)
        gs16 = jnp.full((E, D // G, Fe), 0.005, jnp.bfloat16)
        us16 = jnp.full((E, D // G, Fe), 0.005, jnp.bfloat16)
        ds16 = jnp.full((E, Fe // G, D), 0.005, jnp.bfloat16)
        g16_stacks.append((gw, gs16, uw, us16, dw, ds16))
        gs = jnp.full((E, 1, Fe), 0.005, jnp.bfloat16)
        us = jnp.full((E, 1, Fe), 0.005, jnp.bfloat16)
        ds = jnp.full((E, 1, D), 0.005, jnp.bfloat16)
        gus = jnp.concatenate([gs, us], axis=2)
        pc_stacks.append((gw, uw, dw, gs, us, ds))
        gu_stacks.append((jnp.concatenate([gw, uw], axis=2), dw, gus, ds))
        one_stacks.append((
            jnp.concatenate([jnp.swapaxes(gw, 1, 2), jnp.swapaxes(uw, 1, 2),
                             dw], axis=1), gus, ds))
    raw = jax.random.randint(ks[7], (16, S), 0, E, dtype=jnp.int32)
    idxs = jnp.sort(raw, axis=1)
    x = jnp.ones((S, D), jnp.bfloat16)

    idxs_np = np.asarray(idxs)
    ndist = np.array([len(np.unique(row)) for row in idxs_np])
    per_expert_g16 = 3 * D * Fe + 3 * (D // G) * Fe * 2
    per_expert_pc = 3 * D * Fe  # scales resident

    if jax.default_backend() not in ("tpu", "axon"):
        log("needs the TPU chip")
        return

    stacks_by_mode = {"base": g16_stacks, "pc": pc_stacks, "pcgu": gu_stacks,
                      "a8": gu_stacks, "pcone": one_stacks,
                      "pcgu2": gu_stacks}
    bytes_by_mode = {"base": per_expert_g16}

    ref = np.asarray(make_base()(x, idxs[0], *g16_stacks[0]))
    for mode in [m for m in modes if m not in ("base", "a8")]:
        y = np.asarray(MAKERS[mode]()(x, idxs[0], *stacks_by_mode[mode][0]))
        err = np.max(np.abs(y - ref)) / (np.max(np.abs(ref)) + 1e-9)
        log(f"[{mode}] max rel err vs base: {err:.2e}")
        assert err < 2e-2, f"{mode} diverges from the shipped kernel"
    if "a8" in modes:
        y = np.asarray(MAKERS["a8"]()(x, idxs[0], *gu_stacks[0]))
        err = np.max(np.abs(y - ref)) / (np.max(np.abs(ref)) + 1e-9)
        log(f"[a8] max rel err vs base: {err:.2e} (int8 activations)")

    results = {}
    for mode in modes:
        mode_stacks = stacks_by_mode[mode]
        per_expert = bytes_by_mode.get(mode, per_expert_pc)
        try:
            times = {}
            for reps in (R1, R2):
                t0 = time.time()
                np.asarray(run(x, idxs, mode_stacks, mode=mode, reps=reps))
                t_tot = time.time() - t0
                t0 = time.time()
                np.asarray(run(x, idxs, mode_stacks, mode=mode, reps=reps))
                times[reps] = time.time() - t0
                log(f"  [{mode}] reps={reps}: {times[reps]*1e3:.1f} ms "
                    f"(first incl compile {t_tot:.1f}s)")
            dt = times[R2] - times[R1]
            calls = R2 - R1
            bytes_per_call = float(ndist.mean()) * per_expert
            gbps = calls * bytes_per_call / dt / 1e9
            us_per_call = dt / calls * 1e6
            log(f"[{mode}] {us_per_call:.1f} us/call  {gbps:.0f} GB/s effective")
            results[mode] = {"us_per_call": round(us_per_call, 1),
                             "gbps": round(gbps, 0)}
        except Exception as e:  # noqa: BLE001 - lab harness, report and move on
            log(f"[{mode}] FAILED: {type(e).__name__}: {str(e)[:300]}")
            results[mode] = {"error": str(e)[:200]}
    import json
    print(json.dumps(results))


if __name__ == "__main__":
    main()
