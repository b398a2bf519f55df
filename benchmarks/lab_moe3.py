#!/usr/bin/env python
"""MoE slot-kernel round-3 variants: close the 535 -> 630 GB/s gap.

profile_moe attributed 4.65 ms of the 5.87 ms MoE decode step to the
expert slot kernel, streaming ~535 GB/s of routed int8 payload vs the
~630 GB/s measured pallas DMA floor (kernel_lab6). Hypotheses:

  rowio  — the one-hot token select ((1,S)@(S,D) MXU dot) and output
           scatter ((S,1)@(1,D) outer + full (S,D) f32 VPU accumulate,
           131k adds/step) serialize with the payload consume. Stream
           the token row IN and the slot output OUT via row-indexed
           BlockSpecs ((S,1,D) views) instead.
  gufuse — six DMA streams per step (3 payloads + 3 scales) pay
           per-transfer setup 6x. Stack gate|up on the k axis into one
           (E, 2D, Fe) payload + one (E, 2D/g, Fe) scale: 4 streams,
           same bytes, 2x larger transfers.
  nodeq  — rowio with dequant replaced by a trivial cast: the DMA +
           matmul floor for this stream structure (upper bound).

All variants run the int8-doubled nvfp4 serving layout at Qwen3-30B-A3B
per-layer geometry (D=2048, Fe=768, E=128, S=64 slots = B8*top8),
expert-sorted slots, differential-timed (R2-R1 calls) with rotating
routing sets so VMEM can't cache payloads. Reports effective GB/s over
the *distinct* routed expert bytes (fetch-skip aware), comparable to the
535 baseline.

Usage: python benchmarks/lab_moe3.py [base rowio gufuse nodeq ...]
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


def _dequant(codes, scale, *, g, k):
    """int8-doubled payload block -> bf16 (k, n); mirrors the shipped
    _dequant_tile int8 path (quantizers_tpu/ops/kernels.py)."""
    vals = codes.astype(jnp.int32).astype(jnp.bfloat16)
    n = vals.shape[-1]
    s = scale.astype(jnp.bfloat16)
    return (vals.reshape(k // g, g, n) * s[:, None, :]).reshape(k, n)


# --- rowio / nodeq: separate gate/up/down, row-streamed x and out ---------

def rowio_kernel(idx_ref, x_ref, gw_ref, gs_ref, uw_ref, us_ref,
                 dw_ref, ds_ref, o_ref, *, dequant: bool):
    x_s = x_ref[0]  # (1, D) bf16
    if dequant:
        gate_w = _dequant(gw_ref[0], gs_ref[0], g=G, k=D)
        up_w = _dequant(uw_ref[0], us_ref[0], g=G, k=D)
        down_w = _dequant(dw_ref[0], ds_ref[0], g=G, k=Fe)
    else:
        gate_w = gw_ref[0].astype(jnp.bfloat16)
        up_w = uw_ref[0].astype(jnp.bfloat16)
        down_w = dw_ref[0].astype(jnp.bfloat16)
    gv = jnp.dot(x_s, gate_w, preferred_element_type=jnp.float32)
    uv = jnp.dot(x_s, up_w, preferred_element_type=jnp.float32)
    a = (jax.nn.silu(gv) * uv).astype(jnp.bfloat16)
    o_ref[0] = jnp.dot(a, down_w, preferred_element_type=jnp.float32)


def make_rowio(dequant: bool):
    def call(x, idx, gw, gs, uw, us, dw, ds):
        x3 = x.reshape(S, 1, D)

        def pay(arr):
            return pl.BlockSpec((1,) + arr.shape[1:],
                                lambda s, idx_ref: (idx_ref[s], 0, 0),
                                memory_space=pltpu.VMEM)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(S,),
            in_specs=[pl.BlockSpec((1, 1, D), lambda s, *_: (s, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pay(gw), pay(gs), pay(uw), pay(us), pay(dw), pay(ds)],
            out_specs=pl.BlockSpec((1, 1, D), lambda s, *_: (s, 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        out = pl.pallas_call(
            functools.partial(rowio_kernel, dequant=dequant),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((S, 1, D), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(idx, x3, gw, gs, uw, us, dw, ds)
        return out.reshape(S, D)

    return call


# --- gufuse: gate|up stacked on k into one payload + one scale stream -----

def gufuse_kernel(idx_ref, x_ref, guw_ref, gus_ref, dw_ref, ds_ref, o_ref):
    x_s = x_ref[0]  # (1, D)
    gate_w = _dequant(guw_ref[0, :D], gus_ref[0, :D // G], g=G, k=D)
    gv = jnp.dot(x_s, gate_w, preferred_element_type=jnp.float32)
    up_w = _dequant(guw_ref[0, D:], gus_ref[0, D // G:], g=G, k=D)
    uv = jnp.dot(x_s, up_w, preferred_element_type=jnp.float32)
    a = (jax.nn.silu(gv) * uv).astype(jnp.bfloat16)
    down_w = _dequant(dw_ref[0], ds_ref[0], g=G, k=Fe)
    o_ref[0] = jnp.dot(a, down_w, preferred_element_type=jnp.float32)


def make_gufuse():
    def call(x, idx, guw, gus, dw, ds):
        x3 = x.reshape(S, 1, D)

        def pay(arr):
            return pl.BlockSpec((1,) + arr.shape[1:],
                                lambda s, idx_ref: (idx_ref[s], 0, 0),
                                memory_space=pltpu.VMEM)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(S,),
            in_specs=[pl.BlockSpec((1, 1, D), lambda s, *_: (s, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pay(guw), pay(gus), pay(dw), pay(ds)],
            out_specs=pl.BlockSpec((1, 1, D), lambda s, *_: (s, 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        out = pl.pallas_call(
            gufuse_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((S, 1, D), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(idx, x3, guw, gus, dw, ds)
        return out.reshape(S, D)

    return call


def make_base():
    from quantizers_tpu.ops.kernels import _moe_slot_ffn_call

    def call(x, idx, gw, gs, uw, us, dw, ds):
        # idx is pre-sorted in this lab, so order is the identity
        order = jnp.arange(S, dtype=jnp.int32)
        return _moe_slot_ffn_call(x, idx, order, gw, gs, uw, us, dw, ds,
                                  kind="nvfp4", g=G, nf=1, interpret=False)

    return call


@functools.partial(jax.jit, static_argnames=("mode", "reps"))
def run(x, idxs, stacks, *, mode, reps):
    if mode == "base":
        call = make_base()
    elif mode == "rowio":
        call = make_rowio(dequant=True)
    elif mode == "nodeq":
        call = make_rowio(dequant=False)
    elif mode == "gufuse":
        call = make_gufuse()
    else:
        raise ValueError(mode)

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
    modes = sys.argv[1:] or ["base", "rowio", "gufuse", "nodeq"]
    log(f"backend={jax.default_backend()} S={S} E={E} R=({R1},{R2})")
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    stacks = []
    for r in range(NREP):
        gw = jax.random.randint(ks[r * 3], (E, D, Fe), -8, 8, jnp.int8)
        gs = jnp.full((E, D // G, Fe), 0.005, jnp.bfloat16)
        uw = jax.random.randint(ks[r * 3 + 1], (E, D, Fe), -8, 8, jnp.int8)
        us = jnp.full((E, D // G, Fe), 0.005, jnp.bfloat16)
        dw = jax.random.randint(ks[r * 3 + 2], (E, Fe, D), -8, 8, jnp.int8)
        ds = jnp.full((E, Fe // G, D), 0.005, jnp.bfloat16)
        stacks.append((gw, gs, uw, us, dw, ds))
    raw = jax.random.randint(ks[7], (16, S), 0, E, dtype=jnp.int32)
    idxs = jnp.sort(raw, axis=1)  # expert-sorted slots (the serving order)
    x = jnp.ones((S, D), jnp.bfloat16)

    # fetch-skip-aware payload accounting: consecutive same-expert slots
    # reuse the VMEM block, so bytes/call = distinct experts * per-expert
    idxs_np = np.asarray(idxs)
    per_expert = (3 * D * Fe                      # int8 payloads
                  + 3 * (D // G) * Fe * 2)        # bf16 scales (Fe/G*D == D/G*Fe)
    ndist = np.array([len(np.unique(row)) for row in idxs_np])

    if jax.default_backend() not in ("tpu", "axon"):
        log("needs the TPU chip")
        return

    # gufuse stacks: gate|up concatenated on the k axis, built once on host
    gu_stacks = []
    for gw, gs, uw, us, dw, ds in stacks:
        gu_stacks.append((jnp.concatenate([gw, uw], axis=1),
                          jnp.concatenate([gs, us], axis=1), dw, ds))
    gu_stacks = jax.block_until_ready(gu_stacks)

    # numerics cross-check vs the shipped kernel (one call, idx set 0);
    # nodeq intentionally computes different math (floor probe)
    ref = np.asarray(make_base()(x, idxs[0], *stacks[0]))
    for mode in [m for m in modes if m not in ("base", "nodeq")]:
        st = gu_stacks[0] if mode == "gufuse" else stacks[0]
        call = make_gufuse() if mode == "gufuse" else make_rowio(True)
        y = np.asarray(call(x, idxs[0], *st))
        err = np.max(np.abs(y - ref)) / (np.max(np.abs(ref)) + 1e-9)
        log(f"[{mode}] max rel err vs base: {err:.2e}")
        assert err < 2e-2, f"{mode} diverges from the shipped kernel"

    results = {}
    for mode in modes:
        mode_stacks = gu_stacks if mode == "gufuse" else stacks
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
            # calls cycle through the 16 idx sets uniformly
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
