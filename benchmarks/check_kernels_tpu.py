#!/usr/bin/env python
"""Compiled-kernel numerics vs XLA oracles ON REAL TPU.

CI runs every kernel in interpret mode; this script validates the
actually-compiled Mosaic code paths on hardware — DMA banking, in-place
aliasing, masked-softmax exact-zero assumptions, int4/int8 cvt layouts —
which interpret mode cannot exercise.

Run: python benchmarks/check_kernels_tpu.py   (exits non-zero on mismatch)
"""

from __future__ import annotations

import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from quantizers_tpu.core import quantize  # noqa: E402
from quantizers_tpu.core.scheme import PRESET_SCHEMES  # noqa: E402
from quantizers_tpu.models.moe import ExpertLinears, _slot_dequant  # noqa: E402
from quantizers_tpu.ops import kernels as K  # noqa: E402
from quantizers_tpu.ops.dispatch import xla_quant_matmul  # noqa: E402
from quantizers_tpu.ops.linear import (  # noqa: E402
    from_quantized,
    i4_device_layout,
)

FAILS = []


def check(name, got, ref, atol=0.06, rtol=0.06):
    got = np.asarray(got, np.float32)
    ref = np.asarray(ref, np.float32)
    err = np.max(np.abs(got - ref) / (np.abs(ref) + 1.0))
    ok = err <= max(atol, rtol)
    print(f"{'OK ' if ok else 'FAIL'} {name:28s} max_rel_err={err:.4f}", flush=True)
    if not ok:
        FAILS.append(name)


def main() -> int:
    assert jax.default_backend() in ("tpu", "axon"), "run on TPU"
    rng = np.random.default_rng(0)

    # ---- dense kernels: w4(int4), nvfp4(int8), w8 -------------------------
    for preset, tag in (("W4A16_G32", "w4_int4"), ("NVFP4", "nvfp4_int8"),
                        ("W8A16", "w8")):
        args = PRESET_SCHEMES[preset].weights if preset in PRESET_SCHEMES else None
        if args is None:
            continue
        w = jnp.asarray(rng.standard_normal((512, 768)) * 0.2, jnp.float32)
        lin = from_quantized(quantize(w, args), args)
        x = jnp.asarray(rng.standard_normal((8, 768)) * 0.5, jnp.bfloat16)
        ref = xla_quant_matmul(x, lin)
        fn = K.KERNELS[lin.kind]

        # layout conversion + kernel in ONE jit: sub-byte arrays cannot
        # cross the tunneled host<->device boundary as jit args
        @jax.jit
        def run_kernel(x, lin, fn=fn):
            lin_dev = i4_device_layout({"l": lin})["l"]
            return fn(x, lin_dev, interpret=False)

        try:
            got = run_kernel(x, lin)
            check(tag, got, ref)
        except K.KernelUnsupported as e:
            print(f"SKIP {tag}: {e}", flush=True)

    # ---- decode attention (banked prefetch + in-place aliasing) -----------
    B, KV, rep, hd, S = 4, 4, 2, 128, 64
    q = jnp.asarray(rng.standard_normal((B, KV, rep, hd)) * 0.3, jnp.bfloat16)
    nk = jnp.asarray(rng.standard_normal((B, KV, hd)) * 0.3, jnp.bfloat16)
    nv = jnp.asarray(rng.standard_normal((B, KV, hd)) * 0.3, jnp.bfloat16)
    ck = jnp.asarray(rng.standard_normal((B, KV, S, hd)) * 0.3, jnp.bfloat16)
    cv = jnp.asarray(rng.standard_normal((B, KV, S, hd)) * 0.3, jnp.bfloat16)
    lengths = jnp.asarray([3, 17, 40, 63], jnp.int32)
    sm = 1.0 / np.sqrt(hd)
    ctx, k2, v2 = K.decode_attention(q, nk, nv, ck, cv, lengths, sm,
                                     interpret=False)

    def attn_oracle():
        k_all = np.asarray(ck, np.float32).copy()
        v_all = np.asarray(cv, np.float32).copy()
        out = np.zeros((B, KV, rep, hd), np.float32)
        for b in range(B):
            L = int(lengths[b])
            k_all[b, :, L] = np.asarray(nk, np.float32)[b]
            v_all[b, :, L] = np.asarray(nv, np.float32)[b]
            for h in range(KV):
                for r in range(rep):
                    s = k_all[b, h, :L + 1] @ np.asarray(q, np.float32)[b, h, r] * sm
                    p = np.exp(s - s.max()); p /= p.sum()
                    out[b, h, r] = p @ v_all[b, h, :L + 1]
        return out, k_all, v_all

    ref_ctx, ref_k, ref_v = attn_oracle()
    check("decode_attention.ctx", ctx, ref_ctx)
    check("decode_attention.k_cache", k2, ref_k, atol=0.02, rtol=0.02)
    check("decode_attention.v_cache", v2, ref_v, atol=0.02, rtol=0.02)

    # ---- MLA latent decode ------------------------------------------------
    H, r, dp = 4, 128, 128
    dr = 64
    q_abs = jnp.asarray(rng.standard_normal((B, H, r)) * 0.3, jnp.bfloat16)
    q_pe = jnp.asarray(np.pad(rng.standard_normal((B, H, dr)) * 0.3,
                              ((0, 0), (0, 0), (0, dp - dr))), jnp.bfloat16)
    new_c = jnp.asarray(rng.standard_normal((B, r)) * 0.3, jnp.bfloat16)
    new_p = jnp.asarray(np.pad(rng.standard_normal((B, dr)) * 0.3,
                               ((0, 0), (0, dp - dr))), jnp.bfloat16)
    cc = jnp.asarray(rng.standard_normal((B, 1, S, r)) * 0.3, jnp.bfloat16)
    cp = jnp.asarray(np.pad(rng.standard_normal((B, 1, S, dr)) * 0.3,
                            ((0, 0), (0, 0), (0, 0), (0, dp - dr))), jnp.bfloat16)
    mctx, c2, p2 = K.mla_decode_attention(q_abs, q_pe, new_c, new_p, cc, cp,
                                          lengths, sm, interpret=False)
    c_np = np.asarray(cc, np.float32).copy()
    p_np = np.asarray(cp, np.float32).copy()
    mref = np.zeros((B, H, r), np.float32)
    for b in range(B):
        L = int(lengths[b])
        c_np[b, 0, L] = np.asarray(new_c, np.float32)[b]
        p_np[b, 0, L] = np.asarray(new_p, np.float32)[b]
        for h in range(H):
            s = (c_np[b, 0, :L + 1] @ np.asarray(q_abs, np.float32)[b, h]
                 + p_np[b, 0, :L + 1] @ np.asarray(q_pe, np.float32)[b, h]) * sm
            p = np.exp(s - s.max()); p /= p.sum()
            mref[b, h] = p @ c_np[b, 0, :L + 1]
    check("mla_decode.ctx", mctx, mref)
    check("mla_decode.c_cache", c2, c_np, atol=0.02, rtol=0.02)
    check("mla_decode.p_cache", p2, p_np, atol=0.02, rtol=0.02)

    # ---- MoE slot FFN (pipelined expert blocks, int8 layout) --------------
    E, D, Fe, Ss = 8, 256, 128, 16
    nv_args = PRESET_SCHEMES["NVFP4"].weights

    def experts(k_in, n_out, seed):
        r2 = np.random.default_rng(seed)
        lins = [from_quantized(quantize(
            jnp.asarray(r2.standard_normal((n_out, k_in)) * 0.2, jnp.float32),
            nv_args), nv_args) for _ in range(E)]
        return ExpertLinears.stack(lins)

    gate, up, down = experts(D, Fe, 1), experts(D, Fe, 2), experts(Fe, D, 3)
    xs = jnp.asarray(rng.standard_normal((Ss, D)) * 0.3, jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, E, Ss), jnp.int32)

    @jax.jit
    def run_moe(xs, idx, gate, up, down):
        conv = i4_device_layout({"g": gate, "u": up, "d": down})
        return K.moe_slot_ffn(xs, idx, conv["g"], conv["u"], conv["d"],
                              interpret=False)

    y = run_moe(xs, idx, gate, up, down)
    gw = _slot_dequant(gate, idx)
    uw = _slot_dequant(up, idx)
    dw = _slot_dequant(down, idx)
    g = jnp.einsum("sd,sdf->sf", xs, gw, preferred_element_type=jnp.float32)
    u = jnp.einsum("sd,sdf->sf", xs, uw, preferred_element_type=jnp.float32)
    a = (jax.nn.silu(g) * u).astype(jnp.bfloat16)
    yref = jnp.einsum("sf,sfd->sd", a, dw, preferred_element_type=jnp.float32)
    check("moe_slot_ffn", y, yref)

    # ---- flash prefill ----------------------------------------------------
    from quantizers_tpu.ops.flash import flash_attention

    T = 64
    qf = jnp.asarray(rng.standard_normal((2, 4, T, 128)) * 0.3, jnp.bfloat16)
    kf = jnp.asarray(rng.standard_normal((2, 2, T, 128)) * 0.3, jnp.bfloat16)
    vf = jnp.asarray(rng.standard_normal((2, 2, T, 128)) * 0.3, jnp.bfloat16)
    out = flash_attention(qf, kf, vf, sm, block_q=32, block_k=32,
                          interpret=False)
    kr = np.repeat(np.asarray(kf, np.float32), 2, axis=1)
    vr = np.repeat(np.asarray(vf, np.float32), 2, axis=1)
    s = np.einsum("bhtd,bhsd->bhts", np.asarray(qf, np.float32), kr) * sm
    s = np.where(np.tril(np.ones((T, T), bool)), s, -1e30)
    p = np.exp(s - s.max(-1, keepdims=True)); p /= p.sum(-1, keepdims=True)
    fref = np.einsum("bhts,bhsd->bhtd", p, vr)
    check("flash_attention", out, fref)

    print(f"\n{'ALL OK' if not FAILS else 'FAILURES: ' + ', '.join(FAILS)}",
          flush=True)
    return 1 if FAILS else 0


if __name__ == "__main__":
    sys.exit(main())
