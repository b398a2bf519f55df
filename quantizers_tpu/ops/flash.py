"""Blockwise (flash) prefill attention.

The reference's only long-context handling is truncation at tokenization
(`src/quantizers/calibration_sets.py:639-645`); SURVEY §5 asks the TPU
rebuild to keep prefill attention *blockwise* so memory stays linear in
sequence length and a ring/context-parallel extension over ICI remains
possible (each kv-block step is already a self-contained partial-softmax
update — a ring variant rotates kv blocks between chips instead of
iterating locally).

Online-softmax tiling (the standard flash recurrence): for each query
block, iterate kv blocks keeping a running row max ``m``, normalizer
``l`` and unnormalized accumulator ``acc``; each new block rescales the
old state by ``exp(m_old - m_new)``. Nothing (T, S)-sized is ever
materialized — peak VMEM is one (bq, bk) score tile.

Causal skipping: kv grid steps strictly above the diagonal contribute
nothing; their compute is gated with ``pl.when``. (Their k/v blocks are
still streamed by the grid pipeline — prefill is MXU-bound, so the extra
streaming is cheap; a future emit_pipeline variant can elide it.)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kernels import KernelUnsupported, _interpret

_NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_sc, l_sc, acc_sc,
                  *, bq: int, bk: int, n_k: int, sm_scale: float,
                  causal: bool):
    # note: o/acc are dv-wide (v head), which may differ from the q/k
    # head dim (MLA pads qk to a lane multiple but keeps v at dv)
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_sc[:] = jnp.full_like(m_sc, _NEG_INF)
        l_sc[:] = jnp.zeros_like(l_sc)
        acc_sc[:] = jnp.zeros_like(acc_sc)

    def _step():
        q = q_ref[0, 0]  # (bq, d)
        k = k_ref[0, 0]  # (bk, d)
        v = v_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale  # (bq, bk)
        if causal:
            rows = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            cols = ki * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            s = jnp.where(rows >= cols, s, _NEG_INF)
        m_old = m_sc[:]  # (bq, 1)
        m_new = jnp.maximum(m_old, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_old - m_new)
        l_sc[:] = l_sc[:] * corr + p.sum(axis=-1, keepdims=True)
        acc_sc[:] = acc_sc[:] * corr + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_sc[:] = m_new

    if causal:
        pl.when(ki * bk <= qi * bq + bq - 1)(_step)
    else:
        _step()

    @pl.when(ki == n_k - 1)
    def _write():
        o_ref[0, 0] = (acc_sc[:] / jnp.maximum(l_sc[:], 1e-30)
                       ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("rep", "sm_scale", "causal",
                                             "bq", "bk", "interpret"))
def _flash_call(q, k, v, *, rep, sm_scale, causal, bq, bk, interpret):
    B, H, T, d = q.shape
    S = k.shape[2]
    dv = v.shape[3]
    n_q = T // bq
    n_k = S // bk
    grid = (B, H, n_q, n_k)

    return pl.pallas_call(
        functools.partial(_flash_kernel, bq=bq, bk=bk, n_k=n_k,
                          sm_scale=sm_scale, causal=causal),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda b, h, qi, ki: (b, h, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, d),
                         lambda b, h, qi, ki, rep=rep: (b, h // rep, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, dv),
                         lambda b, h, qi, ki, rep=rep: (b, h // rep, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, dv), lambda b, h, qi, ki: (b, h, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, T, dv), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, dv), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v)


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    sm_scale: float, causal: bool = True,
                    block_q: int = 256, block_k: int = 256,
                    interpret: Optional[bool] = None) -> jax.Array:
    """Blockwise causal attention, head-major.

    q (B, H, T, d); k (B, KV, S, d); v (B, KV, S, dv) with KV | H (GQA
    group folding via the kv BlockSpec index map — no repeated-KV
    materialization); dv may differ from d (MLA's padded qk heads).
    Returns (B, H, T, dv). Raises KernelUnsupported for shapes the TPU
    tiling can't take (caller falls back to the einsum path).
    """
    B, H, T, d = q.shape
    KV, S = k.shape[1], k.shape[2]
    if H % KV:
        raise KernelUnsupported(f"flash: KV heads {KV} must divide H {H}")
    bq = min(block_q, T)
    bk = min(block_k, S)
    if T % bq or S % bk or bq % 8 or bk % 8:
        raise KernelUnsupported(
            f"flash: need bq|T ({bq},{T}), bk|S ({bk},{S}), 8|bq, 8|bk")
    if d % 128:
        raise KernelUnsupported(f"flash: head dim {d} needs 128|d")
    if v.shape[3] % 128:
        # an unaligned v head would fail in Mosaic with an error the
        # callers' KernelUnsupported fallbacks cannot catch
        raise KernelUnsupported(f"flash: v head dim {v.shape[3]} needs 128|dv")
    return _flash_call(
        q, k, v, rep=H // KV, sm_scale=float(sm_scale), causal=bool(causal),
        bq=bq, bk=bk,
        interpret=_interpret() if interpret is None else interpret)
