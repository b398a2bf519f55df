"""Pure-JAX decoder-only transformer over QuantLinear weights.

TPU-native replacement for the torch model graph the reference calibrates
through llmcompressor (``scripts/do_oneshot.py:177-187``). Design:

* params are a plain pytree: ``{"embed", "layers": [per-layer dict...],
  "final_norm", "lm_head"}``; every projection is a
  :class:`~quantizers_tpu.ops.linear.QuantLinear` so one model definition
  serves bf16, W4A16, FP8, NVFP4 and mixed-precision checkpoints alike.
* the forward pass is layer-composable: :func:`apply_layer` is a standalone
  function so the oneshot engine can stream layers host→HBM one at a time
  (the TPU analog of the reference's accelerate CPU-offload device maps,
  ``scripts/old_scripts/main_devstral-gptq.py:57-113``).
* MoE layers support *all-expert calibration* — every expert sees every
  token — mirroring ``oneshot(..., moe_calibrate_all_experts=True)``
  (reference ``scripts/do_oneshot.py:186``).
* static shapes + ``lax``-friendly control flow throughout; attention is
  computed blockless here (calibration seq ≤ 8k fits VMEM-tiled XLA fusions)
  with f32 softmax.
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.linear import QuantLinear, dense_linear
from .config import ModelSpec
from .moe import ExpertLinears, moe_forward


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    dt = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(dt) * weight.astype(dt)


def rotary_cos_sin(positions: jax.Array, head_dim: int, theta: float) -> Tuple[jax.Array, jax.Array]:
    """positions (..., T) int32 -> cos/sin (..., T, head_dim/2) f32."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    ang = positions.astype(jnp.float32)[..., None] * inv_freq
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x (B, T, H, hd); HF rotate-half convention."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    cos = cos[:, :, None, :].astype(x.dtype)
    sin = sin[:, :, None, :].astype(x.dtype)
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)


def apply_rope_interleaved(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """DeepSeek-MLA rope: channels are stored interleaved (even/odd pairs).

    Equivalent to HF's de-interleave-then-rotate-half; the output stays in
    de-interleaved order, which is consistent between q and k so attention
    scores match the torch reference bit-for-bit in spirit.
    """
    x1, x2 = x[..., 0::2], x[..., 1::2]
    cos = cos[:, :, None, :].astype(x.dtype)
    sin = sin[:, :, None, :].astype(x.dtype)
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)


class KVCache(NamedTuple):
    """Per-layer KV cache, **head-major** ``(B, n_kv, S_max, head_dim)``;
    ``length`` holds **per-row** fill lengths (B,) so rows decode at
    independent positions — the substrate for continuous batching.

    Head-major layout is the TPU-native choice: the per-(row, head) slice
    ``cache[b, h]`` is contiguous in HBM, so the decode-attention kernel
    streams it with full-width DMAs and updates the current row in place
    (``input_output_aliases``) instead of carrying a copied cache through
    the scan.

    ``k_scale``/``v_scale`` support the FP8 KV-cache scheme
    (reference ``main_seed-oss-fp8-kv8.py:168-202``): when set, k/v are
    stored as float8_e4m3fn and dequantized on read.

    Garbage-slot invariant: right-padded prefill writes junk at slots
    ``[len_row, T_pad)``, but every later decode step writes its token at
    exactly ``length`` before attention ever admits that position
    (``kv_pos <= q_pos``), so junk is always overwritten before it becomes
    visible.
    """

    k: jax.Array
    v: jax.Array
    length: jax.Array  # (B,) int32 per-row fill lengths
    k_scale: Optional[jax.Array] = None
    v_scale: Optional[jax.Array] = None

    @classmethod
    def init(cls, spec: ModelSpec, batch: int, max_len: int,
             dtype=jnp.bfloat16, fp8: bool = False,
             k_scale: float = 1.0, v_scale: float = 1.0) -> List["KVCache"]:
        (hk, dk), (hv, dv) = spec.kv_cache_dims()
        k_shape = (batch, hk, max_len, dk)
        v_shape = (batch, hv, max_len, dv)
        caches = []
        for _ in range(spec.num_layers):
            if fp8:
                caches.append(cls(
                    k=jnp.zeros(k_shape, jnp.float8_e4m3fn),
                    v=jnp.zeros(v_shape, jnp.float8_e4m3fn),
                    length=jnp.zeros((batch,), jnp.int32),
                    k_scale=jnp.asarray(k_scale, jnp.float32),
                    v_scale=jnp.asarray(v_scale, jnp.float32),
                ))
            else:
                caches.append(cls(
                    k=jnp.zeros(k_shape, dtype),
                    v=jnp.zeros(v_shape, dtype),
                    length=jnp.zeros((batch,), jnp.int32),
                ))
        return caches


def _store(cache_arr: jax.Array, new: jax.Array, offsets: jax.Array,
           scale: Optional[jax.Array]) -> jax.Array:
    """Write new (B, T, KV, hd) into the head-major cache (B, KV, S, hd)
    at per-row offsets (B,)."""
    if scale is not None:
        new = (new.astype(jnp.float32) / scale).astype(cache_arr.dtype)
    else:
        new = new.astype(cache_arr.dtype)
    new_hm = jnp.swapaxes(new, 1, 2)  # (B, KV, T, hd)
    return jax.vmap(
        lambda c, n, off: jax.lax.dynamic_update_slice(c, n, (0, off, 0))
    )(cache_arr, new_hm, offsets)


def _read(cache_arr: jax.Array, scale: Optional[jax.Array], dtype) -> jax.Array:
    if scale is None:
        return cache_arr if cache_arr.dtype == dtype else cache_arr.astype(dtype)
    return (cache_arr.astype(jnp.float32) * scale).astype(dtype)


# ---------------------------------------------------------------------------
# attention + mlp blocks
# ---------------------------------------------------------------------------

def _cache_and_mask(cache: Optional[KVCache], k: jax.Array, v: jax.Array,
                    positions: jax.Array, dtype
                    ) -> Tuple[jax.Array, jax.Array, jax.Array, Optional[KVCache]]:
    """Append new k/v (B, T, KV, hd) to the head-major cache and build the
    causal mask over the full (possibly cached) key axis.

    Returns ``(k_att, v_att, mask (B|1, T, S), new_cache)`` with
    k_att/v_att in head-major (B, KV, S, hd).
    """
    T = k.shape[1]
    if cache is not None:
        off = cache.length
        k_all = _store(cache.k, k, off, cache.k_scale)
        v_all = _store(cache.v, v, off, cache.v_scale)
        new_cache = cache._replace(k=k_all, v=v_all, length=off + T)
        k_att = _read(k_all, cache.k_scale, dtype)
        v_att = _read(v_all, cache.v_scale, dtype)
        S = k_att.shape[2]
        kv_pos = jnp.arange(S)[None, :]  # (1, S)
        mask = kv_pos[None, :, :] <= positions[:, :, None]  # (B, T, S)
        return k_att, v_att, mask, new_cache
    idx = jnp.arange(T)
    mask = (idx[None, :, None] >= idx[None, None, :])  # (1, T, S) causal
    return jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2), mask, None


def attention(layer: Dict[str, Any], spec: ModelSpec, x: jax.Array,
              positions: jax.Array, cache: Optional[KVCache],
              capture: Optional[Dict[str, jax.Array]] = None
              ) -> Tuple[jax.Array, Optional[KVCache]]:
    """x (B, T, D) post-layernorm -> (attn_out (B, T, D), new_cache)."""
    B, T, _ = x.shape
    H, KV, hd = spec.num_heads, spec.num_kv_heads, spec.head_dim

    if "qkv_proj" in layer:
        qkv = layer["qkv_proj"].apply(x)
        q = qkv[..., : H * hd].reshape(B, T, H, hd)
        k = qkv[..., H * hd : (H + KV) * hd].reshape(B, T, KV, hd)
        v = qkv[..., (H + KV) * hd :].reshape(B, T, KV, hd)
    else:
        q = layer["q_proj"].apply(x).reshape(B, T, H, hd)
        k = layer["k_proj"].apply(x).reshape(B, T, KV, hd)
        v = layer["v_proj"].apply(x).reshape(B, T, KV, hd)

    if spec.qk_norm:
        q = rms_norm(q, layer["q_norm"], spec.rms_norm_eps)
        k = rms_norm(k, layer["k_norm"], spec.rms_norm_eps)

    cos, sin = rotary_cos_sin(positions, hd, spec.rope_theta)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    if capture is not None:
        # post-RoPE K and V — what an FP8 KV cache would store
        capture["k_cache"] = k
        capture["v_cache"] = v

    rep = H // KV
    if cache is not None and T == 1:
        # Decode fast path: Pallas kernel streams the head-major cache and
        # writes the new row IN PLACE (aliased buffers) — no cache copy in
        # the scan carry. Assumes the standard decode invariant
        # positions == cache.length (write position == mask bound).
        from ..ops import kernels as _kernels

        try:
            ctx4, k_new, v_new = _kernels.decode_attention(
                q[:, 0].reshape(B, KV, rep, hd), k[:, 0], v[:, 0],
                cache.k, cache.v, cache.length, 1.0 / np.sqrt(hd))
            new_cache = cache._replace(k=k_new, v=v_new, length=cache.length + 1)
            ctx = ctx4.reshape(B, 1, H * hd)
            if capture is not None:
                capture["o_proj"] = ctx
            return layer["o_proj"].apply(ctx), new_cache
        except _kernels.KernelUnsupported:
            pass

    k_att, v_att, mask, new_cache = _cache_and_mask(cache, k, v, positions, x.dtype)

    if cache is None and T > 1:
        # calibration / no-cache forward: blockwise flash attention keeps
        # memory linear in T (8k calibration windows would otherwise
        # materialize (B, H, T, T) scores); einsum fallback for shapes the
        # tiling rejects (tiny tests, odd head dims)
        from ..ops import flash as _flash
        from ..ops.kernels import KernelUnsupported as _KU

        try:
            ctx = _flash.flash_attention(
                jnp.swapaxes(q, 1, 2), k_att, v_att, 1.0 / np.sqrt(hd))
            ctx = jnp.swapaxes(ctx, 1, 2).reshape(B, T, H * hd)
            if capture is not None:
                capture["o_proj"] = ctx
            return layer["o_proj"].apply(ctx), None
        except _KU:
            pass

    # GQA without materializing repeated KV: fold the head-group axis into
    # the query side (a jnp.repeat here would stream rep× the KV cache out
    # of HBM every decode step — the dominant cost at small batch).
    qg = q.reshape(B, T, KV, rep, hd)
    scores = jnp.einsum("btkrd,bksd->bkrts", qg, k_att,
                        preferred_element_type=jnp.float32)
    scores = scores * (1.0 / np.sqrt(hd))
    scores = jnp.where(mask[:, None, None, :, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bkrts,bksd->btkrd", probs, v_att)
    ctx = ctx.reshape(B, T, H * hd)

    if capture is not None:
        capture["o_proj"] = ctx
    out = layer["o_proj"].apply(ctx)
    return out, new_cache


def mla_attention(layer: Dict[str, Any], spec: ModelSpec, x: jax.Array,
                  positions: jax.Array, cache: Optional[KVCache],
                  capture: Optional[Dict[str, jax.Array]] = None
                  ) -> Tuple[jax.Array, Optional[KVCache]]:
    """Multi-head Latent Attention (DeepSeek-V2/V3 / GLM-Flash / MiniMax).

    Low-rank compressed KV + a decoupled shared RoPE head; the MLA
    projections are exactly the modules the reference's data-free script
    keeps high-precision (``scripts/quant_GLM-4.7-Flash-FP8.py:15-22``).

    The cache is the *latent* cache (absorbed form): one shared
    (c_kv, rope-k) row per token (see ModelSpec.kv_cache_dims), attended
    in the r-dim latent space — scores_h = (W_uk_h^T q_nope_h)·c +
    q_pe_h·k_pe, ctx_h = W_uv_h (probs·C). On TPU the one-token step runs
    the in-place Pallas kernel (ops.kernels.mla_decode_attention); the
    no-cache calibration path keeps the expanded computation (and its
    activation captures) unchanged.
    """
    B, T, _ = x.shape
    H = spec.num_heads
    dn, dr, dv = spec.qk_nope_head_dim, spec.qk_rope_head_dim, spec.v_head_dim
    dq = dn + dr
    r = spec.kv_lora_rank

    if spec.q_lora_rank:
        cq = rms_norm(layer["q_a_proj"].apply(x), layer["q_a_layernorm"],
                      spec.rms_norm_eps)
        if capture is not None:
            capture["q_b_proj"] = cq
        q = layer["q_b_proj"].apply(cq)
    else:
        q = layer["q_proj"].apply(x)
    q = q.reshape(B, T, H, dq)
    q_nope, q_pe = q[..., :dn], q[..., dn:]

    ckv = layer["kv_a_proj_with_mqa"].apply(x)  # (B, T, r + dr)
    c_kv = rms_norm(ckv[..., :r], layer["kv_a_layernorm"], spec.rms_norm_eps)
    k_pe = ckv[..., r:][:, :, None, :]  # (B, T, 1, dr)
    if capture is not None:
        capture["kv_b_proj"] = c_kv

    cos, sin = rotary_cos_sin(positions, dr, spec.rope_theta)
    q_pe = apply_rope_interleaved(q_pe, cos, sin)
    k_pe = apply_rope_interleaved(k_pe, cos, sin)

    if cache is None:
        # calibration / no-cache forward: expanded computation, with the
        # activation captures the oneshot engine feeds to observers
        kv = layer["kv_b_proj"].apply(c_kv).reshape(B, T, H, dn + dv)
        k_nope, v = kv[..., :dn], kv[..., dn:]
        q_full = jnp.concatenate([q_nope, q_pe], axis=-1)
        k = jnp.concatenate(
            [k_nope, jnp.broadcast_to(k_pe, (B, T, H, dr))], axis=-1)
        if capture is not None:
            # FP8 KV-cache scale calibration must see what the serving
            # cache actually stores: for MLA that is the latent (c_kv)
            # and the shared post-rope k_pe row — NOT the expanded heads
            # (kv_cache_dims documents the latent layout)
            capture["k_cache"] = c_kv
            capture["v_cache"] = k_pe

        ctx = None
        if T > 1:
            # blockwise flash for the calibration forward: 4k-8k windows
            # would otherwise materialize (B, H, T, T) f32 scores (~17 GB
            # at GLM-class geometry). The 192-wide qk head pads to a lane
            # multiple with zeros (exact — padded channels contribute 0);
            # v stays dv-wide.
            from ..ops import flash as _flash
            from ..ops.kernels import KernelUnsupported as _KU

            dq_pad = -(-dq // 128) * 128
            try:
                qp = jnp.pad(jnp.swapaxes(q_full, 1, 2),
                             ((0, 0), (0, 0), (0, 0), (0, dq_pad - dq)))
                kp = jnp.pad(jnp.swapaxes(k, 1, 2),
                             ((0, 0), (0, 0), (0, 0), (0, dq_pad - dq)))
                vp = jnp.swapaxes(v, 1, 2)
                ctx4 = _flash.flash_attention(qp, kp, vp, 1.0 / np.sqrt(dq))
                ctx = jnp.swapaxes(ctx4, 1, 2).reshape(B, T, H * dv)
            except _KU:
                ctx = None
        if ctx is None:
            k_att, v_att, mask, _ = _cache_and_mask(None, k, v, positions, x.dtype)
            scores = jnp.einsum("bthd,bhsd->bhts", q_full, k_att,
                                preferred_element_type=jnp.float32)
            scores = scores * (1.0 / np.sqrt(dq))
            scores = jnp.where(mask[:, None, :, :], scores, -1e30)
            probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
            ctx = jnp.einsum("bhts,bhsd->bthd", probs, v_att
                             ).reshape(B, T, H * dv)
        if capture is not None:
            capture["o_proj"] = ctx
        return layer["o_proj"].apply(ctx), None

    # ---- cached path: latent rows, absorbed attention -------------------
    w_uk_t, w_uv = _mla_absorb_weights(layer, spec, x.dtype)
    rope_pad = cache.v.shape[3]
    pe_row = jnp.pad(k_pe, ((0, 0), (0, 0), (0, 0), (0, rope_pad - dr)))
    q_abs = jnp.einsum("bthd,hdr->bthr", q_nope, w_uk_t)
    sm = 1.0 / np.sqrt(dq)

    if T == 1:
        from ..ops import kernels as _kernels

        try:
            q_pe_pad = jnp.pad(q_pe[:, 0], ((0, 0), (0, 0), (0, rope_pad - dr)))
            ctx_lat, c_new, p_new = _kernels.mla_decode_attention(
                q_abs[:, 0], q_pe_pad, c_kv[:, 0], pe_row[:, 0, 0],
                cache.k, cache.v, cache.length, sm)
            new_cache = cache._replace(k=c_new, v=p_new,
                                       length=cache.length + 1)
            ctx = jnp.einsum("bhr,hrv->bhv", ctx_lat, w_uv
                             ).reshape(B, 1, H * dv)
            return layer["o_proj"].apply(ctx), new_cache
        except _kernels.KernelUnsupported:
            pass

    # XLA fallback (prefill, odd shapes, CPU): same absorbed math over the
    # stored latent prefix
    off = cache.length
    c_all = _store(cache.k, c_kv[:, :, None, :], off, cache.k_scale)
    p_all = _store(cache.v, pe_row, off, cache.v_scale)
    new_cache = cache._replace(k=c_all, v=p_all, length=off + T)
    c_read = _read(c_all, cache.k_scale, x.dtype)[:, 0]  # (B, S, r)
    p_read = _read(p_all, cache.v_scale, x.dtype)[:, 0]

    S = c_read.shape[1]
    kv_pos = jnp.arange(S)[None, :]
    mask = kv_pos[None, :, :] <= positions[:, :, None]  # (B, T, S)
    scores = (jnp.einsum("bthr,bsr->bhts", q_abs, c_read,
                         preferred_element_type=jnp.float32)
              + jnp.einsum("bthd,bsd->bhts", q_pe, p_read[:, :, :dr],
                           preferred_element_type=jnp.float32)) * sm
    scores = jnp.where(mask[:, None, :, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    ctx_lat = jnp.einsum("bhts,bsr->bthr", probs, c_read)
    ctx = jnp.einsum("bthr,hrv->bthv", ctx_lat, w_uv).reshape(B, T, H * dv)
    return layer["o_proj"].apply(ctx), new_cache


def mla_absorb_layout(spec: ModelSpec, params: Dict[str, Any]) -> Dict[str, Any]:
    """Add the precomputed absorbed-decode weights (``mla_absorb``) to every
    MLA layer that lacks them. Safe at jit entry points (one derivation per
    compiled program, hoisted out of any inner scan) — without it the
    decode scan would re-dequantize kv_b_proj every token. No-op for
    non-MLA specs and already-prepared params."""
    if not spec.is_mla:
        return params
    out = dict(params)
    layers = []
    for lyr in params["layers"]:
        if "kv_b_proj" in lyr and "mla_absorb" not in lyr:
            lyr = dict(lyr)
            w_uk_t, w_uv = _mla_absorb_weights(lyr, spec, jnp.bfloat16)
            lyr["mla_absorb"] = {"w_uk_t": w_uk_t, "w_uv": w_uv}
        layers.append(lyr)
    out["layers"] = layers
    return out


def _mla_absorb_weights(layer: Dict[str, Any], spec: ModelSpec, dtype
                        ) -> Tuple[jax.Array, jax.Array]:
    """(W_uk^T (H, dn, r), W_uv (H, r, dv)) from kv_b_proj — precomputed
    by fuse_for_decode for serving; derived inline otherwise (fine for
    tests; inside a decode scan the inline dequant would re-run per step,
    so production decode should always go through fuse_for_decode)."""
    ab = layer.get("mla_absorb")
    if ab is not None:
        return ab["w_uk_t"].astype(dtype), ab["w_uv"].astype(dtype)
    dn = spec.qk_nope_head_dim
    dv = spec.v_head_dim or spec.head_dim
    w = layer["kv_b_proj"].dequantize(dtype)  # (r, H*(dn+dv))
    w = w.reshape(w.shape[0], spec.num_heads, dn + dv)
    w_uk_t = jnp.transpose(w[..., :dn], (1, 2, 0))
    w_uv = jnp.transpose(w[..., dn:], (1, 0, 2))
    return w_uk_t, w_uv


def dense_mlp(mlp: Dict[str, QuantLinear], x: jax.Array,
              capture: Optional[Dict[str, jax.Array]] = None) -> jax.Array:
    if "gateup_proj" in mlp:
        gu = mlp["gateup_proj"].apply(x)
        g, u = jnp.split(gu, 2, axis=-1)
    else:
        g = mlp["gate_proj"].apply(x)
        u = mlp["up_proj"].apply(x)
    h = jax.nn.silu(g.astype(jnp.float32)).astype(x.dtype) * u
    if capture is not None:
        capture["down_proj"] = h
    return mlp["down_proj"].apply(h)


# ---------------------------------------------------------------------------
# layer / model forward
# ---------------------------------------------------------------------------

def apply_layer(layer: Dict[str, Any], spec: ModelSpec, layer_idx: int,
                x: jax.Array, positions: jax.Array,
                cache: Optional[KVCache] = None,
                moe_all_experts: bool = False,
                capture: Optional[Dict[str, jax.Array]] = None,
                ) -> Tuple[jax.Array, Optional[KVCache]]:
    """One decoder block. ``capture``, when a dict, is filled with the
    inputs of each linear (keyed by projection name) — the activation feed
    for AWQ/GPTQ observers."""
    h = rms_norm(x, layer["input_layernorm"], spec.rms_norm_eps)
    if spec.is_mla:
        if capture is not None:
            capture["q_a_proj" if spec.q_lora_rank else "q_proj"] = h
            capture["kv_a_proj_with_mqa"] = h
        attn_out, new_cache = mla_attention(layer, spec, h, positions, cache, capture)
    else:
        if capture is not None:
            capture["q_proj"] = h
            capture["k_proj"] = h
            capture["v_proj"] = h
        attn_out, new_cache = attention(layer, spec, h, positions, cache, capture)
    x = x + attn_out

    h = rms_norm(x, layer["post_attention_layernorm"], spec.rms_norm_eps)
    if spec.layer_is_moe(layer_idx):
        if capture is not None:
            capture["moe_in"] = h
        mlp_out = moe_forward(layer["moe"], spec, h, all_experts=moe_all_experts,
                              capture=capture)
    else:
        if capture is not None:
            capture["gate_proj"] = h
            capture["up_proj"] = h
        mlp_out = dense_mlp(layer["mlp"], h, capture)
    return x + mlp_out, new_cache


def embed(params: Dict[str, Any], input_ids: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    return params["embed"].astype(dtype)[input_ids]


def logits_head(params: Dict[str, Any], spec: ModelSpec, x: jax.Array) -> jax.Array:
    x = rms_norm(x, params["final_norm"], spec.rms_norm_eps)
    if params.get("lm_head") is not None:
        head = params["lm_head"]
        out = head.apply(x)
        orig_n = head.meta_dict.get("orig_n")  # tile-padded head: slice
        if orig_n is not None:                 # (see quantize_lm_head)
            out = out[..., :orig_n]
        return out
    # tied embeddings
    return jnp.einsum("btd,vd->btv", x, params["embed"].astype(x.dtype),
                      preferred_element_type=jnp.float32).astype(x.dtype)


def forward(params: Dict[str, Any], spec: ModelSpec, input_ids: jax.Array,
            caches: Optional[List[KVCache]] = None,
            positions: Optional[jax.Array] = None,
            moe_all_experts: bool = False,
            ) -> Tuple[jax.Array, Optional[List[KVCache]]]:
    """Full forward: (B, T) ids -> (B, T, vocab) logits (+ updated caches)."""
    B, T = input_ids.shape
    if positions is None:
        if caches is not None:
            positions = caches[0].length[:, None] + jnp.arange(T)[None, :]
        else:
            positions = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
    x = embed(params, input_ids)
    new_caches: Optional[List[KVCache]] = [] if caches is not None else None
    for i, layer in enumerate(params["layers"]):
        c = caches[i] if caches is not None else None
        x, nc = apply_layer(layer, spec, i, x, positions, c, moe_all_experts)
        if new_caches is not None:
            new_caches.append(nc)
    logits = logits_head(params, spec, x)
    return logits, new_caches


# ---------------------------------------------------------------------------
# decode-layout fusion (serving-time transform)
# ---------------------------------------------------------------------------

def fuse_for_decode(spec: ModelSpec, params: Dict[str, Any]) -> Dict[str, Any]:
    """Fuse same-input projections (q/k/v -> qkv_proj, gate/up ->
    gateup_proj; MLA: q_a + kv_a) into single QuantLinears.

    Decode at small batch is dominated by per-kernel-call overhead; fusing
    cuts the quantized matmul calls per layer from 7 to 4. Only applies
    when the parts share kind/layout (always true for single-scheme
    checkpoints); mixed-precision layers are left unfused. Returns a new
    params dict (shares leaf arrays with the input except fused ones).
    """
    from ..ops.linear import concat_linears

    out = dict(params)
    layers = []
    for i, layer in enumerate(params["layers"]):
        lyr = dict(layer)
        try:
            if spec.is_mla:
                pass  # absorbed-decode weights added below via mla_absorb_layout
            elif "q_proj" in lyr:
                lyr["qkv_proj"] = concat_linears(
                    [lyr["q_proj"], lyr["k_proj"], lyr["v_proj"]])
                del lyr["q_proj"], lyr["k_proj"], lyr["v_proj"]
        except ValueError:
            pass
        if "mlp" in lyr and "gate_proj" in lyr["mlp"]:  # idempotent
            mlp = dict(lyr["mlp"])
            try:
                mlp["gateup_proj"] = concat_linears(
                    [mlp["gate_proj"], mlp["up_proj"]])
                del mlp["gate_proj"], mlp["up_proj"]
                lyr["mlp"] = mlp
            except ValueError:
                pass
        layers.append(lyr)
    out["layers"] = layers
    return mla_absorb_layout(spec, out)


def quantize_lm_head(spec: ModelSpec, params: Dict[str, Any],
                     num_bits: int = 8) -> Dict[str, Any]:
    """Serving-layout option: quantize the logits head (per-channel
    symmetric int8 by default).

    With tied embeddings the decode logits matmul re-reads the full
    (V, D) bf16 table every step — 622 MB at Qwen3-30B geometry, a large
    share of the per-step HBM traffic. A w8-channel copy halves that
    stream at near-lossless quality (per-channel int8 on the output
    projection; the input-embedding gather keeps the exact bf16 table).
    Returns a new params dict with ``lm_head`` set; ``forward`` prefers
    ``lm_head`` over the tied table automatically."""
    from ..core.numerics import quantize
    from ..core.scheme import QuantizationArgs, QuantStrategy, QuantType
    from ..ops.linear import from_quantized

    bias = None
    if params.get("lm_head") is not None:
        w_vd = params["lm_head"].dequantize(jnp.float32).T  # (V, D)
        bias = params["lm_head"].bias  # an untied head may carry one
    else:
        w_vd = params["embed"].astype(jnp.float32)
    args = QuantizationArgs(num_bits=num_bits, type=QuantType.INT,
                            symmetric=True, strategy=QuantStrategy.CHANNEL)
    qt = jax.jit(lambda w: quantize(w, args))(w_vd)
    out = dict(params)
    lin = from_quantized(qt, args, bias=bias)
    # Pad the vocab axis to a 1536 (2^9*3) quantum. Qwen-class vocabs
    # factor as 128*prime (151936 = 128*1187), which forces the pallas
    # tile picker into (k, 128) strided column tiles (~500 GB/s on v5e);
    # a composite width admits (256, 8448)-class tiles near the
    # contiguous-stream rate. Padded columns have scale 0 -> logit 0 and
    # are sliced off in logits_head via the explicit ``orig_n`` meta
    # (declared, not inferred from a shape mismatch — a resized or
    # per-shard head must never be silently truncated).
    V = lin.meta_dict["n"]
    pad = (-V) % 1536
    if pad and pad / V < 0.05:
        lin = QuantLinear(
            kind=lin.kind,
            weight=jnp.pad(lin.weight, ((0, 0), (0, pad))),
            scale=jnp.pad(lin.scale, ((0, 0), (0, pad))),
            bias=None if lin.bias is None else jnp.pad(lin.bias, (0, pad)),
            meta=tuple(("n", V + pad) if k_ == "n" else (k_, v_)
                       for k_, v_ in lin.meta) + (("orig_n", V),))
    out["lm_head"] = lin
    return out


# ---------------------------------------------------------------------------
# initialization (random weights — tests, dry runs, perf benches)
# ---------------------------------------------------------------------------

def _rand_linear(key: jax.Array, n: int, k: int, dtype=jnp.bfloat16,
                 bias: bool = False, scale: float = 0.02) -> QuantLinear:
    w = jax.random.normal(key, (n, k), jnp.float32) * scale
    b = np.zeros((n,), np.float32) if bias else None
    return dense_linear(w, bias=b, dtype=dtype)  # w stays on device


def init_params(spec: ModelSpec, key: Optional[jax.Array] = None,
                dtype=jnp.bfloat16) -> Dict[str, Any]:
    key = key if key is not None else jax.random.PRNGKey(0)
    n_keys = 8 + spec.num_layers * (12 + 3 * max(spec.num_experts, 1))
    ks = iter(jax.random.split(key, n_keys))
    D, Ff = spec.hidden_size, spec.intermediate_size
    layers: List[Dict[str, Any]] = []
    for i in range(spec.num_layers):
        layer: Dict[str, Any] = {
            "input_layernorm": jnp.ones((D,), dtype),
            "post_attention_layernorm": jnp.ones((D,), dtype),
        }
        if spec.is_mla:
            H, dq = spec.num_heads, spec.qk_head_dim
            if spec.q_lora_rank:
                layer["q_a_proj"] = _rand_linear(next(ks), spec.q_lora_rank, D, dtype)
                layer["q_a_layernorm"] = jnp.ones((spec.q_lora_rank,), dtype)
                layer["q_b_proj"] = _rand_linear(next(ks), H * dq, spec.q_lora_rank, dtype)
            else:
                layer["q_proj"] = _rand_linear(next(ks), H * dq, D, dtype)
            layer["kv_a_proj_with_mqa"] = _rand_linear(
                next(ks), spec.kv_lora_rank + spec.qk_rope_head_dim, D, dtype)
            layer["kv_a_layernorm"] = jnp.ones((spec.kv_lora_rank,), dtype)
            layer["kv_b_proj"] = _rand_linear(
                next(ks), H * (spec.qk_nope_head_dim + spec.v_head_dim),
                spec.kv_lora_rank, dtype)
            layer["o_proj"] = _rand_linear(next(ks), D, H * spec.v_head_dim, dtype)
        else:
            layer["q_proj"] = _rand_linear(next(ks), spec.q_dim, D, dtype, spec.attention_bias)
            layer["k_proj"] = _rand_linear(next(ks), spec.kv_dim, D, dtype, spec.attention_bias)
            layer["v_proj"] = _rand_linear(next(ks), spec.kv_dim, D, dtype, spec.attention_bias)
            layer["o_proj"] = _rand_linear(next(ks), D, spec.q_dim, dtype)
        if spec.qk_norm:
            layer["q_norm"] = jnp.ones((spec.head_dim,), dtype)
            layer["k_norm"] = jnp.ones((spec.head_dim,), dtype)
        if spec.layer_is_moe(i):
            E, Fe = spec.num_experts, spec.moe_intermediate_size
            router = _rand_linear(next(ks), E, D, jnp.float32)
            gate = ExpertLinears.stack(
                [_rand_linear(next(ks), Fe, D, dtype) for _ in range(E)])
            up = ExpertLinears.stack(
                [_rand_linear(next(ks), Fe, D, dtype) for _ in range(E)])
            down = ExpertLinears.stack(
                [_rand_linear(next(ks), D, Fe, dtype) for _ in range(E)])
            layer["moe"] = {"router": router, "gate_proj": gate, "up_proj": up,
                            "down_proj": down}
            if spec.scoring_func == "sigmoid":
                layer["moe"]["e_score_correction_bias"] = jnp.zeros((E,), jnp.float32)
            if spec.num_shared_experts:
                Fs = Fe * spec.num_shared_experts
                layer["moe"]["shared_experts"] = {
                    "gate_proj": _rand_linear(next(ks), Fs, D, dtype),
                    "up_proj": _rand_linear(next(ks), Fs, D, dtype),
                    "down_proj": _rand_linear(next(ks), D, Fs, dtype),
                }
        else:
            layer["mlp"] = {
                "gate_proj": _rand_linear(next(ks), Ff, D, dtype, spec.mlp_bias),
                "up_proj": _rand_linear(next(ks), Ff, D, dtype, spec.mlp_bias),
                "down_proj": _rand_linear(next(ks), D, Ff, dtype, spec.mlp_bias),
            }
        layers.append(layer)

    params: Dict[str, Any] = {
        "embed": jax.random.normal(next(ks), (spec.vocab_size, D), jnp.float32).astype(dtype) * 0.02,
        "layers": layers,
        "final_norm": jnp.ones((D,), dtype),
        "lm_head": None if spec.tie_word_embeddings else _rand_linear(next(ks), spec.vocab_size, D, dtype),
    }
    return params
