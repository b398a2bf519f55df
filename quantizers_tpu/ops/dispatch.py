"""Kernel dispatch: route a quantized matmul to the fused Pallas kernel on
TPU or to the XLA dequant+matmul reference elsewhere.

The XLA path is the correctness oracle: every Pallas kernel is tested
against it (interpret mode on CPU, compiled on TPU)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .linear import QuantLinear

_KERNEL_KINDS = {"w4", "w8", "nvfp4", "fp8"}


def _on_tpu() -> bool:
    try:
        # "axon" is a tunneled TPU PJRT plugin (device_kind "TPU v5 lite")
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def xla_quant_matmul(x: jax.Array, lin: QuantLinear) -> jax.Array:
    """Reference path: dequantize W^T to bf16 and let XLA hit the MXU."""
    wt = lin.dequantize(dtype=jnp.bfloat16)
    return jnp.dot(x.astype(jnp.bfloat16), wt, preferred_element_type=jnp.float32).astype(x.dtype)


def w8a8_token_matmul(x: jax.Array, lin: QuantLinear) -> jax.Array:
    """W8A8 compute path: dynamic per-token symmetric int8 activations ×
    per-channel int8 weights, accumulated in int32.

    XLA lowers the int8×int8→int32 ``dot_general`` onto the MXU's
    double-rate int8 pipe (v5e: 394 int8 TOPS vs 197 bf16), so prefill /
    calibration forwards through W8A8 layers run at up to 2× the bf16
    matmul rate instead of paying a dequant *and* a bf16-rate dot. The
    integer math is exact and platform-independent — CPU tests certify
    the TPU numerics bit-for-bit. Scheme semantics follow the
    compressed-tensors W8A8 preset (`core/scheme.py` PRESET_SCHEMES;
    reference exercises the zoo via llmcompressor recipes,
    `main_seed-oss-fp8-kv8.py:168-202` style)."""
    from ..core.numerics import dynamic_quantize_token_int8

    xq, sx = dynamic_quantize_token_int8(x.astype(jnp.float32))
    y32 = jax.lax.dot_general(
        xq, lin.weight, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    sw = lin.scale.astype(jnp.float32).reshape(-1)  # (1, N) -> (N,)
    return (y32.astype(jnp.float32) * sx * sw).astype(x.dtype)


def quant_matmul(x: jax.Array, lin: QuantLinear, use_kernel: Optional[bool] = None) -> jax.Array:
    """x (..., K) @ W^T -> (..., N).

    ``use_kernel=False`` forces the weight-dequant bf16 reference path —
    for W8A8 that is the A16 oracle (activation quantization skipped),
    used to isolate activation-quant damage in tests."""
    if (use_kernel is not False and lin.kind == "w8"
            and lin.zero_point is None):
        md = lin.meta_dict
        if md.get("act") == "token_i8" and not md.get("group_size"):
            return w8a8_token_matmul(x, lin)
    if use_kernel is None:
        use_kernel = _on_tpu() and lin.kind in _KERNEL_KINDS
        # The Pallas kernels are DECODE kernels: they re-dequantize each
        # weight tile once per 128-row m-block, which is optimal when the
        # matmul is weight-bandwidth-bound (m <= ~512) and loses to
        # dequant-once + MXU matmul as m grows (prefill/calibration:
        # measured on v5e at m=4096 the XLA path is 1.4-2.0x faster —
        # 69 vs 35 TF/s at K=9728, 44 vs 32 at N=9728; crossover sits
        # between 512 and 1024 rows for every Qwen3-4B shape).
        m = 1
        for d in x.shape[:-1]:
            m *= d
        if m > 512:
            use_kernel = False
    if use_kernel and lin.kind in _KERNEL_KINDS:
        from . import kernels

        fn = kernels.KERNELS.get(lin.kind)
        if fn is not None:
            try:
                return fn(x, lin)
            except kernels.KernelUnsupported:
                pass
    return xla_quant_matmul(x, lin)
