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


def quant_matmul(x: jax.Array, lin: QuantLinear, use_kernel: Optional[bool] = None) -> jax.Array:
    """x (..., K) @ W^T -> (..., N)."""
    if use_kernel is None:
        use_kernel = _on_tpu() and lin.kind in _KERNEL_KINDS
    if use_kernel and lin.kind in _KERNEL_KINDS:
        from . import kernels

        fn = kernels.KERNELS.get(lin.kind)
        if fn is not None:
            try:
                return fn(x, lin)
            except kernels.KernelUnsupported:
                pass
    return xla_quant_matmul(x, lin)
