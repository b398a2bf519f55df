"""Pure-JAX quantization numerics.

The TPU-native replacement for the quantization math the reference reaches
through llmcompressor / compressed-tensors (reference call sites:
``scripts/do_oneshot.py:179-187``, scheme axis in ``configs/recipes/*.yaml``).
Everything here is functional, shape-static and jit-friendly: scale solving,
(fake-)quantization and dequantization for

* INT2..8, symmetric/asymmetric, per tensor / channel / group / token
* FP8 E4M3 per tensor / channel / block(128x128) / dynamic per-token-group
* NVFP4: FP4 E2M1 with 16-wide micro-group scales stored in FP8 E4M3 plus a
  global FP32 second-level scale (strategy ``tensor_group``)

Weights follow the HF convention ``(out_features, in_features)``; reduction
for scales is along ``in_features`` unless the strategy says otherwise.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .scheme import (
    FP4_E2M1_MAX,
    FP8_E4M3_MAX,
    QuantizationArgs,
    QuantStrategy,
    QuantType,
)


class QuantizedTensor(NamedTuple):
    """A quantized tensor plus everything needed to dequantize it.

    ``values`` holds the quantized representation in a wide dtype (int8 for
    int schemes, float32 grid values for float schemes) — packing to the
    on-disk layout (int32 nibbles / uint8 fp4 pairs / float8_e4m3fn) happens
    in :mod:`quantizers_tpu.formats`.
    """

    values: jax.Array
    scale: jax.Array
    zero_point: Optional[jax.Array]
    global_scale: Optional[jax.Array]  # NVFP4 second-level scale
    shape: Tuple[int, ...]  # original (unpadded) shape


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _pad_axis(x: jax.Array, axis: int, multiple: int) -> jax.Array:
    size = x.shape[axis]
    rem = (-size) % multiple
    if rem == 0:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, rem)
    return jnp.pad(x, pads)


def _round_half_away(x: jax.Array) -> jax.Array:
    """Round half away from zero (matches torch.round for .5 cases closely
    enough for quantization grids; jnp.round is banker's rounding)."""
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


def quantize_to_fp8(x: jax.Array) -> jax.Array:
    """Round values to the FP8 E4M3 grid, returned as float32."""
    clipped = jnp.clip(x, -FP8_E4M3_MAX, FP8_E4M3_MAX)
    return clipped.astype(jnp.float8_e4m3fn).astype(jnp.float32)


def quantize_to_fp4(x: jax.Array) -> jax.Array:
    """Round values to the FP4 E2M1 grid {0,±.5,±1,±1.5,±2,±3,±4,±6}."""
    a = jnp.abs(x)
    sign = jnp.sign(x)
    # Midpoint thresholds between adjacent representable magnitudes.
    # 0, .5, 1, 1.5, 2, 3, 4, 6 -> midpoints .25, .75, 1.25, 1.75, 2.5, 3.5, 5
    q = jnp.where(a <= 0.25, 0.0,
        jnp.where(a <= 0.75, 0.5,
        jnp.where(a <= 1.25, 1.0,
        jnp.where(a <= 1.75, 1.5,
        jnp.where(a <= 2.5, 2.0,
        jnp.where(a <= 3.5, 3.0,
        jnp.where(a <= 5.0, 4.0, 6.0)))))))
    return sign * q


# ---------------------------------------------------------------------------
# scale solving
# ---------------------------------------------------------------------------

def compute_scale_zp(
    min_val: jax.Array,
    max_val: jax.Array,
    args: QuantizationArgs,
) -> Tuple[jax.Array, jax.Array]:
    """Solve (scale, zero_point) from observed min/max statistics.

    Follows the compressed-tensors convention: symmetric scale =
    absmax / ((qmax - qmin) / 2); asymmetric scale = (max - min) / (qmax -
    qmin) with zero_point on the integer grid.
    """
    qmin, qmax = args.qrange
    eps = jnp.finfo(jnp.float32).tiny
    min_val = jnp.minimum(min_val, 0.0).astype(jnp.float32)
    max_val = jnp.maximum(max_val, 0.0).astype(jnp.float32)
    if args.symmetric:
        absmax = jnp.maximum(jnp.abs(min_val), jnp.abs(max_val))
        scale = jnp.maximum(absmax / args.scale_divisor, eps)
        zp = jnp.zeros_like(scale, dtype=jnp.int32)
    else:
        scale = jnp.maximum((max_val - min_val) / (qmax - qmin), eps)
        zp = _round_half_away(qmin - min_val / scale).astype(jnp.int32)
        zp = jnp.clip(zp, qmin, qmax)
    return scale, zp


def _grouped(w: jax.Array, group_size: int) -> jax.Array:
    """(out, in) -> (out, n_groups, group_size), padding in-dim if needed."""
    out_f, in_f = w.shape
    w = _pad_axis(w, 1, group_size)
    return w.reshape(out_f, -1, group_size)


def _blocked(w: jax.Array, block: Tuple[int, int]) -> jax.Array:
    """(out, in) -> (nbr, nbc, br, bc) block view, padded."""
    br, bc = block
    w = _pad_axis(_pad_axis(w, 0, br), 1, bc)
    o, i = w.shape
    return w.reshape(o // br, br, i // bc, bc).transpose(0, 2, 1, 3)


def minmax_along(w: jax.Array, args: QuantizationArgs) -> Tuple[jax.Array, jax.Array]:
    """Per-strategy (min, max) reduction of a weight/activation tensor."""
    s = args.strategy
    if s == QuantStrategy.TENSOR:
        return jnp.min(w), jnp.max(w)
    if s == QuantStrategy.CHANNEL:
        return jnp.min(w, axis=-1, keepdims=True), jnp.max(w, axis=-1, keepdims=True)
    if s in (QuantStrategy.GROUP, QuantStrategy.TENSOR_GROUP):
        g = _grouped(w, int(args.group_size))
        return jnp.min(g, axis=-1), jnp.max(g, axis=-1)
    if s == QuantStrategy.BLOCK:
        b = _blocked(w, tuple(args.block_structure))
        return jnp.min(b, axis=(-1, -2)), jnp.max(b, axis=(-1, -2))
    if s == QuantStrategy.TOKEN:
        return jnp.min(w, axis=-1, keepdims=True), jnp.max(w, axis=-1, keepdims=True)
    raise ValueError(f"unsupported strategy {s}")


# ---------------------------------------------------------------------------
# quantize / dequantize
# ---------------------------------------------------------------------------

def _snap(x: jax.Array, args: QuantizationArgs) -> jax.Array:
    """Round a scaled tensor onto the quantized grid."""
    qmin, qmax = args.qrange
    if args.type == QuantType.INT:
        return jnp.clip(_round_half_away(x), qmin, qmax)
    if args.num_bits == 8:
        return quantize_to_fp8(x)
    return quantize_to_fp4(x)


def compute_global_scale(w: jax.Array, args: QuantizationArgs) -> jax.Array:
    """NVFP4 second-level scale: chosen so the per-group FP32 scales map
    into FP8 E4M3 range. global = 448 * 6 / absmax(tensor)."""
    absmax = jnp.maximum(jnp.max(jnp.abs(w)), jnp.finfo(jnp.float32).tiny)
    return (FP8_E4M3_MAX * FP4_E2M1_MAX / absmax).astype(jnp.float32)


def quantize(
    w: jax.Array,
    args: QuantizationArgs,
    scale: Optional[jax.Array] = None,
    zero_point: Optional[jax.Array] = None,
    global_scale: Optional[jax.Array] = None,
) -> QuantizedTensor:
    """Quantize a tensor under ``args``. Solves scales if not given."""
    orig_shape = tuple(w.shape)
    w = w.astype(jnp.float32)
    s = args.strategy

    if s == QuantStrategy.TENSOR_GROUP:
        # NVFP4 two-level scaling.
        if global_scale is None:
            global_scale = compute_global_scale(w, args)
        g = _grouped(w, int(args.group_size))
        if scale is None:
            group_absmax = jnp.max(jnp.abs(g), axis=-1)
            raw_scale = group_absmax / FP4_E2M1_MAX
            # store the scale on the FP8 grid (that is its on-disk dtype)
            scale = quantize_to_fp8(raw_scale * global_scale)
        eff_scale = scale / global_scale
        eff_scale = jnp.maximum(eff_scale, jnp.finfo(jnp.float32).tiny)
        q = _snap(g / eff_scale[..., None], args)
        q = q.reshape(orig_shape[0], -1)[:, : orig_shape[1]]
        return QuantizedTensor(q, scale, None, global_scale, orig_shape)

    if scale is None:
        if args.observer and "mse" in args.observer:
            scale, zero_point = _mse_scale_zp(w, args)
        else:
            mn, mx = minmax_along(w, args)
            scale, zero_point = compute_scale_zp(mn, mx, args)

    if s == QuantStrategy.TENSOR:
        x = w / scale
        if not args.symmetric:
            x = x + zero_point
        q = _snap(x, args)
    elif s in (QuantStrategy.CHANNEL, QuantStrategy.TOKEN):
        x = w / scale
        if not args.symmetric:
            x = x + zero_point
        q = _snap(x, args)
    elif s == QuantStrategy.GROUP:
        g = _grouped(w, int(args.group_size))
        x = g / scale[..., None]
        if not args.symmetric:
            x = x + zero_point[..., None]
        q = _snap(x, args).reshape(orig_shape[0], -1)[:, : orig_shape[1]]
    elif s == QuantStrategy.BLOCK:
        b = _blocked(w, tuple(args.block_structure))
        x = b / scale[..., None, None]
        if not args.symmetric:
            x = x + zero_point[..., None, None]
        q = _snap(x, args)
        nbr, nbc, br, bc = q.shape
        q = q.transpose(0, 2, 1, 3).reshape(nbr * br, nbc * bc)
        q = q[: orig_shape[0], : orig_shape[1]]
    else:
        raise ValueError(f"unsupported strategy {s}")

    if args.type == QuantType.INT:
        q = q.astype(jnp.int8)
    return QuantizedTensor(q, scale, zero_point if not args.symmetric else None, None, orig_shape)


def dequantize(qt: QuantizedTensor, args: QuantizationArgs) -> jax.Array:
    """Dequantize back to float32."""
    q = qt.values.astype(jnp.float32)
    s = args.strategy
    scale = qt.scale.astype(jnp.float32)

    if s == QuantStrategy.TENSOR_GROUP:
        eff_scale = scale / qt.global_scale
        g = _grouped(q, int(args.group_size))
        w = g * eff_scale[..., None]
        return w.reshape(qt.shape[0], -1)[:, : qt.shape[1]]

    if s in (QuantStrategy.TENSOR, QuantStrategy.CHANNEL, QuantStrategy.TOKEN):
        if qt.zero_point is not None:
            q = q - qt.zero_point
        return q * scale
    if s == QuantStrategy.GROUP:
        g = _grouped(q, int(args.group_size))
        if qt.zero_point is not None:
            g = g - qt.zero_point[..., None]
        w = g * scale[..., None]
        return w.reshape(qt.shape[0], -1)[:, : qt.shape[1]]
    if s == QuantStrategy.BLOCK:
        br, bc = tuple(args.block_structure)
        qp = _blocked(q, (br, bc))
        if qt.zero_point is not None:
            qp = qp - qt.zero_point[..., None, None]
        w = qp * scale[..., None, None]
        nbr, nbc, brr, bcc = w.shape
        w = w.transpose(0, 2, 1, 3).reshape(nbr * brr, nbc * bcc)
        return w[: qt.shape[0], : qt.shape[1]]
    raise ValueError(f"unsupported strategy {s}")


def _reduce_err_to_scale(err: jax.Array, args: QuantizationArgs) -> jax.Array:
    """Sum a per-element error tensor down to the scale grid's shape."""
    s = args.strategy
    if s == QuantStrategy.TENSOR:
        return jnp.sum(err)
    if s in (QuantStrategy.CHANNEL, QuantStrategy.TOKEN):
        return jnp.sum(err, axis=-1, keepdims=True)
    if s == QuantStrategy.GROUP:
        return jnp.sum(_grouped(err, int(args.group_size)), axis=-1)
    if s == QuantStrategy.BLOCK:
        return jnp.sum(_blocked(err, tuple(args.block_structure)), axis=(-1, -2))
    raise ValueError(f"mse observer unsupported for strategy {s}")


def _mse_scale_zp(w: jax.Array, args: QuantizationArgs,
                  num_grid: int = 12, shrink_min: float = 0.4
                  ) -> Tuple[jax.Array, jax.Array]:
    """Data-aware MSE observer: per scale cell, pick the clip ratio on the
    minmax envelope minimizing the actual quantization error (the
    `observer: mse` option of the reference's recipe dialect)."""
    mn0, mx0 = minmax_along(w, args)
    best_scale = best_zp = None
    best_err = None
    for i in range(num_grid):
        r = shrink_min + (1.0 - shrink_min) * (i + 1) / num_grid
        s_i, zp_i = compute_scale_zp(mn0 * r, mx0 * r, args)
        qt = quantize(w, args, scale=s_i,
                      zero_point=None if args.symmetric else zp_i)
        deq = dequantize(qt, args)
        err = _reduce_err_to_scale((deq - w.astype(jnp.float32)) ** 2, args)
        if best_err is None:
            best_scale, best_zp, best_err = s_i, zp_i, err
        else:
            better = err < best_err
            best_scale = jnp.where(better, s_i, best_scale)
            best_zp = jnp.where(better, zp_i, best_zp)
            best_err = jnp.minimum(err, best_err)
    return best_scale, best_zp


def fake_quantize(
    w: jax.Array,
    args: QuantizationArgs,
    scale: Optional[jax.Array] = None,
    zero_point: Optional[jax.Array] = None,
    global_scale: Optional[jax.Array] = None,
) -> jax.Array:
    """quantize → dequantize in the original dtype (QDQ)."""
    qt = quantize(w, args, scale=scale, zero_point=zero_point, global_scale=global_scale)
    return dequantize(qt, args).astype(w.dtype)


# ---------------------------------------------------------------------------
# dynamic activation quantization (used by serving kernels / tests)
# ---------------------------------------------------------------------------

def dynamic_quantize_token_fp8(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-token dynamic FP8: x [..., d] -> (fp8 values, per-token scale)."""
    absmax = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True), 1e-12)
    scale = (absmax / FP8_E4M3_MAX).astype(jnp.float32)
    q = (x / scale).astype(jnp.float8_e4m3fn)
    return q, scale


def dynamic_quantize_group_fp8(x: jax.Array, group_size: int = 128) -> Tuple[jax.Array, jax.Array]:
    """Per-token-group dynamic FP8 (FP8_BLOCK activation side)."""
    orig = x.shape
    x = _pad_axis(x, x.ndim - 1, group_size)
    g = x.reshape(*x.shape[:-1], -1, group_size)
    absmax = jnp.maximum(jnp.max(jnp.abs(g), axis=-1, keepdims=True), 1e-12)
    scale = (absmax / FP8_E4M3_MAX).astype(jnp.float32)
    q = (g / scale).astype(jnp.float8_e4m3fn)
    q = q.reshape(*x.shape)[..., : orig[-1]]
    return q, scale.squeeze(-1)


def dynamic_quantize_token_int8(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-token dynamic symmetric INT8."""
    absmax = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True), 1e-12)
    scale = (absmax / 127.5).astype(jnp.float32)
    q = jnp.clip(_round_half_away(x / scale), -128, 127).astype(jnp.int8)
    return q, scale
