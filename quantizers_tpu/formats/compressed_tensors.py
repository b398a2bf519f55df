"""compressed-tensors on-disk format: packing, per-format serialization and
the ``quantization_config`` JSON schema.

Interop contract with vLLM and with the reference's published checkpoints
(schema spec observed at reference
``scripts/recombine_weights_MiniMax-M2.1.py:54-65,82-138``):

* ``pack-quantized`` (INT<8 weights): quintuple ``weight_packed`` (int32, 8
  nibbles per word along the in-features axis, values offset to unsigned),
  ``weight_scale``, ``weight_shape`` (int64 [2]), plus ``weight_zero_point``
  (packed, asymmetric only) and ``weight_g_idx`` (int32, actorder only);
* ``float-quantized`` (FP8): ``weight`` stored as F8_E4M3 + ``weight_scale``
  (f32; block strategy → scale grid [ceil(out/br), ceil(in/bc)]);
* ``nvfp4-pack-quantized``: ``weight_packed`` (uint8, two E2M1 codes per
  byte, low nibble first), ``weight_scale`` (F8_E4M3 per 16-group),
  ``weight_global_scale`` (f32 [1]);
* config: ``quantization_config`` with ``quant_method: compressed-tensors``,
  ``config_groups``, ``format`` (or ``mixed-precision``), ``ignore``,
  ``kv_cache_scheme``, ``quantization_status: compressed``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import ml_dtypes
import numpy as np

from ..core.numerics import QuantizedTensor
from ..core.scheme import (
    ActOrder,
    QuantizationArgs,
    QuantScheme,
    QuantStrategy,
    QuantType,
    infer_format,
)

COMPRESSION_VERSION = "0.13.1"
QUANT_METHOD = "compressed-tensors"


# ---------------------------------------------------------------------------
# bit packing
# ---------------------------------------------------------------------------

def pack_int_to_int32(values: np.ndarray, num_bits: int) -> np.ndarray:
    """Pack signed sub-byte integers along the last axis into int32 words.

    Values are offset to unsigned (v + 2^(b-1)) and laid out little-endian
    within each word: element ``j`` of a word sits at bits ``b*j`` — the
    compressed-tensors layout.
    """
    if num_bits not in (2, 4, 8):
        raise ValueError(f"pack supports 2/4/8 bits, got {num_bits}")
    per_word = 32 // num_bits
    offset = 1 << (num_bits - 1)

    u = (values.astype(np.int32) + offset).astype(np.uint32)
    rows, cols = u.shape
    pad = (-cols) % per_word
    if pad:
        u = np.pad(u, ((0, 0), (0, pad)))
    u = u.reshape(rows, -1, per_word)

    shifts = (np.arange(per_word, dtype=np.uint32) * num_bits)[None, None, :]
    packed = np.bitwise_or.reduce(u << shifts, axis=-1)
    return packed.astype(np.int32)


def unpack_int32_to_int(packed: np.ndarray, num_bits: int, original_cols: int) -> np.ndarray:
    """Inverse of :func:`pack_int_to_int32`; returns signed int8."""
    per_word = 32 // num_bits
    offset = 1 << (num_bits - 1)
    mask = (1 << num_bits) - 1

    u = packed.astype(np.uint32)
    shifts = (np.arange(per_word, dtype=np.uint32) * num_bits)[None, None, :]
    vals = (u[..., None] >> shifts) & mask
    vals = vals.reshape(packed.shape[0], -1)[:, :original_cols]
    return (vals.astype(np.int32) - offset).astype(np.int8)


# FP4 E2M1 code points: index = sign<<3 | magnitude-code
_FP4_LUT = np.array([0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0], dtype=np.float32)


def fp4_encode(values: np.ndarray) -> np.ndarray:
    """float values (already on the E2M1 grid) -> 4-bit codes (uint8 0..15)."""
    a = np.abs(values.astype(np.float32))
    mag = np.argmin(np.abs(a[..., None] - _FP4_LUT[None, :]), axis=-1).astype(np.uint8)
    sign = (values < 0).astype(np.uint8) << 3
    return sign | mag


def fp4_decode(codes: np.ndarray) -> np.ndarray:
    mag = _FP4_LUT[codes & 0x7]
    sign = np.where(codes & 0x8, -1.0, 1.0).astype(np.float32)
    return sign * mag


def pack_fp4_to_uint8(values: np.ndarray) -> np.ndarray:
    """Two E2M1 codes per byte along the last axis, low nibble = even index."""
    codes = fp4_encode(values)
    rows, cols = codes.shape
    if cols % 2:
        codes = np.pad(codes, ((0, 0), (0, 1)))
    lo = codes[:, 0::2]
    hi = codes[:, 1::2]
    return (lo | (hi << 4)).astype(np.uint8)


def unpack_uint8_to_fp4(packed: np.ndarray, original_cols: int) -> np.ndarray:
    lo = packed & 0x0F
    hi = (packed >> 4) & 0x0F
    codes = np.empty((packed.shape[0], packed.shape[1] * 2), dtype=np.uint8)
    codes[:, 0::2] = lo
    codes[:, 1::2] = hi
    return fp4_decode(codes[:, :original_cols])


# ---------------------------------------------------------------------------
# per-format compress / decompress
# ---------------------------------------------------------------------------

def compress_tensor(
    prefix: str,
    qt: QuantizedTensor,
    args: QuantizationArgs,
    scale_dtype: Any = ml_dtypes.bfloat16,
) -> Dict[str, np.ndarray]:
    """Serialize one quantized weight into its on-disk parameter set.

    ``prefix`` is the module path (e.g. ``model.layers.0.mlp.down_proj``).
    """
    fmt = infer_format(QuantScheme(weights=args))
    out: Dict[str, np.ndarray] = {}
    values = np.asarray(qt.values)
    scale = np.asarray(qt.scale)
    rows, cols = qt.shape

    if fmt == "pack-quantized":
        out[f"{prefix}.weight_packed"] = pack_int_to_int32(values, args.num_bits)
        out[f"{prefix}.weight_scale"] = scale.astype(scale_dtype)
        out[f"{prefix}.weight_shape"] = np.asarray([rows, cols], dtype=np.int64)
        if qt.zero_point is not None and not args.symmetric:
            out[f"{prefix}.weight_zero_point"] = pack_int_to_int32(
                np.asarray(qt.zero_point).astype(np.int8), args.num_bits
            )
        if args.actorder == ActOrder.GROUP or args.actorder == ActOrder.WEIGHT:
            # caller stores the permutation on qt via g_idx attribute-free
            # channel; written separately by the checkpoint writer.
            pass
    elif fmt == "nvfp4-pack-quantized":
        out[f"{prefix}.weight_packed"] = pack_fp4_to_uint8(values)
        out[f"{prefix}.weight_scale"] = scale.astype(ml_dtypes.float8_e4m3fn)
        out[f"{prefix}.weight_global_scale"] = np.asarray(
            [float(np.asarray(qt.global_scale))], dtype=np.float32
        )
        out[f"{prefix}.weight_shape"] = np.asarray([rows, cols], dtype=np.int64)
    elif fmt == "float-quantized":
        out[f"{prefix}.weight"] = values.astype(ml_dtypes.float8_e4m3fn)
        out[f"{prefix}.weight_scale"] = scale.astype(np.float32)
        if qt.zero_point is not None and not args.symmetric:
            out[f"{prefix}.weight_zero_point"] = np.asarray(qt.zero_point, dtype=np.float32)
    elif fmt == "int-quantized":
        out[f"{prefix}.weight"] = values.astype(np.int8)
        out[f"{prefix}.weight_scale"] = scale.astype(scale_dtype)
        if qt.zero_point is not None and not args.symmetric:
            out[f"{prefix}.weight_zero_point"] = np.asarray(qt.zero_point, dtype=np.int8)
    else:
        raise ValueError(f"unsupported serialization format {fmt}")
    return out


def decompress_tensor(
    prefix: str,
    tensors: Dict[str, np.ndarray],
    args: QuantizationArgs,
) -> QuantizedTensor:
    """Rebuild a :class:`QuantizedTensor` from on-disk parameters.

    Accepts both ``weight_scale`` and DeepSeek-style ``weight_scale_inv``
    (reciprocal) spellings for FP8 block checkpoints — the rename handled by
    the reference merger (``recombine_weights_MiniMax-M2.1.py:44-46``).
    """
    fmt = infer_format(QuantScheme(weights=args))

    def grab(suffix: str) -> Optional[np.ndarray]:
        return tensors.get(f"{prefix}.{suffix}")

    if fmt == "pack-quantized":
        packed = grab("weight_packed")
        shape = grab("weight_shape")
        rows, cols = (int(shape[0]), int(shape[1]))
        values = unpack_int32_to_int(packed, args.num_bits, cols)[:rows]
        scale = grab("weight_scale").astype(np.float32)
        zp_packed = grab("weight_zero_point")
        zp = None
        if zp_packed is not None and not args.symmetric:
            n_groups = scale.shape[-1] if scale.ndim > 1 else 1
            zp = unpack_int32_to_int(zp_packed, args.num_bits, n_groups).astype(np.int32)
        return QuantizedTensor(values, scale, zp, None, (rows, cols))

    if fmt == "nvfp4-pack-quantized":
        packed = grab("weight_packed")
        shape = grab("weight_shape")
        if shape is not None:
            rows, cols = int(shape[0]), int(shape[1])
        else:
            rows, cols = packed.shape[0], packed.shape[1] * 2
        values = unpack_uint8_to_fp4(packed, cols)[:rows]
        scale = grab("weight_scale").astype(np.float32)
        gscale = grab("weight_global_scale")
        g = np.float32(gscale.reshape(-1)[0]) if gscale is not None else np.float32(1.0)
        return QuantizedTensor(values, scale, None, g, (rows, cols))

    if fmt in ("float-quantized", "int-quantized"):
        w = grab("weight")
        scale = grab("weight_scale")
        if scale is None:
            scale_inv = grab("weight_scale_inv")
            if scale_inv is None:
                raise KeyError(f"{prefix}: no weight_scale / weight_scale_inv found")
            scale = scale_inv  # DeepSeek 'scale_inv' is the multiplicative dequant factor
        zp = grab("weight_zero_point")
        vals = w.astype(np.float32) if fmt == "float-quantized" else w.astype(np.int8)
        return QuantizedTensor(vals, scale.astype(np.float32), zp, None, tuple(w.shape))

    raise ValueError(f"unsupported serialization format {fmt}")


def dequantize_numpy(qt: QuantizedTensor, args: QuantizationArgs) -> np.ndarray:
    """Host-side dequantize (numpy, no jit) for tooling paths."""
    import jax.numpy as jnp

    from ..core.numerics import dequantize

    jt = QuantizedTensor(
        jnp.asarray(np.asarray(qt.values, dtype=np.float32) if np.asarray(qt.values).dtype != np.int8 else np.asarray(qt.values)),
        jnp.asarray(np.asarray(qt.scale, dtype=np.float32)),
        None if qt.zero_point is None else jnp.asarray(np.asarray(qt.zero_point)),
        None if qt.global_scale is None else jnp.asarray(np.asarray(qt.global_scale, dtype=np.float32)),
        qt.shape,
    )
    return np.asarray(dequantize(jt, args))


# ---------------------------------------------------------------------------
# quantization_config schema
# ---------------------------------------------------------------------------

def build_quantization_config(
    config_groups: Dict[str, QuantScheme],
    ignore: List[str],
    kv_cache_scheme: Optional[QuantizationArgs] = None,
    global_compression_ratio: Optional[float] = None,
) -> Dict[str, Any]:
    """Build the ``quantization_config`` block written into ``config.json``."""
    groups_json: Dict[str, Any] = {}
    formats = set()
    for name, scheme in config_groups.items():
        d = scheme.to_dict()
        formats.add(d["format"])
        groups_json[name] = d

    overall_format = formats.pop() if len(formats) == 1 else "mixed-precision"
    return {
        "quant_method": QUANT_METHOD,
        "format": overall_format,
        "quantization_status": "compressed",
        "config_groups": groups_json,
        "ignore": list(ignore or []),
        "kv_cache_scheme": kv_cache_scheme.to_dict() if kv_cache_scheme else None,
        "global_compression_ratio": global_compression_ratio,
        "sparsity_config": {},
        "transform_config": {},
        "version": COMPRESSION_VERSION,
    }


def parse_quantization_config(qcfg: Dict[str, Any]) -> Tuple[Dict[str, QuantScheme], List[str], Optional[QuantizationArgs]]:
    """Inverse of :func:`build_quantization_config` (also reads configs the
    reference's pipeline produced via llmcompressor)."""
    groups = {
        name: QuantScheme.from_dict(body)
        for name, body in (qcfg.get("config_groups") or {}).items()
    }
    ignore = list(qcfg.get("ignore") or [])
    kv = qcfg.get("kv_cache_scheme")
    kv_args = QuantizationArgs.from_dict(kv) if kv else None
    return groups, ignore, kv_args


def compression_ratio(
    schemes_by_param: Dict[str, QuantizationArgs], param_sizes: Dict[str, int], base_bits: int = 16
) -> float:
    """Rough global compression ratio: weighted bits-per-weight vs base."""
    total = 0
    compressed = 0.0
    for name, size in param_sizes.items():
        total += size * base_bits
        args = schemes_by_param.get(name)
        if args is None:
            compressed += size * base_bits
        else:
            bits = args.num_bits
            if args.strategy in (QuantStrategy.GROUP, QuantStrategy.TENSOR_GROUP) and args.group_size:
                scale_bits = 8 if args.type == QuantType.FLOAT else 16
                bits += scale_bits / args.group_size
            compressed += size * bits
    return total / max(compressed, 1.0)
