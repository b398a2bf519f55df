"""Mesh construction + PartitionSpec rules for quantized model pytrees.

Sharding scheme (Megatron-style, expressed as GSPMD annotations):

* column-parallel projections (``q/k/v/gate/up``, ``lm_head``): output
  features (axis 1 of every ``(K…, N)``-shaped leaf — packed weights,
  scales, zero points alike) sharded over ``tp``; bias over ``tp``.
* row-parallel projections (``o_proj``, ``down_proj``): contraction axis
  (axis 0) over ``tp`` — XLA inserts the psum/reduce-scatter after the
  matmul.
* MoE expert stacks (:class:`~quantizers_tpu.models.moe.ExpertLinears`):
  leading expert axis over ``ep`` (expert parallelism); falls back to
  ``tp`` when the mesh has no ``ep`` axis.
* embeddings/norms replicated; activations sharded over ``dp`` (batch).

W4 packed layouts keep their K-halves interleaved across shards; GSPMD
resolves the concat in ``dequantize`` with local slices because both
nibble planes shard identically. Scales/zero-points follow their weight's
partitioned axis.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import ModelSpec
from ..models.moe import ExpertLinears
from ..ops.linear import QuantLinear

COLUMN_PARALLEL = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj", "lm_head")
ROW_PARALLEL = ("o_proj", "down_proj")


def make_mesh(axis_sizes: Dict[str, int], devices: Optional[Sequence[Any]] = None) -> Mesh:
    """Build a named mesh, e.g. ``make_mesh({"dp": 2, "tp": 4})``."""
    devices = list(devices if devices is not None else jax.devices())
    n = int(np.prod(list(axis_sizes.values())))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(tuple(axis_sizes.values()))
    return Mesh(arr, tuple(axis_sizes.keys()))


def _tp(mesh: Mesh) -> Optional[str]:
    return "tp" if "tp" in mesh.axis_names else None


def _ep(mesh: Mesh) -> Optional[str]:
    if "ep" in mesh.axis_names:
        return "ep"
    return _tp(mesh)


def _linear_pspecs(lin: QuantLinear, shard_axis: int, axis_name: Optional[str],
                   expert_axis: Optional[str] = None) -> QuantLinear:
    """Build a QuantLinear whose leaves are PartitionSpecs.

    ``shard_axis``: 1 = column-parallel (shard N), 0 = row-parallel
    (shard K / scale rows). ``expert_axis`` prepends an expert dim."""

    def spec_for(arr: Optional[Any], n_axis_dims: int) -> Optional[P]:
        if arr is None:
            return None
        dims: List[Optional[str]] = [None] * n_axis_dims
        if axis_name is not None and n_axis_dims >= 1:
            if shard_axis == 1:
                dims[-1] = axis_name
            else:
                dims[0] = axis_name
        if expert_axis is not None:
            dims = [expert_axis] + dims
        return P(*dims)

    off = 1 if expert_axis is not None else 0

    def nd(arr):
        return arr.ndim - off

    bias_spec = None
    if lin.bias is not None:
        # bias is over output features: sharded only for column-parallel
        dims = [axis_name if (shard_axis == 1 and axis_name) else None]
        if expert_axis is not None:
            dims = [expert_axis] + dims
        bias_spec = P(*dims)

    return QuantLinear(
        kind=lin.kind,
        weight=spec_for(lin.weight, nd(lin.weight)),
        scale=None if lin.scale is None else spec_for(lin.scale, nd(lin.scale)),
        zero_point=None if lin.zero_point is None else spec_for(lin.zero_point, nd(lin.zero_point)),
        bias=bias_spec,
        meta=lin.meta,
    )


def param_pspecs(spec: ModelSpec, params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """PartitionSpec pytree matching ``params``' structure."""
    tp = _tp(mesh)
    ep = _ep(mesh)

    def for_layer(i: int, layer: Dict[str, Any]) -> Dict[str, Any]:
        out: Dict[str, Any] = {
            "input_layernorm": P(None),
            "post_attention_layernorm": P(None),
        }
        if spec.qk_norm:
            out["q_norm"] = P(None)
            out["k_norm"] = P(None)
        if spec.is_mla:
            # MLA: the low-rank `a` projections output a head-shared latent
            # (replicated); the `b` expansions are column-parallel over
            # heads; o_proj row-parallel over H*v_head_dim.
            if spec.q_lora_rank:
                out["q_a_proj"] = _linear_pspecs(layer["q_a_proj"], 1, None)
                out["q_a_layernorm"] = P(None)
                out["q_b_proj"] = _linear_pspecs(layer["q_b_proj"], 1, tp)
            else:
                out["q_proj"] = _linear_pspecs(layer["q_proj"], 1, tp)
            out["kv_a_proj_with_mqa"] = _linear_pspecs(layer["kv_a_proj_with_mqa"], 1, None)
            out["kv_a_layernorm"] = P(None)
            out["kv_b_proj"] = _linear_pspecs(layer["kv_b_proj"], 1, tp)
            if "mla_absorb" in layer:
                # absorbed-decode weights: head axis over tp, matching the
                # column-parallel kv_b split they were derived from
                out["mla_absorb"] = {"w_uk_t": P(tp, None, None),
                                     "w_uv": P(tp, None, None)}
        elif "qkv_proj" in layer:
            # fused decode layout (fuse_for_decode): one column-parallel
            # concat; GSPMD reshards the in-kernel q/k/v slices as needed
            out["qkv_proj"] = _linear_pspecs(layer["qkv_proj"], 1, tp)
        else:
            for name in ("q_proj", "k_proj", "v_proj"):
                out[name] = _linear_pspecs(layer[name], 1, tp)
        out["o_proj"] = _linear_pspecs(layer["o_proj"], 0, tp)
        if spec.layer_is_moe(i):
            moe = layer["moe"]
            mout: Dict[str, Any] = {"router": _linear_pspecs(moe["router"], 1, None)}
            if "e_score_correction_bias" in moe:
                mout["e_score_correction_bias"] = P(None)
            if "shared_experts" in moe:
                mout["shared_experts"] = {
                    "gate_proj": _linear_pspecs(moe["shared_experts"]["gate_proj"], 1, tp),
                    "up_proj": _linear_pspecs(moe["shared_experts"]["up_proj"], 1, tp),
                    "down_proj": _linear_pspecs(moe["shared_experts"]["down_proj"], 0, tp),
                }
            for name in ("gate_proj", "up_proj"):
                el: ExpertLinears = moe[name]
                lin2d = el.expert(0)
                px = _linear_pspecs(lin2d, 1, None, expert_axis=ep)
                mout[name] = ExpertLinears(kind=el.kind, weight=px.weight,
                                           scale=px.scale, zero_point=px.zero_point,
                                           bias=px.bias, meta=el.meta)
            el = moe["down_proj"]
            px = _linear_pspecs(el.expert(0), 0, None, expert_axis=ep)
            mout["down_proj"] = ExpertLinears(kind=el.kind, weight=px.weight,
                                              scale=px.scale, zero_point=px.zero_point,
                                              bias=px.bias, meta=el.meta)
            out["moe"] = mout
        else:
            mlp = layer["mlp"]
            if "gateup_proj" in mlp:
                out["mlp"] = {
                    "gateup_proj": _linear_pspecs(mlp["gateup_proj"], 1, tp),
                    "down_proj": _linear_pspecs(mlp["down_proj"], 0, tp),
                }
            else:
                out["mlp"] = {
                    "gate_proj": _linear_pspecs(mlp["gate_proj"], 1, tp),
                    "up_proj": _linear_pspecs(mlp["up_proj"], 1, tp),
                    "down_proj": _linear_pspecs(mlp["down_proj"], 0, tp),
                }
        return out

    return {
        "embed": P(None, None),
        "layers": [for_layer(i, l) for i, l in enumerate(params["layers"])],
        "final_norm": P(None),
        "lm_head": None if params.get("lm_head") is None
        else _linear_pspecs(params["lm_head"], 1, tp),
    }


def activation_pspec(mesh: Mesh, ndim: int = 3) -> P:
    """Batch-sharded activations: (B, T, D) → P('dp', None, None)."""
    dp = "dp" if "dp" in mesh.axis_names else None
    return P(*([dp] + [None] * (ndim - 1)))


def kv_cache_pspecs(mesh: Mesh) -> Any:
    """KV cache (B, H_kv, S, hd) head-major: batch over dp, heads over tp."""
    dp = "dp" if "dp" in mesh.axis_names else None
    tp = _tp(mesh)
    from ..models.transformer import KVCache

    return KVCache(
        k=P(dp, tp, None, None),
        v=P(dp, tp, None, None),
        length=P(),
        k_scale=None,
        v_scale=None,
    )


def shard_params(spec: ModelSpec, params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """device_put the params under the sharding rules."""
    pspecs = param_pspecs(spec, params, mesh)

    def put(x, p):
        p = compatible_pspec(p, getattr(x, "shape", ()), mesh)
        return jax.device_put(x, NamedSharding(mesh, p))

    return jax.tree_util.tree_map(put, params, pspecs)


def compatible_pspec(p: P, shape: Tuple[int, ...], mesh: Mesh) -> P:
    """Drop mesh axes a dimension can't be divided by (e.g. a tiny scale
    grid (K/g, N) with K/g < tp) — replicate instead of erroring."""
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    dims = []
    for i, axis in enumerate(tuple(p) + (None,) * (len(shape) - len(tuple(p)))):
        if axis is None:
            dims.append(None)
            continue
        n = sizes.get(axis, 1)
        dims.append(axis if (i < len(shape) and shape[i] % n == 0) else None)
    return P(*dims)
