"""Checkpoint → params-pytree loaders.

Replaces the reference's ``AutoModelForCausalLM.from_pretrained`` boundary
(``scripts/do_oneshot.py:82-96``): loads either a plain HF bf16 safetensors
checkpoint or a compressed-tensors checkpoint (ours / vLLM's / one produced
by the reference pipeline) directly into the functional transformer's
params, with quantized weights landing in kernel-ready
:class:`~quantizers_tpu.ops.linear.QuantLinear` layouts — no torch, no
intermediate dequantization.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np

from ..formats.checkpoint import CompressedModelReader
from ..formats.safetensors_io import ShardedReader
from ..ops.linear import QuantLinear, dense_linear, from_quantized
from .config import ModelSpec
from .moe import ExpertLinears

logger = logging.getLogger(__name__)


def _build_params(
    spec: ModelSpec,
    get_array: Callable[[str], Optional[np.ndarray]],
    get_linear: Callable[[str], Optional[QuantLinear]],
    dtype=jnp.bfloat16,
) -> Dict[str, Any]:
    """Assemble the params pytree from name-addressed accessors."""

    def arr(name: str, required: bool = True) -> Optional[jnp.ndarray]:
        a = get_array(name)
        if a is None:
            if required:
                raise KeyError(f"missing tensor {name}")
            return None
        return jnp.asarray(a, dtype=dtype)

    def lin(prefix: str, required: bool = True) -> Optional[QuantLinear]:
        l = get_linear(prefix)
        if l is None and required:
            raise KeyError(f"missing linear {prefix}")
        return l

    layers: List[Dict[str, Any]] = []
    for i in range(spec.num_layers):
        p = f"model.layers.{i}"
        layer: Dict[str, Any] = {
            "input_layernorm": arr(f"{p}.input_layernorm.weight"),
            "post_attention_layernorm": arr(f"{p}.post_attention_layernorm.weight"),
            "o_proj": lin(f"{p}.self_attn.o_proj"),
        }
        if spec.is_mla:
            a = f"{p}.self_attn"
            if spec.q_lora_rank:
                layer["q_a_proj"] = lin(f"{a}.q_a_proj")
                layer["q_a_layernorm"] = arr(f"{a}.q_a_layernorm.weight")
                layer["q_b_proj"] = lin(f"{a}.q_b_proj")
            else:
                layer["q_proj"] = lin(f"{a}.q_proj")
            layer["kv_a_proj_with_mqa"] = lin(f"{a}.kv_a_proj_with_mqa")
            layer["kv_a_layernorm"] = arr(f"{a}.kv_a_layernorm.weight")
            layer["kv_b_proj"] = lin(f"{a}.kv_b_proj")
        else:
            layer["q_proj"] = lin(f"{p}.self_attn.q_proj")
            layer["k_proj"] = lin(f"{p}.self_attn.k_proj")
            layer["v_proj"] = lin(f"{p}.self_attn.v_proj")
        if spec.qk_norm:
            layer["q_norm"] = arr(f"{p}.self_attn.q_norm.weight")
            layer["k_norm"] = arr(f"{p}.self_attn.k_norm.weight")
        if spec.layer_is_moe(i):
            router = lin(f"{p}.mlp.gate")
            experts: Dict[str, List[QuantLinear]] = {"gate_proj": [], "up_proj": [], "down_proj": []}
            for e in range(spec.num_experts):
                for proj in experts:
                    experts[proj].append(lin(f"{p}.mlp.experts.{e}.{proj}"))
            layer["moe"] = {
                "router": router,
                **{proj: ExpertLinears.stack(lins) for proj, lins in experts.items()},
            }
            bias = get_array(f"{p}.mlp.gate.e_score_correction_bias")
            if bias is not None:
                layer["moe"]["e_score_correction_bias"] = jnp.asarray(bias, jnp.float32)
            if spec.num_shared_experts:
                layer["moe"]["shared_experts"] = {
                    proj: lin(f"{p}.mlp.shared_experts.{proj}")
                    for proj in ("gate_proj", "up_proj", "down_proj")
                }
        else:
            layer["mlp"] = {
                "gate_proj": lin(f"{p}.mlp.gate_proj"),
                "up_proj": lin(f"{p}.mlp.up_proj"),
                "down_proj": lin(f"{p}.mlp.down_proj"),
            }
        layers.append(layer)

    embed_w = arr("model.embed_tokens.weight")
    lm_head = None
    if not spec.tie_word_embeddings:
        lm_head = lin("lm_head", required=False)
        if lm_head is None:
            logger.info("no lm_head found; falling back to tied embeddings")
    return {
        "embed": embed_w,
        "layers": layers,
        "final_norm": arr("model.norm.weight"),
        "lm_head": lm_head,
    }


# ---------------------------------------------------------------------------
# plain HF checkpoint
# ---------------------------------------------------------------------------

def load_hf_model(ckpt_dir: Union[str, Path], spec: Optional[ModelSpec] = None,
                  dtype=jnp.bfloat16) -> Tuple[ModelSpec, Dict[str, Any]]:
    """Load a local HF-format (bf16 safetensors) checkpoint directory."""
    ckpt_dir = Path(ckpt_dir)
    spec = spec or ModelSpec.from_hf_config(ckpt_dir)
    with ShardedReader(ckpt_dir) as reader:
        keys = set(reader.keys())

        def get_array(name: str) -> Optional[np.ndarray]:
            return reader.get(name) if name in keys else None

        def get_linear(prefix: str) -> Optional[QuantLinear]:
            wname = f"{prefix}.weight"
            if wname not in keys:
                return None
            bias = reader.get(f"{prefix}.bias") if f"{prefix}.bias" in keys else None
            return dense_linear(reader.get(wname), bias=bias, dtype=dtype)

        params = _build_params(spec, get_array, get_linear, dtype=dtype)
    return spec, params


# ---------------------------------------------------------------------------
# compressed-tensors checkpoint
# ---------------------------------------------------------------------------

def load_compressed_model(ckpt_dir: Union[str, Path],
                          spec: Optional[ModelSpec] = None,
                          dtype=jnp.bfloat16) -> Tuple[ModelSpec, Dict[str, Any]]:
    """Load a compressed-tensors checkpoint into kernel-ready layouts."""
    ckpt_dir = Path(ckpt_dir)
    spec = spec or ModelSpec.from_hf_config(ckpt_dir)
    with CompressedModelReader(ckpt_dir) as reader:
        plain = set(reader.reader.keys())
        quant = set(reader.quantized_modules())

        def get_array(name: str) -> Optional[np.ndarray]:
            return reader.load_plain(name) if name in plain else None

        def get_linear(prefix: str) -> Optional[QuantLinear]:
            bias_name = f"{prefix}.bias"
            bias = reader.load_plain(bias_name) if bias_name in plain else None
            if prefix in quant:
                qt, args = reader.load_quantized(prefix)
                scheme = reader.scheme_for(prefix)
                return from_quantized(
                    qt, args, bias=bias,
                    act_args=scheme.input_activations if scheme else None)
            wname = f"{prefix}.weight"
            if wname in plain:
                return dense_linear(reader.load_plain(wname), bias=bias, dtype=dtype)
            return None

        params = _build_params(spec, get_array, get_linear, dtype=dtype)
    return spec, params


# ---------------------------------------------------------------------------
# params → flat HF-named numpy dict (for saving)
# ---------------------------------------------------------------------------

def iter_model_linears(spec: ModelSpec, params: Dict[str, Any]):
    """Yield (hf_prefix, QuantLinear-or-ExpertLinears-entry) pairs.

    For MoE layers yields the router and each stacked expert projection as
    ``(prefix, ExpertLinears, expert_idx)`` triples flattened to per-expert
    prefixes — callers get exactly the module paths the reference's recipes
    target (e.g. ``re:.*mlp\\.experts\\.\\d+\\.down_proj$``).
    """
    if spec.is_mla:
        attn_projs = (("q_a_proj", "q_b_proj") if spec.q_lora_rank else ("q_proj",)
                      ) + ("kv_a_proj_with_mqa", "kv_b_proj", "o_proj")
    else:
        attn_projs = ("q_proj", "k_proj", "v_proj", "o_proj")
    for i, layer in enumerate(params["layers"]):
        p = f"model.layers.{i}"
        for proj in attn_projs:
            yield f"{p}.self_attn.{proj}", layer[proj]
        if spec.layer_is_moe(i):
            moe = layer["moe"]
            yield f"{p}.mlp.gate", moe["router"]
            for proj in ("gate_proj", "up_proj", "down_proj"):
                el: ExpertLinears = moe[proj]
                for e in range(el.num_experts):
                    yield f"{p}.mlp.experts.{e}.{proj}", el.expert(e)
            if "shared_experts" in moe:
                for proj in ("gate_proj", "up_proj", "down_proj"):
                    yield f"{p}.mlp.shared_experts.{proj}", moe["shared_experts"][proj]
        else:
            for proj in ("gate_proj", "up_proj", "down_proj"):
                yield f"{p}.mlp.{proj}", layer["mlp"][proj]
    if params.get("lm_head") is not None:
        yield "lm_head", params["lm_head"]


def save_hf_model(spec: ModelSpec, params: Dict[str, Any], out_dir: Union[str, Path],
                  max_shard_bytes: int = 5 * 1024**3) -> None:
    """Write params as a plain HF-format bf16 safetensors checkpoint."""
    import ml_dtypes

    from ..formats.safetensors_io import ShardedWriter, dump_json

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    tensors = model_plain_tensors(spec, params)
    for prefix, lin in iter_model_linears(spec, params):
        tensors[f"{prefix}.weight"] = np.asarray(
            lin.dequantize(), dtype=ml_dtypes.bfloat16).T
        if lin.bias is not None:
            tensors[f"{prefix}.bias"] = np.asarray(lin.bias, dtype=ml_dtypes.bfloat16)
    w = ShardedWriter(out, max_shard_bytes=max_shard_bytes)
    w.add_many(tensors)
    w.finalize(metadata={"format": "pt"})
    dump_json(spec.to_hf_config(), out / "config.json")


def model_plain_tensors(spec: ModelSpec, params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """All non-linear tensors under their HF names (for checkpoint writing)."""
    out: Dict[str, np.ndarray] = {
        "model.embed_tokens.weight": np.asarray(params["embed"]),
        "model.norm.weight": np.asarray(params["final_norm"]),
    }
    for i, layer in enumerate(params["layers"]):
        p = f"model.layers.{i}"
        out[f"{p}.input_layernorm.weight"] = np.asarray(layer["input_layernorm"])
        out[f"{p}.post_attention_layernorm.weight"] = np.asarray(layer["post_attention_layernorm"])
        if spec.qk_norm:
            out[f"{p}.self_attn.q_norm.weight"] = np.asarray(layer["q_norm"])
            out[f"{p}.self_attn.k_norm.weight"] = np.asarray(layer["k_norm"])
        if spec.is_mla:
            if spec.q_lora_rank:
                out[f"{p}.self_attn.q_a_layernorm.weight"] = np.asarray(layer["q_a_layernorm"])
            out[f"{p}.self_attn.kv_a_layernorm.weight"] = np.asarray(layer["kv_a_layernorm"])
        if spec.layer_is_moe(i) and "e_score_correction_bias" in layer["moe"]:
            out[f"{p}.mlp.gate.e_score_correction_bias"] = np.asarray(
                layer["moe"]["e_score_correction_bias"], np.float32)
    return out


def abstract_quantized_tree(spec: ModelSpec, attn_group: int = 32,
                            expert_group: int = 16,
                            scale_dtype=jnp.bfloat16) -> Dict[str, Any]:
    """ShapeDtypeStruct pytree of a quantized serving model — W4A16
    attention/dense-MLP + NVFP4 expert stacks — with ZERO allocation.

    Feed it to :func:`quantizers_tpu.ops.linear.nvfp4_capacity_plan` to
    plan real configs (e.g. Qwen3-30B-A3B NVFP4 against one v5e chip)
    before loading anything. Dense-model layers get w4 QuantLinears; MoE
    layers get nvfp4 ExpertLinears, matching the serving layouts the
    checkpoint loader produces."""
    import jax

    from ..models.moe import ExpertLinears

    def sds(shape, dtype):
        return jax.ShapeDtypeStruct(shape, jnp.dtype(dtype))

    def w4(k: int, n: int) -> QuantLinear:
        return QuantLinear(
            kind="w4", weight=sds((k // 2, n), jnp.uint8),
            scale=sds((max(k // attn_group, 1), n), scale_dtype),
            meta=(("k", k), ("n", n), ("group_size", attn_group)))

    def nv_experts(e: int, k: int, n: int) -> ExpertLinears:
        return ExpertLinears(
            kind="nvfp4", weight=sds((e, k // 2, n), jnp.uint8),
            scale=sds((e, max(k // expert_group, 1), n), scale_dtype),
            meta=(("k", k), ("n", n), ("group_size", expert_group)))

    D, Ff = spec.hidden_size, spec.intermediate_size
    layers: List[Dict[str, Any]] = []
    for i in range(spec.num_layers):
        layer: Dict[str, Any] = {
            "input_layernorm": sds((D,), jnp.bfloat16),
            "post_attention_layernorm": sds((D,), jnp.bfloat16),
            "q_proj": w4(D, spec.q_dim), "k_proj": w4(D, spec.kv_dim),
            "v_proj": w4(D, spec.kv_dim), "o_proj": w4(spec.q_dim, D),
        }
        if spec.qk_norm:
            layer["q_norm"] = sds((spec.head_dim,), jnp.bfloat16)
            layer["k_norm"] = sds((spec.head_dim,), jnp.bfloat16)
        if spec.layer_is_moe(i):
            E, Fe = spec.num_experts, spec.moe_intermediate_size
            layer["moe"] = {
                "router": QuantLinear(kind="dense",
                                      weight=sds((D, E), jnp.float32),
                                      meta=(("k", D), ("n", E))),
                "gate_proj": nv_experts(E, D, Fe),
                "up_proj": nv_experts(E, D, Fe),
                "down_proj": nv_experts(E, Fe, D),
            }
        else:
            layer["mlp"] = {"gate_proj": w4(D, Ff), "up_proj": w4(D, Ff),
                            "down_proj": w4(Ff, D)}
        layers.append(layer)
    return {
        "embed": sds((spec.vocab_size, D), jnp.bfloat16),
        "layers": layers,
        "final_norm": sds((D,), jnp.bfloat16),
        "lm_head": (None if spec.tie_word_embeddings
                    else w4(D, spec.vocab_size)),
    }
