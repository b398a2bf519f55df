"""Quantized linear layers as JAX pytrees.

The device-side weight representation of the framework. A
:class:`QuantLinear` holds the quantized payload in a TPU-friendly layout
(contraction dim leading, packed nibbles where applicable) plus scales, and
``apply(x)`` computes ``x @ W^T`` by dispatching either to a fused Pallas
dequant-matmul kernel (:mod:`quantizers_tpu.ops.kernels`) or to an XLA
reference path (always available, used on CPU/in tests).

Layout conventions (HF weights are ``(out_features, in_features)`` = (N, K)):

* ``w4``   — packed uint8 ``(K//2, N)``: two offset-unsigned int4 nibbles per
  byte along K in *split-half* order — low nibble row ``p`` holds
  ``W[p, n]``, high nibble holds ``W[K//2 + p, n]``. This layout lets the
  Pallas kernel unpack with two shifts and **no sublane interleave** (the
  two nibble planes are contiguous K-ranges fed by their own x/scale
  tiles). Scales ``(K//g, N)``; optional zero points ``(K//g, N)`` int8.
* ``w8``   — int8 ``(K, N)``; per-channel or per-group scales.
* ``fp8``  — float8_e4m3fn ``(K, N)``; scale grid ``(ceil(K/bk), ceil(N/bn))``
  for block strategy or ``(1, N)`` per-channel.
* ``nvfp4``— packed uint8 ``(K//2, N)`` E2M1 codes; *effective* scales
  (second level already folded in) bf16 ``(K//16, N)``.
* ``dense``— bf16/f32 ``(K, N)``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.numerics import QuantizedTensor
from ..core.scheme import QuantizationArgs, QuantStrategy, QuantType


def _group_scaled(vals: jax.Array, scale: jax.Array,
                  zero_point: Optional[jax.Array], g: int, k: int, n: int
                  ) -> jax.Array:
    """Apply per-group scales (and optional zero points) to (k, n) values.

    Groups are the NOMINAL ``g`` rows each; core.quantize pads the in-dim
    up to a whole number of groups, so the last group may cover fewer
    than ``g`` real rows (and a K < g weight has exactly one group —
    reference/llmcompressor semantics). Padding the values to
    ``scale_rows * g`` before the reshape handles both the K < g case
    (which used to crash) and K % g != 0 tails (which a row-count-derived
    group size would silently mis-band)."""
    r = scale.shape[0]
    pad = r * g - k
    if pad < 0:
        raise ValueError(f"scale rows {r} x group {g} < K {k}")
    if pad:
        vals = jnp.pad(vals, ((0, pad), (0, 0)))
    vals = vals.reshape(r, g, n)
    if zero_point is not None:
        vals = vals - zero_point[:, None, :].astype(jnp.float32)
    w = vals * scale[:, None, :].astype(jnp.float32)
    return w.reshape(r * g, n)[:k]


def _unpack_nibbles(packed: jax.Array, signed_offset: int = 8) -> jax.Array:
    """uint8 (K//2, N) split-half packed -> int8 (K, N)."""
    lo = (packed & 0x0F).astype(jnp.int8) - signed_offset
    hi = ((packed >> 4) & 0x0F).astype(jnp.int8) - signed_offset
    return jnp.concatenate([lo, hi], axis=0)


def w4_packed_to_int4(packed: jax.Array) -> jax.Array:
    """Split-half packed uint8 (..., K//2, N) -> signed ``jnp.int4``
    (..., K, N); leading batch/expert axes pass through.

    The native-int4 device layout for symmetric W4A16: the Pallas kernel
    then dequantizes with ONE hardware i4->bf16 cvt instead of the
    widen/shift/mask chain, which moves the kernel from compute-bound
    (370 GB/s) to the DMA floor (628 GB/s) — benchmarks/kernel_lab6.py.

    Must run INSIDE jit on the tunneled axon backend: int4 arrays crossing
    the host<->device boundary break its transfer path (memory:
    axon-tpu-quirks), so callers convert per compiled program rather than
    holding int4 at rest. The relayout reads+writes ~K*N/2 bytes once per
    jit call — ~0.25% of a 256-step decode scan.
    """
    wide = packed.astype(jnp.int32)
    lo = (wide & 0x0F) - 8
    hi = (wide >> 4) - 8
    # axis -2 is the packed-K axis for both the 2-D QuantLinear layout
    # and the stacked (E, K//2, N) ExpertLinears layout
    return jnp.concatenate([lo, hi], axis=-2).astype(jnp.int4)


def nvfp4_packed_to_i8(packed: jax.Array) -> jax.Array:
    """Split-half packed E2M1 codes uint8 (..., K//2, N) -> int8 (..., K, N)
    holding **2x the E2M1 value** (exact: 2v in {0,±1,±2,±3,±4,±6,±8,±12}).
    The companion scale must be halved. 2x the HBM bytes of the packed
    form, but the kernel-side decode is a plain int widen+cvt — the
    ~14-op branchless E2M1 chain was the slot-kernel bottleneck and the
    native-f4 cvt turned out to be emulated on v5e (34 GB/s,
    benchmarks/bench_kernels.py)."""
    wide = packed.astype(jnp.int32)
    codes = jnp.concatenate([wide & 0x0F, wide >> 4], axis=-2)
    return (2.0 * _fp4_values(codes)).astype(jnp.int8)

# (A native float4_e2m1fn layout was tried first — it compiles and is
# numerically exact, but v5e has no hardware fp4 unpack: Mosaic emulates
# the cvt at ~34 GB/s. int8 at 2x bytes streams at 713 GB/s full-row —
# 2.2x more effective per weight. benchmarks/kernel_lab7.py)


_INT4_ARGS_OK: Optional[bool] = None


def int4_jit_args_supported() -> bool:
    """Can sub-byte (int4) device arrays be passed as jit ARGUMENTS?

    True on directly-attached TPUs; False through the tunneled "axon"
    transport, whose host<->device transfer path recurses on sub-byte
    dtypes — and which reports ``jax.default_backend() == "tpu"`` just
    like real hardware, so the only reliable test is to try it. Probed
    once (a trivial 8x128 round trip) and cached."""
    global _INT4_ARGS_OK
    if _INT4_ARGS_OK is None:
        try:
            a = jax.jit(lambda: jnp.zeros((8, 128), jnp.int4))()
            jax.jit(lambda x: x.astype(jnp.int8))(a).block_until_ready()
            _INT4_ARGS_OK = True
        except Exception:
            _INT4_ARGS_OK = False
    return _INT4_ARGS_OK


#: per-chip HBM by device kind (bytes); fallback when memory_stats() is
#: unavailable (e.g. through the tunneled transport)
HBM_BYTES_BY_KIND = {
    "TPU v5 lite": 16_000_000_000, "TPU v5e": 16_000_000_000,
    "TPU v4": 32_000_000_000, "TPU v5p": 95_000_000_000,
    "TPU v6 lite": 32_000_000_000,
}


def device_hbm_bytes() -> int:
    """Usable HBM of one local device, from runtime stats when available."""
    try:
        dev = jax.devices()[0]
        stats = dev.memory_stats()
        if stats and stats.get("bytes_limit"):
            return int(stats["bytes_limit"])
    except Exception:
        pass
    kind = getattr(jax.devices()[0], "device_kind", "")
    return HBM_BYTES_BY_KIND.get(kind, 16_000_000_000)


def _is_expert_stack(x: Any) -> bool:
    return hasattr(x, "num_experts")


def infer_expert_shards(tree: Any) -> int:
    """How many ways MoE expert stacks are sharded (1 if unsharded).

    Reads the concrete NamedSharding of the first ExpertLinears payload —
    call on real (pre-jit) arrays; tracers return 1."""
    shards = 1
    for leaf in jax.tree_util.tree_leaves(
            tree, is_leaf=lambda x: isinstance(x, QuantLinear) or _is_expert_stack(x)):
        if not _is_expert_stack(leaf):
            continue
        try:
            spec = leaf.weight.sharding.spec  # NamedSharding only
            mesh = leaf.weight.sharding.mesh
            axis = spec[0]  # experts axis
            if axis is None:
                return 1
            names = axis if isinstance(axis, tuple) else (axis,)
            for n in names:
                shards *= dict(zip(mesh.axis_names, mesh.devices.shape))[n]
            return shards
        except Exception:
            return 1
    return shards


def nvfp4_capacity_plan(tree: Any, hbm_bytes: Optional[int] = None,
                        headroom: float = 0.25,
                        expert_shards: int = 1) -> Dict[str, Any]:
    """Decide the nvfp4 device layout by capacity, not by env var.

    The int8-doubled layout streams at full HBM speed (the E2M1 decode
    chain costs ~14 VPU ops/value; v5e has no hardware fp4 unpack) but
    doubles the at-rest payload — a single-chip 30B-A3B does not fit 2×.
    This computes per-chip resident bytes for both layouts (pure shape
    math, safe at trace time) and approves int8 only when it fits within
    ``(1 - headroom) × HBM`` — headroom left for KV cache, activations,
    and XLA scratch. Expert stacks divide by ``expert_shards`` (their EP
    sharding); everything else is counted replicated (conservative).
    """
    if hbm_bytes is None:
        hbm_bytes = device_hbm_bytes()
    packed_total = 0
    int8_extra = 0
    for leaf in jax.tree_util.tree_leaves(
            tree, is_leaf=lambda x: isinstance(x, QuantLinear) or _is_expert_stack(x)):
        if isinstance(leaf, QuantLinear) or _is_expert_stack(leaf):
            arrays = [a for a in (leaf.weight, leaf.scale, leaf.zero_point,
                                  getattr(leaf, "bias", None)) if a is not None]
            nb = sum(int(np.prod(a.shape)) * a.dtype.itemsize for a in arrays)
            div = expert_shards if _is_expert_stack(leaf) else 1
            packed_total += nb // div
            if (leaf.kind == "nvfp4" and leaf.weight.dtype == jnp.uint8):
                w_nb = int(np.prod(leaf.weight.shape)) * 1
                int8_extra += w_nb // div  # int8 layout stores 2 bytes/pair extra
            elif leaf.kind == "fp8":
                # fp8 serves via a bf16-dense copy (hoisted dequant), which
                # adds 1 byte/weight over the 1-byte fp8 at rest
                w_nb = int(np.prod(leaf.weight.shape)) * 1
                int8_extra += w_nb // div
        elif hasattr(leaf, "shape") and hasattr(leaf, "dtype"):
            packed_total += int(np.prod(leaf.shape)) * leaf.dtype.itemsize
    budget = int((1.0 - headroom) * hbm_bytes)
    int8_total = packed_total + int8_extra
    return {
        "hbm_bytes": int(hbm_bytes),
        "budget_bytes": budget,
        "packed_bytes": int(packed_total),
        "int8_bytes": int(int8_total),
        "expert_shards": int(expert_shards),
        "int8_ok": int8_total <= budget,
    }


def _nvfp4_layout_decision(tree: Any, nvfp4_int8: Optional[bool],
                           expert_shards: int) -> bool:
    import os

    env = os.environ.get("QTPU_NVFP4_LAYOUT")
    if env in ("packed", "int8"):  # explicit operator override
        return env == "int8"
    if os.environ.get("QTPU_KEEP_PACKED_NVFP4"):  # legacy escape hatch
        return False
    if nvfp4_int8 is not None:
        return nvfp4_int8
    return nvfp4_capacity_plan(tree, expert_shards=expert_shards)["int8_ok"]


def i4_device_layout(tree: Any, nvfp4_int8: Optional[bool] = None,
                     expert_shards: int = 1,
                     nvfp4_int8_experts: Optional[bool] = None,
                     fp8_dense: Optional[bool] = None) -> Any:
    """Swap quantized payloads in a params pytree for the fast TPU device
    layouts: symmetric w4 -> signed int4 (:func:`w4_packed_to_int4`),
    nvfp4 -> int8-doubled (:func:`nvfp4_packed_to_i8`), fp8 -> bf16 dense
    (explicitly hoisted dequant; no viable fused fp8 kernel on v5e) — for
    both plain :class:`QuantLinear` s and stacked MoE ``ExpertLinears``.
    No-op off TPU, for asymmetric layouts, and for already-converted
    leaves — safe to call unconditionally at every jit entry point (the
    serving callers all sit OUTSIDE the decode scan body, so conversions
    run once per scan call, not per token).

    The byte-doubling choices (nvfp4-int8, fp8-dense) are capacity-aware
    by default (:func:`nvfp4_capacity_plan`); pass ``nvfp4_int8`` to pin
    (the serving session computes the plan once against its mesh).
    ``nvfp4_int8_experts`` overrides the decision for MoE ``ExpertLinears``
    stacks ONLY — the scope of the session's ``QTPU_MOE_LAYOUT=packed``
    knob, which must pin the *expert* at-rest layout without dragging
    non-MoE attention/dense nvfp4 linears down with it."""
    from .dispatch import _on_tpu

    if not _on_tpu():
        return tree

    from ..models.moe import ExpertLinears

    decide_int8: Optional[bool] = None  # lazy: only if an nvfp4 leaf exists

    def conv(x):
        nonlocal decide_int8
        if not isinstance(x, (QuantLinear, ExpertLinears)):
            return x
        if x.zero_point is not None or x.weight.dtype != jnp.uint8:
            return x
        rows_axis = -2
        packed_rows = x.weight.shape[rows_axis]
        if int(dict(x.meta)["k"]) != 2 * packed_rows:
            return x
        if x.kind == "w4":
            return dataclasses.replace(x, weight=w4_packed_to_int4(x.weight))
        if x.kind == "nvfp4":
            if decide_int8 is None:
                decide_int8 = _nvfp4_layout_decision(tree, nvfp4_int8,
                                                     expert_shards)
            leaf_int8 = decide_int8
            if nvfp4_int8_experts is not None and hasattr(x, "num_experts"):
                leaf_int8 = nvfp4_int8_experts
            if not leaf_int8:
                # over capacity / expert layout pinned packed: keep the
                # half-byte packed-u8 layout (serves slower, half the HBM)
                return x
            # int8 stores 2x the E2M1 value; the halved scale keeps every
            # consumer (dequantize, kernels, gather paths) layout-agnostic
            return dataclasses.replace(
                x, weight=nvfp4_packed_to_i8(x.weight),
                scale=(x.scale.astype(jnp.float32) * 0.5).astype(x.scale.dtype))
        return x

    def conv_fp8(x):
        # fp8 has no viable fused kernel on v5e (every block-scale
        # formulation crashes Mosaic or measures 15-66 GB/s — kernel_lab9),
        # so serving runs XLA dequant+matmul. Converting HERE (the callers
        # sit outside the decode scan body) makes the dequant hoist
        # EXPLICIT instead of relying on XLA loop-invariant code motion:
        # decode streams the bf16 copy, never re-dequantizing per token.
        nonlocal decide_int8
        if not (isinstance(x, QuantLinear) and x.kind == "fp8"):
            return x
        if fp8_dense is not None:
            if not fp8_dense:
                return x  # pinned resident (QTPU_FP8_LAYOUT=resident)
        else:
            if decide_int8 is None:
                decide_int8 = _nvfp4_layout_decision(tree, nvfp4_int8,
                                                     expert_shards)
            if not decide_int8:
                # over capacity: keep fp8 at rest, pay per-step dequant
                return x
        md = dict(x.meta)
        return QuantLinear(kind="dense", weight=x.dequantize(jnp.bfloat16),
                           bias=x.bias,
                           meta=(("k", int(md["k"])), ("n", int(md["n"]))))

    out = jax.tree_util.tree_map(
        conv, tree,
        is_leaf=lambda x: isinstance(x, QuantLinear) or hasattr(x, "num_experts"))
    return jax.tree_util.tree_map(
        conv_fp8, out,
        is_leaf=lambda x: isinstance(x, QuantLinear) or hasattr(x, "num_experts"))


def experts_to_w8pc(el: Any) -> Any:
    """Requantize a symmetric expert stack onto the **int8 per-channel**
    serving grid (kind="w8", one scale per output column).

    Why: per-channel scales fold into the slot kernel's matmul OUTPUT
    (``y_n = (x @ W)_n * s_n`` — n multiplies instead of k*n), which
    removes the group-scale VPU pass that made the int8-g16 slot kernel
    compute-bound (486 -> 349 us/call at Qwen3-30B-A3B geometry,
    benchmarks/lab_moe4.py). Quality: a requant of the already-quantized
    values on a 4-16x finer grid (col_max/127 vs group_max/6 steps) —
    +2.7% reconstruction RMSE over exact NVFP4 on heavy-tailed synthetic
    weights, and measured end-to-end in benchmarks/ppl_protocol.py
    (``nvfp4_w8pc``). Same at-rest bytes as the exact int8-doubled
    layout, so the :func:`nvfp4_capacity_plan` gate applies unchanged.

    Runs one expert at a time (``lax.map``) so the f32 dequant transient
    stays at one (K, N) matrix, not (E, K, N).
    """
    from ..models.moe import ExpertLinears

    if el.zero_point is not None:
        raise ValueError("w8pc serving layout requires symmetric experts")
    md = dict(el.meta)
    k, n = int(md["k"]), int(md["n"])
    kind, meta = el.kind, el.meta

    def one(leaves):
        w, s = leaves
        lin = QuantLinear(kind=kind, weight=w, scale=s, meta=meta)
        W = lin.dequantize(jnp.float32)  # (k, n)
        sc = jnp.max(jnp.abs(W), axis=0, keepdims=True) / 127.0 + 1e-12
        w8 = jnp.clip(jnp.round(W / sc), -127, 127).astype(jnp.int8)
        return w8, sc.astype(jnp.float32)  # (k, n) int8, (1, n)

    w8, sc = jax.lax.map(one, (el.weight, el.scale))
    return ExpertLinears(kind="w8", weight=w8, scale=sc, bias=el.bias,
                         meta=(("k", k), ("n", n), ("group_size", None)))


def fuse_experts_gate_up(gate_el: Any, up_el: Any) -> Any:
    """Concatenate gate/up expert stacks along the output axis into one
    (E, K, 2*Fe) payload — ONE HBM stream per expert slot instead of two
    (the second-largest slot-kernel win in benchmarks/lab_moe4.py: 449 ->
    349 us/call together with per-channel scales)."""
    from ..models.moe import ExpertLinears

    if gate_el.kind != up_el.kind or gate_el.meta != up_el.meta:
        raise ValueError("gate/up fusion requires matching kind and meta")
    md = dict(gate_el.meta)
    n2 = 2 * int(md["n"])
    meta = tuple((key, v) if key != "n" else ("n", n2) for key, v in gate_el.meta)
    meta = meta + (("fused", "gate_up"),)

    def cat(field):
        a, b = getattr(gate_el, field), getattr(up_el, field)
        if a is None and b is None:
            return None
        return jnp.concatenate([a, b], axis=-1)

    return ExpertLinears(kind=gate_el.kind, weight=cat("weight"),
                         scale=cat("scale"), zero_point=cat("zero_point"),
                         bias=cat("bias"), meta=meta)


def moe_w8pc_layout(tree: Any) -> Any:
    """Swap every MoE block's gate/up/down expert stacks for the fused
    int8-per-channel serving layout (``gate_up_proj`` + w8pc ``down_proj``;
    see :func:`experts_to_w8pc`). Non-MoE leaves, routers, shared experts
    and asymmetric/dense expert stacks pass through untouched. Apply ONCE
    at session build (it requantizes; not per-token work)."""
    def eligible(el: Any) -> bool:
        return (_is_expert_stack(el) and el.zero_point is None
                and el.kind in ("nvfp4", "w4", "w8") and el.scale is not None)

    def walk(node: Any) -> Any:
        if isinstance(node, dict):
            node = {key: walk(v) for key, v in node.items()}
            g, u, d = (node.get("gate_proj"), node.get("up_proj"),
                       node.get("down_proj"))
            if all(x is not None and eligible(x) for x in (g, u, d)):
                node["gate_up_proj"] = fuse_experts_gate_up(
                    experts_to_w8pc(g), experts_to_w8pc(u))
                node["down_proj"] = experts_to_w8pc(d)
                del node["gate_proj"], node["up_proj"]
            return node
        if isinstance(node, list):
            return [walk(v) for v in node]
        if isinstance(node, tuple):
            return tuple(walk(v) for v in node)
        return node

    return walk(tree)


def _fp4_values(codes: jax.Array) -> jax.Array:
    """E2M1 codes (int32, 0..15) -> float32 values, branchless arithmetic.

    (A 16-entry LUT gather here lowers to a per-element dynamic gather on
    TPU — measured ~seconds per 100M codes; the select chain vectorizes.)
    """
    m = (codes & 1).astype(jnp.float32)
    e = (codes >> 1) & 0x3
    mag = jnp.where(
        e == 0, 0.5 * m,
        jnp.where(e == 1, 1.0 + 0.5 * m,
                  jnp.where(e == 2, 2.0 + m, 4.0 + 2.0 * m)))
    return jnp.where((codes >> 3) & 1 == 1, -mag, mag)


def _unpack_fp4(packed: jax.Array) -> jax.Array:
    """uint8 (K//2, N) of split-half-packed E2M1 codes -> float32 (K, N)."""
    wide = packed.astype(jnp.int32)
    codes = jnp.concatenate([wide & 0x0F, wide >> 4], axis=0)
    return _fp4_values(codes)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantLinear:
    """A (possibly) quantized linear weight, pytree-compatible.

    ``kind`` and ``meta`` are static (hashable) aux data; array fields are
    pytree leaves so jit/pjit/shard_map trace through cleanly.
    """

    kind: str  # dense | w4 | w8 | fp8 | nvfp4
    weight: jax.Array  # payload in the layout for `kind`
    scale: Optional[jax.Array] = None
    zero_point: Optional[jax.Array] = None
    bias: Optional[jax.Array] = None
    meta: Tuple[Tuple[str, Any], ...] = ()  # static: group_size, out/in features...

    # -- pytree protocol -----------------------------------------------------
    def tree_flatten(self):
        leaves = (self.weight, self.scale, self.zero_point, self.bias)
        return leaves, (self.kind, self.meta)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        kind, meta = aux
        weight, scale, zero_point, bias = leaves
        return cls(kind=kind, weight=weight, scale=scale, zero_point=zero_point, bias=bias, meta=meta)

    # -- helpers --------------------------------------------------------------
    @property
    def meta_dict(self) -> Dict[str, Any]:
        return dict(self.meta)

    @property
    def out_features(self) -> int:
        return int(self.meta_dict["n"])

    @property
    def in_features(self) -> int:
        return int(self.meta_dict["k"])

    # -- dequantize (XLA path) -------------------------------------------------
    def dequantize(self, dtype=jnp.bfloat16) -> jax.Array:
        """Materialize W^T as (K, N) in ``dtype``."""
        md = self.meta_dict
        k, n = int(md["k"]), int(md["n"])
        if self.kind == "dense":
            return self.weight.astype(dtype)
        if self.kind == "w4":
            if self.weight.dtype == jnp.int4:  # already-signed device layout
                vals = self.weight.astype(jnp.float32)[:k]
            else:
                vals = _unpack_nibbles(self.weight).astype(jnp.float32)[:k]
            g = int(md["group_size"])
            return _group_scaled(vals, self.scale, self.zero_point, g, k, n
                                 ).astype(dtype)
        if self.kind == "w8":
            vals = self.weight.astype(jnp.float32)
            g = md.get("group_size")
            if g:
                return _group_scaled(vals[:k], self.scale, self.zero_point,
                                     int(g), k, n).astype(dtype)
            return (vals * self.scale.astype(jnp.float32)).astype(dtype)
        if self.kind == "fp8":
            vals = self.weight.astype(jnp.float32)
            strategy = md.get("strategy", "block")
            if strategy == "block":
                bk, bn = int(md["block_k"]), int(md["block_n"])
                nbk, nbn = self.scale.shape
                up = jnp.repeat(jnp.repeat(self.scale.astype(jnp.float32), bk, axis=0), bn, axis=1)
                w = vals * up[:k, :n]
            elif strategy == "group":
                w = _group_scaled(vals[:k], self.scale, None,
                                  int(md["group_size"]), k, n)
            else:  # channel / tensor
                w = vals * self.scale.astype(jnp.float32)
            return w.astype(dtype)
        if self.kind == "nvfp4":
            if self.weight.dtype == jnp.int8:  # converted device layout
                # values are 2x, the stored scale is already halved
                vals = self.weight.astype(jnp.float32)[:k]
            else:
                vals = _unpack_fp4(self.weight)[:k]
            g = int(md.get("group_size", 16))
            return _group_scaled(vals, self.scale, None, g, k, n).astype(dtype)
        raise ValueError(f"unknown QuantLinear kind {self.kind}")

    # -- matmul ----------------------------------------------------------------
    def apply(self, x: jax.Array, use_kernel: Optional[bool] = None) -> jax.Array:
        """Compute ``x @ W^T (+ bias)``; x shape (..., K) -> (..., N)."""
        from .dispatch import quant_matmul

        y = quant_matmul(x, self, use_kernel=use_kernel)
        if self.bias is not None:
            y = y + self.bias.astype(y.dtype)
        return y

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.apply(x)


# ---------------------------------------------------------------------------
# constructors
# ---------------------------------------------------------------------------

def _pack_nibbles_np(vals: np.ndarray, offset: int = 8) -> np.ndarray:
    """int values (K, N) -> uint8 (K//2, N), split-half order: low nibble
    row p = vals[p], high nibble = vals[K//2 + p]."""
    u = (vals.astype(np.int16) + offset).astype(np.uint8)
    if u.shape[0] % 2:
        u = np.pad(u, ((0, 1), (0, 0)))
    half = u.shape[0] // 2
    lo = u[:half]
    hi = u[half:]
    return (lo | (hi << 4)).astype(np.uint8)


def dense_linear(weight_nk: Any, bias: Optional[Any] = None, dtype=jnp.bfloat16) -> QuantLinear:
    """From an HF (N, K) weight -> dense layout (K, N).

    A weight that already lives on device stays there — ``np.asarray`` on a
    jax Array is a full device→host download (init_params of a 4B model
    round-trips ~24 GB through a tunneled chip otherwise)."""
    if not isinstance(weight_nk, jax.Array):
        weight_nk = np.asarray(weight_nk)
    w = jnp.asarray(weight_nk, dtype=dtype).T
    k, n = w.shape
    if bias is not None and not isinstance(bias, jax.Array):
        bias = np.asarray(bias)
    return QuantLinear(
        kind="dense",
        weight=w,
        bias=None if bias is None else jnp.asarray(bias, dtype=dtype),
        meta=(("k", k), ("n", n)),
    )


def _act_meta(act_args: Optional[QuantizationArgs]) -> Tuple[Tuple[str, Any], ...]:
    """Meta entries recording the scheme's *input-activation* quantization.

    Only the case the TPU serving path can actually compute natively is
    recorded: dynamic per-token symmetric INT8 (the W8A8 preset —
    compressed-tensors ``input_activations`` with strategy=token,
    dynamic=true). Dispatch then runs the matmul on the MXU's double-rate
    int8 path instead of dequantizing to bf16
    (:func:`quantizers_tpu.ops.dispatch.w8a8_token_matmul`)."""
    if act_args is None:
        return ()
    if (act_args.dynamic and act_args.symmetric
            and act_args.type == QuantType.INT and act_args.num_bits == 8
            and act_args.strategy == QuantStrategy.TOKEN):
        return (("act", "token_i8"),)
    return ()


def _from_quantized_device(qt: QuantizedTensor, args: QuantizationArgs,
                           scale_dtype, act_args: Optional[QuantizationArgs],
                           n: int, k: int) -> Optional[QuantLinear]:
    """Device-side relayout for device-resident QuantizedTensors — same
    layouts as the numpy path below, but transposes/casts/nibble-packs run
    as (cached) XLA programs so the tensor never crosses the host boundary.
    Returns None for layouts without a device path (NVFP4 code packing)."""
    scale = qt.scale.astype(jnp.float32)

    def _per_channel(x):
        # (N,) / (N, 1) -> (1, N). Row-major flattening makes this a pure
        # reshape; an actual (N, 1).T transpose is degenerate and hits a
        # pathological Mosaic relayout (96 s for a 152k-row head on v5e).
        return x.reshape(1, n) if x.size == n else x.reshape(n, -1).T

    if args.type == QuantType.INT and args.num_bits == 4:
        u = (qt.values.T.astype(jnp.int16) + 8).astype(jnp.uint8)  # (K, N)
        if u.shape[0] % 2:
            u = jnp.pad(u, ((0, 1), (0, 0)))
        half = u.shape[0] // 2
        packed = u[:half] | (u[half:] << 4)
        zp = None if qt.zero_point is None else qt.zero_point.T.astype(jnp.int8)
        return QuantLinear(
            kind="w4", weight=packed, scale=scale.T.astype(scale_dtype),
            zero_point=zp,
            meta=(("k", k), ("n", n), ("group_size", int(args.group_size or k))))

    if args.type == QuantType.INT and args.num_bits == 8:
        w8 = qt.values.T.astype(jnp.int8)
        if args.strategy == QuantStrategy.GROUP:
            meta: Tuple[Tuple[str, Any], ...] = (
                ("k", k), ("n", n), ("group_size", int(args.group_size)))
            scale_t = scale.T
        else:
            meta = (("k", k), ("n", n), ("group_size", None)) + _act_meta(act_args)
            scale_t = _per_channel(scale)
        zp = None
        if qt.zero_point is not None:
            zpd = qt.zero_point
            zp = (zpd.T if zpd.ndim == 2 and zpd.shape[1] > 1 else _per_channel(zpd)).astype(jnp.int8)
        return QuantLinear(kind="w8", weight=w8,
                           scale=scale_t.astype(scale_dtype),
                           zero_point=zp, meta=meta)

    if args.type == QuantType.FLOAT and args.num_bits == 8:
        w8 = qt.values.T.astype(jnp.float8_e4m3fn)
        if args.strategy == QuantStrategy.BLOCK:
            br, bc = tuple(args.block_structure)
            scale_t = scale.T
            meta = (("k", k), ("n", n), ("strategy", "block"),
                    ("block_k", bc), ("block_n", br))
        elif args.strategy == QuantStrategy.GROUP:
            scale_t = scale.T
            meta = (("k", k), ("n", n), ("strategy", "group"),
                    ("group_size", int(args.group_size)))
        elif args.strategy == QuantStrategy.CHANNEL:
            scale_t = _per_channel(scale)
            meta = (("k", k), ("n", n), ("strategy", "channel"))
        else:
            scale_t = scale.reshape(1, 1)
            meta = (("k", k), ("n", n), ("strategy", "tensor"))
        return QuantLinear(kind="fp8", weight=w8, scale=scale_t, meta=meta)

    if args.type == QuantType.FLOAT and args.num_bits == 4:
        # NVFP4: encode E2M1 codes device-side (values are already snapped
        # to the grid, so the ordinal threshold chain is exact) and pack
        # split-half — mirrors formats.fp4_encode + the host packer below.
        vt = qt.values.T.astype(jnp.float32)  # (K, N)
        a = jnp.abs(vt)
        mag = (
            (a > 0.25).astype(jnp.uint8) + (a > 0.75).astype(jnp.uint8)
            + (a > 1.25).astype(jnp.uint8) + (a > 1.75).astype(jnp.uint8)
            + (a > 2.5).astype(jnp.uint8) + (a > 3.5).astype(jnp.uint8)
            + (a > 5.0).astype(jnp.uint8))
        codes = ((vt < 0).astype(jnp.uint8) << 3) | mag
        if codes.shape[0] % 2:
            codes = jnp.pad(codes, ((0, 1), (0, 0)))
        half = codes.shape[0] // 2
        packed = codes[:half] | (codes[half:] << 4)
        gsc = qt.global_scale if qt.global_scale is not None else 1.0
        eff = (scale / gsc).T  # (K/16, N)
        return QuantLinear(
            kind="nvfp4", weight=packed, scale=eff.astype(scale_dtype),
            meta=(("k", k), ("n", n), ("group_size", int(args.group_size or 16))))

    return None


def from_quantized(
    qt: QuantizedTensor,
    args: QuantizationArgs,
    bias: Optional[Any] = None,
    scale_dtype=jnp.bfloat16,
    act_args: Optional[QuantizationArgs] = None,
) -> QuantLinear:
    """Build the device layout from a :class:`QuantizedTensor`
    (values in the HF (N, K) orientation, as produced by core.quantize or
    loaded by formats.CompressedModelReader). ``act_args`` — the scheme's
    ``input_activations`` — is recorded in meta when the serving path has
    a native compute route for it (see :func:`_act_meta`).

    Values that already live on device (jax Arrays, e.g. straight out of a
    jitted ``core.quantize``) are relaid out with device-side ops — through
    the tunneled axon transport a host round-trip of a 4B-model head is a
    multi-GB download at ~100-300 MB/s (the 530 s ``quantize_lm_head`` stall
    diagnosed in round 5); host inputs keep the numpy path."""
    n, k = qt.shape
    on_device = isinstance(qt.values, jax.Array) and not isinstance(qt.values, np.ndarray)

    if on_device:
        dev = _from_quantized_device(qt, args, scale_dtype, act_args, n, k)
        if dev is not None:
            bias_d = None
            if bias is not None:
                bias_d = (bias if isinstance(bias, jax.Array) else jnp.asarray(np.asarray(bias))).astype(jnp.bfloat16)
            return dataclasses.replace(dev, bias=bias_d)

    values = np.asarray(qt.values)
    scale = np.asarray(qt.scale, dtype=np.float32)
    bias_j = None if bias is None else jnp.asarray(np.asarray(bias), dtype=jnp.bfloat16)

    if args.type == QuantType.INT and args.num_bits == 4:
        packed = _pack_nibbles_np(values.T)  # (K//2, N)
        scale_t = scale.T  # (K/g, N)
        zp = None
        if qt.zero_point is not None:
            zp = jnp.asarray(np.asarray(qt.zero_point).T.astype(np.int8))
        return QuantLinear(
            kind="w4",
            weight=jnp.asarray(packed),
            scale=jnp.asarray(scale_t, dtype=scale_dtype),
            zero_point=zp,
            bias=bias_j,
            meta=(("k", k), ("n", n), ("group_size", int(args.group_size or k))),
        )

    if args.type == QuantType.INT and args.num_bits == 8:
        w8 = jnp.asarray(values.T.astype(np.int8))  # (K, N)
        meta: Tuple[Tuple[str, Any], ...]
        if args.strategy == QuantStrategy.GROUP:
            meta = (("k", k), ("n", n), ("group_size", int(args.group_size)))
            scale_t = scale.T
        else:  # channel: scale (N, 1) -> (1, N)
            meta = (("k", k), ("n", n), ("group_size", None)) + _act_meta(act_args)
            scale_t = scale.reshape(n, -1).T
        zp = None
        if qt.zero_point is not None:
            zp_np = np.asarray(qt.zero_point)
            zp = jnp.asarray((zp_np.T if zp_np.ndim == 2 else zp_np.reshape(n, -1).T).astype(np.int8))
        return QuantLinear(kind="w8", weight=w8, scale=jnp.asarray(scale_t, dtype=scale_dtype), zero_point=zp, bias=bias_j, meta=meta)

    if args.type == QuantType.FLOAT and args.num_bits == 8:
        w8 = jnp.asarray(values.T.astype(np.float32), dtype=jnp.float8_e4m3fn)  # (K, N)
        if args.strategy == QuantStrategy.BLOCK:
            br, bc = tuple(args.block_structure)
            # host scale grid is (ceil(N/br), ceil(K/bc)) over (N, K); transpose
            scale_t = scale.T  # (K-blocks, N-blocks)
            meta = (("k", k), ("n", n), ("strategy", "block"), ("block_k", bc), ("block_n", br))
        elif args.strategy == QuantStrategy.GROUP:
            scale_t = scale.T
            meta = (("k", k), ("n", n), ("strategy", "group"), ("group_size", int(args.group_size)))
        elif args.strategy == QuantStrategy.CHANNEL:
            scale_t = scale.reshape(n, -1).T
            meta = (("k", k), ("n", n), ("strategy", "channel"))
        else:
            scale_t = scale.reshape(1, 1)
            meta = (("k", k), ("n", n), ("strategy", "tensor"))
        return QuantLinear(kind="fp8", weight=w8, scale=jnp.asarray(scale_t, dtype=jnp.float32), bias=bias_j, meta=meta)

    if args.type == QuantType.FLOAT and args.num_bits == 4:
        # NVFP4: fold global scale into per-group effective scales.
        from ..formats.compressed_tensors import fp4_encode

        codes = fp4_encode(values.T)  # (K, N) codes
        if codes.shape[0] % 2:
            codes = np.pad(codes, ((0, 1), (0, 0)))
        half = codes.shape[0] // 2
        packed = (codes[:half] | (codes[half:] << 4)).astype(np.uint8)
        g = float(np.asarray(qt.global_scale)) if qt.global_scale is not None else 1.0
        eff = (scale / g).T  # (K/16, N)
        return QuantLinear(
            kind="nvfp4",
            weight=jnp.asarray(packed),
            scale=jnp.asarray(eff, dtype=scale_dtype),
            bias=bias_j,
            meta=(("k", k), ("n", n), ("group_size", int(args.group_size or 16))),
        )

    raise ValueError(f"no device layout for args {args}")


# ---------------------------------------------------------------------------
# decode-layout fusion
# ---------------------------------------------------------------------------

def concat_linears(lins: list) -> QuantLinear:
    """Concatenate linears sharing the same input (same K, kind, layout)
    along the output-features axis — the fused-QKV / fused-GateUp layout.

    All supported payload layouts keep N as the trailing axis (weight
    (K-ish, N), scales (groups, N)), so fusion is a pure axis-1 concat; one
    kernel call then streams all the fused weights, cutting per-call grid
    and DMA-issue overhead during decode.
    """
    if len(lins) == 1:
        return lins[0]
    first = lins[0]
    md0 = dict(first.meta)
    for l in lins[1:]:
        md = dict(l.meta)
        if l.kind != first.kind or md.get("k") != md0.get("k"):
            raise ValueError("fusion requires same kind and in_features")
        for key in md0:
            if key not in ("n",) and md.get(key) != md0.get(key):
                raise ValueError(f"fusion requires matching meta ({key})")
    n_total = sum(int(dict(l.meta)["n"]) for l in lins)

    def cat(field: str, axis: int = 1):
        vals = [getattr(l, field) for l in lins]
        if all(v is None for v in vals):
            return None
        if any(v is None for v in vals):
            raise ValueError(f"fusion: mixed None/non-None {field}")
        return jnp.concatenate(vals, axis=axis)

    if first.kind == "fp8" and md0.get("strategy") == "tensor":
        raise ValueError("cannot fuse tensor-scaled fp8 linears")
    meta = tuple((k, v) if k != "n" else ("n", n_total) for k, v in first.meta)
    return QuantLinear(
        kind=first.kind,
        weight=cat("weight"),
        scale=cat("scale"),
        zero_point=cat("zero_point"),
        bias=cat("bias", axis=0),
        meta=meta,
    )
