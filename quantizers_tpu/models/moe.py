"""Mixture-of-Experts block (qwen3_moe-style top-k routing).

TPU-native design notes:

* Expert weights are **stacked** into leading-``E`` arrays
  (:class:`ExpertLinears`) rather than kept as E separate modules — one
  pytree, sharding-friendly along the expert axis (expert parallelism =
  ``PartitionSpec("expert", ...)`` on these leaves).
* The forward pass runs a ``lax.scan`` over experts: every expert processes
  every token and outputs are combined with the (dense, zero-for-unrouted)
  top-k routing weights. This is the classic dense-MoE TPU formulation —
  static shapes, no ragged gather — and it makes *all-expert calibration*
  (reference ``scripts/do_oneshot.py:186`` ``moe_calibrate_all_experts=True``,
  rationale ``docs/quantization_tips_and_tricks.md:79-98``) the natural mode:
  observers see every expert's activations on every batch.
* Routing math (softmax → top-k → optional renorm) matches qwen3_moe /
  the models the reference quantizes (`configs/test-quantize_qwen3_30b_a3b_nvfp4.yaml`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.linear import QuantLinear


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ExpertLinears:
    """E stacked :class:`QuantLinear` s sharing kind/meta.

    Leaves have a leading expert axis; ``kind``/``meta`` describe the
    per-expert 2-D layout (so a sliced expert is a valid QuantLinear).
    """

    kind: str
    weight: jax.Array  # (E, ...)
    scale: Optional[jax.Array] = None
    zero_point: Optional[jax.Array] = None
    bias: Optional[jax.Array] = None
    meta: Tuple[Tuple[str, Any], ...] = ()

    def tree_flatten(self):
        return (self.weight, self.scale, self.zero_point, self.bias), (self.kind, self.meta)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        kind, meta = aux
        w, s, z, b = leaves
        return cls(kind=kind, weight=w, scale=s, zero_point=z, bias=b, meta=meta)

    @property
    def num_experts(self) -> int:
        return int(self.weight.shape[0])

    @classmethod
    def stack(cls, lins: List[QuantLinear]) -> "ExpertLinears":
        if not lins:
            raise ValueError("need at least one expert")
        kind, meta = lins[0].kind, lins[0].meta
        for l in lins[1:]:
            if l.kind != kind or l.meta != meta:
                raise ValueError("experts must share kind and layout meta")

        def _stack(field: str) -> Optional[jax.Array]:
            vals = [getattr(l, field) for l in lins]
            if vals[0] is None:
                return None
            return jnp.stack(vals, axis=0)

        return cls(kind=kind, weight=_stack("weight"), scale=_stack("scale"),
                   zero_point=_stack("zero_point"), bias=_stack("bias"), meta=meta)

    def expert(self, e: int) -> QuantLinear:
        """Static-index single expert (host-side use)."""
        sl = lambda a: None if a is None else a[e]
        return QuantLinear(kind=self.kind, weight=sl(self.weight), scale=sl(self.scale),
                           zero_point=sl(self.zero_point), bias=sl(self.bias), meta=self.meta)

    # scan plumbing: leaves as xs, rebuild per-step QuantLinear.
    def _xs(self):
        return (self.weight, self.scale, self.zero_point, self.bias)

    def _from_sliced(self, sliced) -> QuantLinear:
        w, s, z, b = sliced
        return QuantLinear(kind=self.kind, weight=w, scale=s, zero_point=z,
                           bias=b, meta=self.meta)


def route_topk(router_logits: jax.Array, top_k: int, norm_topk_prob: bool,
               scoring_func: str = "softmax",
               bias: Optional[jax.Array] = None,
               routed_scaling_factor: float = 1.0) -> jax.Array:
    """(N, E) logits -> dense (N, E) combine weights, zero off the top-k.

    ``scoring_func="sigmoid"`` + ``bias`` implements the DeepSeek-V3 router:
    expert *selection* uses ``sigmoid(logits) + e_score_correction_bias`` but
    combine weights use the un-biased sigmoid scores, renormalized over the
    chosen k and scaled by ``routed_scaling_factor`` (the family behind the
    reference's GLM-Flash/MiniMax targets, `quant_GLM-4.7-Flash-FP8.py:15-22`).
    """
    topi, topv = route_topk_sparse(router_logits, top_k, norm_topk_prob,
                                   scoring_func, bias, routed_scaling_factor)
    E = router_logits.shape[-1]
    onehot = jax.nn.one_hot(topi, E, dtype=jnp.float32)  # (N, k, E)
    return jnp.einsum("nk,nke->ne", topv, onehot)


def route_topk_sparse(router_logits: jax.Array, top_k: int,
                      norm_topk_prob: bool, scoring_func: str = "softmax",
                      bias: Optional[jax.Array] = None,
                      routed_scaling_factor: float = 1.0
                      ) -> Tuple[jax.Array, jax.Array]:
    """(N, E) logits -> (topi (N, k) int32, topv (N, k) f32)."""
    if scoring_func == "sigmoid":
        probs = jax.nn.sigmoid(router_logits.astype(jnp.float32))
    else:
        probs = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    choice = probs + bias.astype(jnp.float32) if bias is not None else probs
    _, topi = jax.lax.top_k(choice, top_k)
    topv = jnp.take_along_axis(probs, topi, axis=-1)
    if norm_topk_prob:
        topv = topv / (jnp.sum(topv, axis=-1, keepdims=True) + 1e-20)
    return topi.astype(jnp.int32), topv * routed_scaling_factor


# below this many tokens the gathered top-k decode path beats the dense
# all-expert scan (it reads only the selected experts' weights from HBM —
# the dominant cost of MoE decode at small batch)
_GATHER_DECODE_MAX_TOKENS = 32


def _slot_dequant(el: ExpertLinears, idx: jax.Array) -> jax.Array:
    """Gather experts ``idx`` (S,) and dequantize -> (S, K, N) bf16.

    The XLA gather only streams the selected experts' payloads out of HBM,
    so decode traffic scales with tokens*top_k instead of num_experts.
    """
    from ..ops.linear import _unpack_fp4, _unpack_nibbles

    md = dict(el.meta)
    w = el.weight[idx]
    if el.kind == "dense":
        return w.astype(jnp.bfloat16)
    s = el.scale[idx]
    k, n = int(md["k"]), int(md["n"])
    if el.kind == "w4":
        g = int(md["group_size"])
        if w.dtype == jnp.int4:  # converted device layout (already signed)
            vals = w.astype(jnp.float32)
        else:
            vals = jax.vmap(_unpack_nibbles)(w).astype(jnp.float32)[:, :k]
        vals = vals.reshape(vals.shape[0], -1, g, n)
        if el.zero_point is not None:
            vals = vals - el.zero_point[idx][:, :, None, :].astype(jnp.float32)
        return (vals * s[:, :, None, :].astype(jnp.float32)
                ).reshape(-1, k, n).astype(jnp.bfloat16)
    if el.kind == "nvfp4":
        g = int(md.get("group_size", 16))
        if w.dtype == jnp.int8:  # converted layout: 2x values, scale halved
            vals = w.astype(jnp.float32)
        else:
            vals = jax.vmap(_unpack_fp4)(w)[:, :k]
        vals = vals.reshape(vals.shape[0], -1, g, n)
        return (vals * s[:, :, None, :].astype(jnp.float32)
                ).reshape(-1, k, n).astype(jnp.bfloat16)
    if el.kind == "w8":
        g = md.get("group_size")
        vals = w.astype(jnp.float32)
        if g:
            vals = vals.reshape(vals.shape[0], -1, int(g), n)
            return (vals * s[:, :, None, :].astype(jnp.float32)
                    ).reshape(-1, k, n).astype(jnp.bfloat16)
        # per-channel: stacked scale is (S, 1, n) — broadcasts over k rows
        return (vals * s.reshape(s.shape[0], 1, n).astype(jnp.float32)
                ).astype(jnp.bfloat16)
    if el.kind == "fp8":
        vals = w.astype(jnp.float32)
        if md.get("strategy") == "block":
            bk, bn = int(md["block_k"]), int(md["block_n"])
            up = jnp.repeat(jnp.repeat(s.astype(jnp.float32), bk, axis=1),
                            bn, axis=2)
            return (vals * up[:, :k, :n]).astype(jnp.bfloat16)
        return (vals * s.astype(jnp.float32)).astype(jnp.bfloat16)
    raise ValueError(f"unsupported expert kind {el.kind}")


def _gathered_topk_ffn(moe: Dict[str, Any], h2: jax.Array, topi: jax.Array,
                       topv: jax.Array) -> jax.Array:
    """Decode-path MoE: compute only the selected (token, expert) slots.

    h2 (N, D); topi/topv (N, k) -> (N, D) combined output (f32).
    """
    from ..ops import kernels as _kernels

    N, k = topi.shape
    idx = topi.reshape(-1)                      # (N*k,)
    xs = jnp.repeat(h2, k, axis=0)              # (N*k, D)
    if "gate_up_proj" in moe:
        # fused w8pc serving layout (ops.linear.moe_w8pc_layout)
        try:
            y = _kernels.moe_slot_gu_ffn(xs, idx, moe["gate_up_proj"],
                                         moe["down_proj"])
        except _kernels.KernelUnsupported:
            gu_w = _slot_dequant(moe["gate_up_proj"], idx)  # (N*k, D, 2Fe)
            guv = jnp.einsum("sd,sdf->sf", xs, gu_w,
                             preferred_element_type=jnp.float32)
            Fe = guv.shape[-1] // 2
            a = (jax.nn.silu(guv[:, :Fe]) * guv[:, Fe:]).astype(h2.dtype)
            down_w = _slot_dequant(moe["down_proj"], idx)   # (N*k, Fe, D)
            y = jnp.einsum("sf,sfd->sd", a, down_w,
                           preferred_element_type=jnp.float32)
        y = y.reshape(N, k, -1) * topv[:, :, None].astype(jnp.float32)
        return y.sum(axis=1)
    try:
        # fused slot kernel: expert payloads stream HBM->VMEM and are
        # dequantized in place (the XLA path below materializes the
        # gathered experts in bf16/f32 — ~6 ms/projection/layer on v5e)
        y = _kernels.moe_slot_ffn(xs, idx, moe["gate_proj"], moe["up_proj"],
                                  moe["down_proj"])
    except _kernels.KernelUnsupported:
        gate_w = _slot_dequant(moe["gate_proj"], idx)   # (N*k, D, Fe)
        up_w = _slot_dequant(moe["up_proj"], idx)
        g = jnp.einsum("sd,sdf->sf", xs, gate_w, preferred_element_type=jnp.float32)
        u = jnp.einsum("sd,sdf->sf", xs, up_w, preferred_element_type=jnp.float32)
        a = (jax.nn.silu(g) * u).astype(h2.dtype)
        down_w = _slot_dequant(moe["down_proj"], idx)   # (N*k, Fe, D)
        y = jnp.einsum("sf,sfd->sd", a, down_w, preferred_element_type=jnp.float32)
    y = y.reshape(N, k, -1) * topv[:, :, None].astype(jnp.float32)
    return y.sum(axis=1)


def moe_forward(moe: Dict[str, Any], spec, x: jax.Array,
                all_experts: bool = False,
                capture: Optional[Dict[str, jax.Array]] = None) -> jax.Array:
    """x (B, T, D) -> (B, T, D).

    Two regimes:
    * **calibration / prefill** — a ``lax.scan`` over experts runs every
      expert on every token (so ``all_experts`` calibration needs no
      special routing change); unrouted contributions are zeroed by the
      combine weights.
    * **decode** (few tokens, no capture) — gathered top-k compute that
      only reads the routed experts' quantized weights from HBM.
    """
    B, T, D = x.shape
    N = B * T
    h2 = x.reshape(N, D)

    router: QuantLinear = moe["router"]
    logits = router.apply(h2.astype(jnp.float32))  # router kept high-precision
    k = spec.num_experts_per_tok
    topi, topv = route_topk_sparse(
        logits, k, spec.norm_topk_prob,
        scoring_func=spec.scoring_func,
        bias=moe.get("e_score_correction_bias"),
        routed_scaling_factor=spec.routed_scaling_factor,
    )
    want_capture = capture is not None

    # the gathered slot path (kernels + dequant fallbacks) does not apply
    # expert biases; biased stacks take the scan path below, whose per-
    # expert QuantLinear.apply does (rare — no shipped MoE family carries
    # expert FFN biases, but silence would be a numerics bug)
    bias_free = all(
        getattr(moe[key], "bias", None) is None
        for key in ("gate_up_proj", "gate_proj", "up_proj", "down_proj")
        if key in moe)

    if (not want_capture and not all_experts and bias_free
            and N <= _GATHER_DECODE_MAX_TOKENS and N * k < spec.num_experts):
        y = _gathered_topk_ffn(moe, h2, topi, topv)
        shared = moe.get("shared_experts")
        if shared is not None:
            a = jax.nn.silu(shared["gate_proj"].apply(h2).astype(jnp.float32)
                            ).astype(h2.dtype) * shared["up_proj"].apply(h2)
            y = y + shared["down_proj"].apply(a).astype(jnp.float32)
        return y.astype(x.dtype).reshape(B, T, D)

    E = spec.num_experts
    onehot = jax.nn.one_hot(topi, E, dtype=jnp.float32)
    weights = jnp.einsum("nk,nke->ne", topv, onehot)  # dense (N, E)

    down: ExpertLinears = moe["down_proj"]
    if "gate_up_proj" in moe:
        # fused w8pc serving layout: one apply yields gate|up together
        gu: ExpertLinears = moe["gate_up_proj"]

        def body(y, xs_e):
            gu_xs, d_xs, w_col = xs_e
            guv = gu._from_sliced(gu_xs).apply(h2).astype(jnp.float32)
            Fe = guv.shape[-1] // 2
            a = (jax.nn.silu(guv[:, :Fe]) * guv[:, Fe:]).astype(h2.dtype)
            out = down._from_sliced(d_xs).apply(a)  # (N, D)
            y = y + (w_col[:, None] * out.astype(jnp.float32))
            return y, (a if want_capture else None)

        xs = (gu._xs(), down._xs(), weights.T)
    else:
        gate: ExpertLinears = moe["gate_proj"]
        up: ExpertLinears = moe["up_proj"]

        def body(y, xs_e):
            g_xs, u_xs, d_xs, w_col = xs_e
            g = gate._from_sliced(g_xs)
            u = up._from_sliced(u_xs)
            d = down._from_sliced(d_xs)
            a = jax.nn.silu(g.apply(h2).astype(jnp.float32)).astype(h2.dtype) * u.apply(h2)
            out = d.apply(a)  # (N, D)
            y = y + (w_col[:, None] * out.astype(jnp.float32))
            ys = a if want_capture else None
            return y, ys

        xs = (gate._xs(), up._xs(), down._xs(), weights.T)  # weights.T: (E, N)
    y0 = jnp.zeros((N, D), jnp.float32)
    y, down_inputs = jax.lax.scan(body, y0, xs)

    # DeepSeek-style always-on shared experts: a plain dense MLP whose output
    # is added unscaled to the routed combination.
    shared = moe.get("shared_experts")
    if shared is not None:
        a = jax.nn.silu(shared["gate_proj"].apply(h2).astype(jnp.float32)
                        ).astype(h2.dtype) * shared["up_proj"].apply(h2)
        if want_capture:
            capture["shared_gate_proj"] = h2
            capture["shared_up_proj"] = h2
            capture["shared_down_proj"] = a
        y = y + shared["down_proj"].apply(a).astype(jnp.float32)

    if want_capture:
        capture["router"] = h2
        capture["moe_gate_proj"] = h2
        capture["moe_up_proj"] = h2
        capture["moe_down_proj"] = down_inputs  # (E, N, Fe)
        capture["moe_weights"] = weights
    return y.astype(x.dtype).reshape(B, T, D)
