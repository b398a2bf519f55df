"""Modifier protocol + RTN (`QuantizationModifier`).

A modifier transforms one layer's weights given (optionally) captured
activations. The engine drives it layer-by-layer:

    state = modifier.begin_layer(...)
    for batch: modifier.observe(state, site, x_in, mask)   # if needs_capture
    modifier.compress(state, site, group, scheme) -> SiteResult

RTN is the reference's ``QuantizationModifier`` (used data-free in
``main_seed-oss-fp8.py:31-33`` and for FP8 attention in the mixed recipes):
pure round-to-nearest under the scheme's observer, no activation feedback —
except static (non-dynamic) activation schemes, whose ``input_scale`` /
``output_scale`` are calibrated from captured activations.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.numerics import QuantizedTensor, quantize
from ..core.scheme import QuantizationArgs, QuantScheme
from ..formats.checkpoint import CompressedParam
from ..models.moe import ExpertLinears
from ..ops.linear import QuantLinear, from_quantized
from ..recipes import ModifierSpec
from .sites import LinearSite

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class SiteResult:
    """Outcome of compressing one site."""

    new_linear: Any  # QuantLinear | ExpertLinears
    records: Dict[str, CompressedParam]  # per concrete HF prefix
    extra_tensors: Dict[str, np.ndarray] = dataclasses.field(default_factory=dict)


def weight_nk(lin: QuantLinear) -> jnp.ndarray:
    """Current weight in HF (N, K) orientation, f32."""
    return lin.dequantize(jnp.float32).T


def expert_weights_enk(el: ExpertLinears) -> jnp.ndarray:
    """(E, N, K) f32 stack of an expert group's weights."""
    return jnp.stack([el.expert(e).dequantize(jnp.float32).T
                      for e in range(el.num_experts)])


def quantize_weight_nk(w_nk: jnp.ndarray, args: QuantizationArgs):
    """quantize + build device layout; returns (QuantLinear-payload parts)."""
    qt = quantize(w_nk, args)
    return qt


def _to_host(qt):
    return qt._replace(
        values=np.asarray(qt.values),
        scale=np.asarray(qt.scale),
        zero_point=None if qt.zero_point is None else np.asarray(qt.zero_point),
        global_scale=None if qt.global_scale is None else np.asarray(qt.global_scale),
    )


def _quantize_expert_stack(el, w_enk: jnp.ndarray, args: QuantizationArgs,
                           act_args: Optional[QuantizationArgs]):
    """RTN-quantize a whole (E, N, K) expert stack with ONE vmapped
    program instead of a per-expert Python loop.

    A 64-expert MoE block dispatches ~3000 small ops through the
    per-expert path (quantize + relayout per expert per stack) — ~11.5 s
    per layer of pure enqueue overhead through the tunneled transport
    (round-5 measurement at Qwen3-30B-A3B geometry). The vmapped path
    dispatches one batched program per stack. Returns
    ``(ExpertLinears, [per-expert QuantizedTensor slices])`` or None when
    the layout has no device relayout (callers keep the loop)."""
    import jax as _jax

    from ..ops.linear import _from_quantized_device

    E, N, K = w_enk.shape
    meta_cell: List[Any] = []

    def one(w):
        qt = quantize(w, args)
        lin = _from_quantized_device(qt, args, jnp.bfloat16, act_args, N, K)
        if lin is None:
            return None
        if not meta_cell:  # trace-time capture: vmap traces `one` once
            meta_cell.append((lin.kind, lin.meta))
        out = {"v": qt.values, "s": qt.scale, "lw": lin.weight,
               "ls": lin.scale}
        if qt.zero_point is not None:
            out["zp"] = qt.zero_point
        if qt.global_scale is not None:
            out["gs"] = qt.global_scale
        if lin.zero_point is not None:
            out["lzp"] = lin.zero_point
        return out

    # probe the layout support on one expert's abstract shapes (no compute)
    probe = _jax.eval_shape(one, _jax.ShapeDtypeStruct((N, K), jnp.float32))
    if probe is None:
        return None
    meta_cell.clear()
    r = _jax.vmap(one)(w_enk.astype(jnp.float32))
    kind, meta = meta_cell[0]
    new_el = ExpertLinears(kind=kind, weight=r["lw"], scale=r["ls"],
                           zero_point=r.get("lzp"), bias=el.bias, meta=meta)
    qts = [QuantizedTensor(
        values=r["v"][e], scale=r["s"][e],
        zero_point=None if "zp" not in r else r["zp"][e],
        global_scale=None if "gs" not in r else r["gs"][e],
        shape=(N, K)) for e in range(E)]
    return new_el, qts


def build_site_result(site: LinearSite, args: QuantizationArgs, group: str,
                      w_nk: Optional[jnp.ndarray] = None,
                      w_enk: Optional[jnp.ndarray] = None,
                      g_idx: Optional[np.ndarray] = None,
                      qt: Optional[Any] = None,
                      qt_per_expert: Optional[List[Any]] = None,
                      act_args: Optional[QuantizationArgs] = None) -> SiteResult:
    """Quantize a site's weights (already transformed by the algorithm) and
    assemble the new device linear + on-disk records. Callers that solved
    their own quantization (GPTQ/AutoRound) pass prebuilt ``qt`` /
    ``qt_per_expert`` instead of raw weights. ``act_args`` (the scheme's
    ``input_activations``) is recorded on the device linear so serving
    computes with quantized activations where a native path exists (W8A8
    int8 MXU)."""
    # Records and device linears are built from the DEVICE QuantizedTensor:
    # the per-site _to_host download used to run inside the solve loop —
    # ~100 MB/layer through the tunneled transport's 16 MB/s, a third of
    # the GPTQ full-depth wall. Records stay device-resident; the engine
    # converts them per layer under offload="host" (where evicting them IS
    # the point), and the serialization layer np.asarray's at write time.
    if site.is_expert:
        el: ExpertLinears = site.get()
        if qt_per_expert is None and w_enk is not None:
            stacked = _quantize_expert_stack(el, w_enk, args, act_args)
            if stacked is not None:
                return SiteResult(new_linear=stacked[0], records={
                    site.expert_prefix(e): CompressedParam(qt=stacked[1][e],
                                                           args=args, group=group)
                    for e in range(el.num_experts)})
        new_lins: List[QuantLinear] = []
        records: Dict[str, CompressedParam] = {}
        for e in range(el.num_experts):
            qt_e = qt_per_expert[e] if qt_per_expert is not None else quantize(w_enk[e], args)
            bias = el.expert(e).bias
            new_lins.append(from_quantized(qt_e, args, bias=bias,
                                           act_args=act_args))
            records[site.expert_prefix(e)] = CompressedParam(qt=qt_e, args=args, group=group)
        return SiteResult(new_linear=ExpertLinears.stack(new_lins), records=records)

    lin: QuantLinear = site.get()
    if qt is None:
        qt = quantize(w_nk, args)
    new_lin = from_quantized(qt, args, bias=lin.bias, act_args=act_args)
    rec = CompressedParam(qt=qt, args=args, group=group,
                          g_idx=None if g_idx is None else np.asarray(g_idx))
    return SiteResult(new_linear=new_lin, records={site.prefix: rec})


# ---------------------------------------------------------------------------
# static activation-scale observation (shared by all modifiers)
# ---------------------------------------------------------------------------

class ActScaleObserver:
    """Tracks absmax of a site's input activations for static act schemes
    (e.g. per-tensor FP8 `main_seed-oss-fp8-kv8.py:168-202`)."""

    def __init__(self) -> None:
        self.absmax: float = 0.0

    def update(self, x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> None:
        xf = jnp.abs(x.astype(jnp.float32)).reshape(-1, x.shape[-1])
        if mask is not None:
            m = mask.reshape(-1).astype(jnp.float32)
            if m.shape[0] == xf.shape[0]:
                xf = xf * m[:, None]
        self.absmax = max(self.absmax, float(jnp.max(xf)))

    def scale(self, args: QuantizationArgs) -> np.ndarray:
        s = self.absmax / args.scale_divisor
        return np.asarray([max(s, 1e-10)], dtype=np.float32)


def needs_static_act(scheme: QuantScheme) -> bool:
    a = scheme.input_activations
    return a is not None and not a.dynamic


@dataclasses.dataclass
class LayerCtx:
    """Everything a modifier may need about the layer being compressed."""

    spec: Any  # ModelSpec
    layer_idx: int
    layer: Dict[str, Any]
    sites: List[LinearSite]


class Modifier:
    """Base modifier. Subclasses override the hooks they need."""

    name = "Modifier"
    needs_capture = False
    #: transform-only modifiers (SmoothQuant) fold scales into weights but
    #: never claim sites for compression — a paired quantization modifier
    #: owns that.
    transforms_only = False

    def __init__(self, spec: ModifierSpec) -> None:
        self.spec = spec

    # --- per-layer protocol -------------------------------------------------
    def begin_layer(self, ctx: LayerCtx,
                    matched: List[Tuple[LinearSite, str, QuantScheme]]) -> Any:
        """matched: (site, group_name, scheme) triples this modifier owns."""
        state: Dict[str, Any] = {"act_obs": {}}
        for site, _, scheme in matched:
            if scheme is not None and needs_static_act(scheme):
                state["act_obs"][site.prefix] = ActScaleObserver()
        return state

    def wants_capture_for(self, matched) -> bool:
        return self.needs_capture or any(
            s is not None and needs_static_act(s) for _, _, s in matched)

    def observe(self, state: Any, site: LinearSite, x_in: jnp.ndarray,
                mask: Optional[jnp.ndarray], capture: Dict[str, jnp.ndarray]) -> None:
        obs = state["act_obs"].get(site.prefix)
        if obs is not None:
            obs.update(x_in, mask)

    def sync_arrays(self, state: Any):
        """Device arrays whose values depend on every observe() so far —
        the engine reads one element of each as its pipeline barrier.
        On PJRT, D2H transfers complete on DATA dependency (not stream
        order), so only a readback of an observe *result* actually waits
        for the observe work; subclasses with device-resident accumulators
        must yield them here."""
        return ()

    def pre_compress(self, state: Any, ctx: LayerCtx,
                     matched: List[Tuple[LinearSite, str, QuantScheme]]) -> None:
        """Layer-level weight transform before per-site quantization
        (AWQ smoothing lives here)."""

    def compress(self, state: Any, site: LinearSite, group: str,
                 scheme: QuantScheme) -> SiteResult:
        raise NotImplementedError

    def finalize_site(self, state: Any, site: LinearSite, scheme: QuantScheme,
                      result: SiteResult) -> SiteResult:
        """Attach static activation scales."""
        obs = state["act_obs"].get(site.prefix)
        if obs is not None and scheme.input_activations is not None:
            scale = obs.scale(scheme.input_activations)
            if site.is_expert:
                el: ExpertLinears = result.new_linear
                for e in range(el.num_experts):
                    result.extra_tensors[f"{site.expert_prefix(e)}.input_scale"] = scale
            else:
                result.extra_tensors[f"{site.prefix}.input_scale"] = scale
        return result


class RTNModifier(Modifier):
    """Round-to-nearest under the scheme's observer — the
    `QuantizationModifier` of the reference's recipes."""

    name = "QuantizationModifier"
    needs_capture = False

    def compress(self, state: Any, site: LinearSite, group: str,
                 scheme: QuantScheme) -> SiteResult:
        args = scheme.weights
        act = scheme.input_activations
        if site.is_expert:
            w = expert_weights_enk(site.get())
            res = build_site_result(site, args, group, w_enk=w, act_args=act)
        else:
            w = weight_nk(site.get())
            res = build_site_result(site, args, group, w_nk=w, act_args=act)
        return self.finalize_site(state, site, scheme, res)
