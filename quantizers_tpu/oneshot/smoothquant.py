"""SmoothQuant — fixed-strength activation-outlier migration.

The reference's recipe dialect admits ``SmoothQuantModifier`` (llmcompressor
modifier zoo; typically paired with a ``QuantizationModifier`` for W8A8).
Unlike AWQ there is no grid search: the per-channel scale is

    s_j = act_absmax_j^α / weight_absmax_j^(1-α)

with ``smoothing_strength`` α (default 0.5), folded into the smooth layer
(÷) and balance layers (×). This modifier only *transforms* weights — the
paired quantization modifier owns compression, so it is registered as
``transforms_only`` and never claims sites.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List

import jax.numpy as jnp
import numpy as np

from ..recipes import DEFAULT_AWQ_MAPPINGS
from .awq import _MappingState, _apply_smoothing, _matches_balance, _resolve_smooth
from .modifiers import LayerCtx, Modifier, expert_weights_enk, weight_nk
from .sites import LinearSite

logger = logging.getLogger(__name__)


class SmoothQuantModifier(Modifier):
    name = "SmoothQuantModifier"
    needs_capture = True
    transforms_only = True

    @property
    def smoothing_strength(self) -> float:
        return float(self.spec.extra.get("smoothing_strength", 0.5))

    def begin_layer(self, ctx: LayerCtx, matched) -> Any:
        state = super().begin_layer(ctx, matched)
        mappings = self.spec.mappings or DEFAULT_AWQ_MAPPINGS
        resolved: List[Dict[str, Any]] = []
        for m in mappings:
            balance = [s for s in ctx.sites if _matches_balance(m, s)]
            smooth = _resolve_smooth(m, ctx)
            if balance and smooth is not None:
                resolved.append({"mapping": m, "smooth": smooth,
                                 "balance": balance, "stats": _MappingState()})
        state["mappings"] = resolved
        state["by_capture"] = {}
        for r in resolved:
            for s in r["balance"]:
                state["by_capture"].setdefault(s.capture_key, r)
        return state

    def observe(self, state, site: LinearSite, x_in, mask, capture) -> None:
        r = state["by_capture"].get(site.capture_key)
        key = capture.get("_batch_idx", id(capture))
        if r is None or r.get("_seen_key") == key:
            return
        if site.is_expert and x_in.ndim == 3:
            r["stats"].update(x_in.reshape(-1, x_in.shape[-1]), None)
        else:
            r["stats"].update(x_in, mask)
        r["_seen_key"] = key

    def pre_compress(self, state, ctx: LayerCtx, matched) -> None:
        alpha = self.smoothing_strength
        for r in state["mappings"]:
            stats: _MappingState = r["stats"]
            if stats.count == 0:
                continue
            balance: List[LinearSite] = r["balance"]
            ws = []
            for s in balance:
                if s.is_expert:
                    w = expert_weights_enk(s.get())
                    ws.append(np.abs(np.asarray(w)).max(axis=(0, 1)))
                else:
                    ws.append(np.abs(np.asarray(weight_nk(s.get()))).max(axis=0))
            w_absmax = np.maximum.reduce(ws)
            x_rows = stats.x_rows()
            if x_rows.shape[-1] != w_absmax.shape[0]:
                continue
            act_absmax = np.maximum(np.abs(x_rows).max(axis=0), 1e-8)
            s = np.power(act_absmax, alpha) / np.power(
                np.maximum(w_absmax, 1e-8), 1.0 - alpha)
            s = np.clip(s, 1e-4, 1e4).astype(np.float32)
            _apply_smoothing(ctx, r["smooth"], balance, s)
            logger.debug("SmoothQuant folded scales for %s (α=%.2f)",
                         r["mapping"].smooth_layer, alpha)
