"""AWQ — activation-aware weight quantization.

TPU-native implementation of the algorithm the reference drives through
``AWQModifier`` (recipes ``recipe_awq_w4a16.yaml:7-32``,
``recipe_Minimax-M2.1-AWQ-MixedPrec.yaml:50-59``): for each
smooth→balance mapping, grid-search a per-in-channel scale
``s = x_mean^α / w_mean^(1-α)`` (``duo_scaling``; plain ``x_mean^α``
otherwise), pick the α minimizing the fake-quantized output MSE on captured
activations, fold ``s`` into the smooth layer (÷) and balance layers (×),
then RTN-quantize the smoothed weights.

All searching is jit-compiled: the α grid is a ``vmap`` over candidate
scales, so one compile evaluates the whole grid as a batched matmul — MXU
work, not a Python loop.
"""

from __future__ import annotations

import logging
import re
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.numerics import fake_quantize
from ..core.scheme import QuantScheme
from ..models.moe import ExpertLinears
from ..ops.linear import QuantLinear, dense_linear
from ..recipes import DEFAULT_AWQ_MAPPINGS, AWQMapping
from .modifiers import LayerCtx, Modifier, SiteResult, build_site_result, weight_nk, expert_weights_enk
from .sites import LinearSite

logger = logging.getLogger(__name__)

N_GRID = 20
MAX_SEARCH_ROWS = 512  # activation rows kept for the α-loss evaluation


def _matches(pattern: str, path: str) -> bool:
    if pattern.startswith("re:"):
        return re.match(pattern[3:], path) is not None
    return path.endswith(pattern)


class _MappingState:
    """Streaming stats for one smooth→balance group."""

    def __init__(self) -> None:
        self.sum_abs: Optional[np.ndarray] = None  # (K,)
        self.count: float = 0.0
        self.rows: List[np.ndarray] = []  # subsampled input rows (r, K)
        self.rows_kept = 0

    def update(self, x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> None:
        x2 = np.asarray(x.astype(jnp.float32)).reshape(-1, x.shape[-1])
        if mask is not None:
            m = np.asarray(mask).reshape(-1) > 0
            if m.shape[0] == x2.shape[0]:
                x2 = x2[m]
        if x2.size == 0:
            return
        s = np.sum(np.abs(x2), axis=0)
        self.sum_abs = s if self.sum_abs is None else self.sum_abs + s
        self.count += x2.shape[0]
        if self.rows_kept < MAX_SEARCH_ROWS:
            take = min(MAX_SEARCH_ROWS - self.rows_kept, x2.shape[0])
            # spread the subsample across the batch
            idx = np.linspace(0, x2.shape[0] - 1, take).astype(np.int64)
            self.rows.append(x2[idx])
            self.rows_kept += take

    @property
    def x_mean(self) -> np.ndarray:
        return self.sum_abs / max(self.count, 1.0)

    def x_rows(self) -> np.ndarray:
        return np.concatenate(self.rows, axis=0) if self.rows else np.zeros((0, 1))


def _search_scale(x_rows: np.ndarray, x_mean: np.ndarray, w_mean: np.ndarray,
                  balance_weights: List[jnp.ndarray], wargs, duo_scaling: bool
                  ) -> np.ndarray:
    """Grid-search α; returns the winning per-channel scale (K,)."""
    K = x_mean.shape[0]
    x_mean_j = jnp.asarray(np.maximum(x_mean, 1e-8), jnp.float32)
    w_mean_j = jnp.asarray(np.maximum(w_mean, 1e-8), jnp.float32)
    x_j = jnp.asarray(x_rows, jnp.float32)

    ratios = np.arange(N_GRID, dtype=np.float32) / N_GRID

    def candidate(ratio: jnp.ndarray) -> jnp.ndarray:
        if duo_scaling:
            s = jnp.power(x_mean_j, ratio) / jnp.power(w_mean_j, 1.0 - ratio)
        else:
            s = jnp.power(x_mean_j, ratio)
        s = jnp.clip(s, 1e-4, 1e4)
        s = s / jnp.sqrt(jnp.max(s) * jnp.min(s))
        return s

    def loss_for(ratio: jnp.ndarray) -> jnp.ndarray:
        s = candidate(ratio)
        total = jnp.zeros((), jnp.float32)
        for w in balance_weights:  # (N, K)
            y_ref = x_j @ w.T
            wq = fake_quantize(w * s[None, :], wargs)
            y_q = (x_j / s[None, :]) @ wq.T
            total = total + jnp.mean((y_ref - y_q) ** 2)
        return total

    losses = jax.jit(jax.vmap(loss_for))(jnp.asarray(ratios))
    best = int(jnp.argmin(losses))
    s = candidate(jnp.asarray(ratios[best]))
    logger.debug("AWQ best ratio %.2f (loss %.3e)", ratios[best], float(losses[best]))
    return np.asarray(s)


class AWQModifier(Modifier):
    name = "AWQModifier"
    needs_capture = True

    def begin_layer(self, ctx: LayerCtx, matched) -> Any:
        state = super().begin_layer(ctx, matched)
        mappings = self.spec.mappings or DEFAULT_AWQ_MAPPINGS
        # resolve mappings to sites present in this layer
        resolved: List[Dict[str, Any]] = []
        site_by_prefix = {s.prefix: s for s in ctx.sites}
        matched_prefixes = {s.prefix for s, _, _ in matched}
        for m in mappings:
            balance = [s for s in ctx.sites
                       if _matches_balance(m, s) and s.prefix in matched_prefixes]
            if not balance:
                continue
            smooth = _resolve_smooth(m, ctx)
            if smooth is None:
                continue
            resolved.append({
                "mapping": m,
                "smooth": smooth,  # ("norm", key) | ("linear", site) | ("expert_linear", site)
                "balance": balance,
                "stats": _MappingState(),
            })
        state["mappings"] = resolved
        # capture-key → mapping lookup for observe()
        state["by_capture"] = {}
        for r in resolved:
            for s in r["balance"]:
                state["by_capture"].setdefault(s.capture_key, r)
        return state

    def observe(self, state, site: LinearSite, x_in, mask, capture) -> None:
        super().observe(state, site, x_in, mask, capture)
        r = state["by_capture"].get(site.capture_key)
        key = capture.get("_batch_idx", id(capture))
        if r is None or r.get("_seen_key") == key:
            return
        if site.is_expert and x_in.ndim == 3:
            # (E, N, C): expert-specific inputs — average stats over experts,
            # subsample rows from expert 0 (gate/up share the dense input so
            # this path only triggers for down_proj).
            r["stats"].update(x_in.reshape(-1, x_in.shape[-1]), None)
        else:
            r["stats"].update(x_in, mask)
        r["_seen_key"] = key  # one update per batch per mapping

    def pre_compress(self, state, ctx: LayerCtx, matched) -> None:
        """Fold the best smoothing scales into smooth + balance weights."""
        scheme_by_prefix = {s.prefix: sch for s, _, sch in matched}
        for r in state["mappings"]:
            stats: _MappingState = r["stats"]
            if stats.count == 0:
                logger.warning("AWQ mapping %s saw no activations; skipping",
                               r["mapping"].smooth_layer)
                continue
            balance: List[LinearSite] = r["balance"]
            wargs = scheme_by_prefix[balance[0].prefix].weights

            # gather balance weights (dense or per-expert-averaged for search)
            bweights: List[jnp.ndarray] = []
            for s in balance:
                if s.is_expert:
                    w = expert_weights_enk(s.get())  # (E, N, K)
                    bweights.append(w.reshape(-1, w.shape[-1]))
                else:
                    bweights.append(weight_nk(s.get()))
            K = bweights[0].shape[-1]
            w_mean = np.mean(
                np.concatenate([np.abs(np.asarray(w)) for w in bweights], axis=0),
                axis=0,
            )
            x_rows = stats.x_rows()
            if x_rows.shape[-1] != K:
                logger.warning("AWQ mapping %s: stat dim %d != weight dim %d; skipping",
                               r["mapping"].smooth_layer, x_rows.shape[-1], K)
                continue
            scale = _search_scale(x_rows, stats.x_mean, w_mean, bweights, wargs,
                                  self.spec.duo_scaling)
            _apply_smoothing(ctx, r["smooth"], balance, scale)

    def compress(self, state, site: LinearSite, group: str,
                 scheme: QuantScheme) -> SiteResult:
        args = scheme.weights
        act = scheme.input_activations
        if site.is_expert:
            res = build_site_result(site, args, group,
                                    w_enk=expert_weights_enk(site.get()),
                                    act_args=act)
        else:
            res = build_site_result(site, args, group,
                                    w_nk=weight_nk(site.get()), act_args=act)
        return self.finalize_site(state, site, scheme, res)


# ---------------------------------------------------------------------------
# mapping resolution + scale folding
# ---------------------------------------------------------------------------

def _matches_balance(m: AWQMapping, site: LinearSite) -> bool:
    paths = [site.prefix]
    if site.is_expert:
        paths.extend(site.alias_paths(0))  # incl. Mixtral/MiniMax w1/w2/w3 dialect
    return any(_matches(b, p) for b in m.balance_layers for p in paths)


def _resolve_smooth(m: AWQMapping, ctx: LayerCtx):
    p = f"model.layers.{ctx.layer_idx}"
    for key in ("input_layernorm", "post_attention_layernorm"):
        if _matches(m.smooth_layer, f"{p}.{key}"):
            return ("norm", key)
    for s in ctx.sites:
        paths = [s.prefix] + (s.alias_paths(0) if s.is_expert else [])
        if any(_matches(m.smooth_layer, pp) for pp in paths):
            return ("expert_linear", s) if s.is_expert else ("linear", s)
    return None


def _fold_rows(lin: QuantLinear, inv_scale: jnp.ndarray) -> QuantLinear:
    """Divide a linear's *output channels* by scale (smooth side)."""
    w = lin.dequantize(jnp.float32)  # (K, N)
    w = w / inv_scale[None, :]
    bias = None if lin.bias is None else np.asarray(lin.bias, np.float32) / np.asarray(inv_scale)
    return dense_linear(np.asarray(w).T, bias=bias)


def _fold_cols(lin: QuantLinear, scale: jnp.ndarray) -> QuantLinear:
    """Multiply a linear's *input channels* by scale (balance side)."""
    w = lin.dequantize(jnp.float32)  # (K, N)
    w = w * scale[:, None]
    bias = None if lin.bias is None else np.asarray(lin.bias, np.float32)
    return dense_linear(np.asarray(w).T, bias=bias)


def _apply_smoothing(ctx: LayerCtx, smooth, balance: List[LinearSite],
                     scale_np: np.ndarray) -> None:
    scale = jnp.asarray(scale_np, jnp.float32)
    spec = ctx.spec

    kind = smooth[0]
    if kind == "norm":
        key = smooth[1]
        ctx.layer[key] = (ctx.layer[key].astype(jnp.float32) / scale).astype(
            ctx.layer[key].dtype)
    elif kind == "linear":
        site = smooth[1]
        # v_proj→o_proj under GQA: o input channels (H*hd) map onto v output
        # channels (KV*hd) via head-group repetition — reconcile scales.
        if site.name == "v_proj" and any(b.name == "o_proj" for b in balance):
            H, KV, hd = spec.num_heads, spec.num_kv_heads, spec.head_dim
            rep = H // KV
            s_o = scale.reshape(H, hd)
            s_v = s_o.reshape(KV, rep, hd).mean(axis=1)  # (KV, hd)
            # rewrite the balance scale so it is consistent with s_v
            scale = jnp.repeat(s_v, rep, axis=0).reshape(H * hd)
            site.set(_fold_rows(site.get(), s_v.reshape(KV * hd)))
        else:
            site.set(_fold_rows(site.get(), scale))
    elif kind == "expert_linear":
        site = smooth[1]
        el: ExpertLinears = site.get()
        new = [_fold_rows(el.expert(e), scale) for e in range(el.num_experts)]
        site.set(ExpertLinears.stack(new))

    for b in balance:
        if b.is_expert:
            el = b.get()
            new = [_fold_cols(el.expert(e), scale) for e in range(el.num_experts)]
            b.set(ExpertLinears.stack(new))
        else:
            b.set(_fold_cols(b.get(), scale))
