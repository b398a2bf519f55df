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
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.numerics import fake_quantize
from ..core.scheme import QuantScheme
from ..models.moe import ExpertLinears
from ..ops.linear import QuantLinear
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


@partial(jax.jit, static_argnames=("take", "masked"))
def _observe_stats(x, mask, take: int, masked: bool):
    """Device-side reduction of one batch's activations: per-channel
    |x| column sum, valid-row count, and ``take`` evenly-spread valid rows.

    The α-search only ever needs the (K,) mean and ≤512 sample rows, so the
    host transfer is O(K + take·K) instead of the full (B·T, K) block —
    at Qwen3-4B calibration geometry that's ~1000× less PCIe/tunnel traffic
    per observe() than pulling the activations to numpy."""
    x2 = x.astype(jnp.float32).reshape(-1, x.shape[-1])
    R = x2.shape[0]
    if masked:
        m = (mask.reshape(-1) > 0).astype(jnp.float32)
    else:
        m = jnp.ones((R,), jnp.float32)
    sum_abs = jnp.sum(jnp.abs(x2) * m[:, None], axis=0)
    count = jnp.sum(m)
    # valid rows first (stable keeps original order), then sample `take`
    # positions evenly spread over the valid span
    perm = jnp.argsort(-m, stable=True)
    n_valid = jnp.maximum(count, 1.0)
    pos = jnp.clip((jnp.arange(take) * n_valid / take).astype(jnp.int32),
                   0, R - 1)
    rows = x2[perm[pos]]
    return sum_abs, count, rows


class _MappingState:
    """Streaming stats for one smooth→balance group. Reductions run AND
    accumulate on device (:func:`_observe_stats`); ``update`` performs zero
    host syncs — a device→host sync per observe over a tunneled TPU costs
    more than the reduction itself. Only pre_compress reads the (K,)-mean
    and the ≤512-row search sample back."""

    def __init__(self) -> None:
        self.sum_abs: Optional[jnp.ndarray] = None  # (K,) device
        self.count: Optional[jnp.ndarray] = None  # () device f32
        self.rows: List[jnp.ndarray] = []  # subsampled input rows (r, K)
        self.rows_kept = 0

    def update(self, x: jnp.ndarray, mask: Optional[jnp.ndarray],
               valid_rows: Optional[int] = None) -> None:
        x2_rows = int(np.prod(x.shape[:-1]))
        if x2_rows == 0:
            return
        masked = (mask is not None
                  and int(np.prod(mask.shape)) == x2_rows)
        # budget the sample by VALID rows (engine-provided host-side count):
        # a heavily padded batch must not fill MAX_SEARCH_ROWS with
        # duplicates and starve later batches of distinct sample rows
        n_valid = valid_rows if (masked and valid_rows is not None) else x2_rows
        take = min(MAX_SEARCH_ROWS - self.rows_kept, n_valid)
        sum_abs, count, rows = _observe_stats(
            jnp.asarray(x), jnp.asarray(mask) if masked else jnp.zeros((1,)),
            take=max(take, 1), masked=masked)
        if self.sum_abs is None:
            self.sum_abs, self.count = sum_abs, count
        else:
            self.sum_abs = self.sum_abs + sum_abs
            self.count = self.count + count
        if take > 0:
            # a fully-masked batch would contribute padding-token rows here;
            # make_batches guarantees ≥1 valid token per sample, and the
            # sampler clips to the valid span whenever one exists
            self.rows.append(rows)
            self.rows_kept += take

    def count_f(self) -> float:
        """Total valid rows (ONE host sync; call only at solve time)."""
        return 0.0 if self.count is None else float(self.count)

    @property
    def x_mean(self) -> np.ndarray:
        return np.asarray(self.sum_abs) / max(self.count_f(), 1.0)

    def x_rows(self) -> jnp.ndarray:
        return (jnp.concatenate(self.rows, axis=0)
                if self.rows else jnp.zeros((0, 1)))


@jax.jit
def _col_abs_mean(ws):
    """Row-weighted per-column |w| mean over a tuple of (N_i, K) weights."""
    total = sum(jnp.sum(jnp.abs(w.astype(jnp.float32)), axis=0) for w in ws)
    n_rows = sum(w.shape[0] for w in ws)
    return total / n_rows


def _candidate_scale(ratio, x_mean, w_mean, duo_scaling: bool):
    """The α-parameterized per-channel scale family (numpy or jnp)."""
    np_ = jnp if isinstance(x_mean, jnp.ndarray) else np
    if duo_scaling:
        s = np_.power(x_mean, ratio) / np_.power(w_mean, 1.0 - ratio)
    else:
        s = np_.power(x_mean, ratio)
    s = np_.clip(s, 1e-4, 1e4)
    return s / np_.sqrt(np_.max(s) * np_.min(s))


@partial(jax.jit, static_argnames=("wargs", "duo_scaling"))
def _search_losses(x_j, x_mean_j, w_mean_j, bweights, ratios, *,
                   wargs, duo_scaling: bool):
    """α-grid losses in ONE compiled program. Module-level jit: the cache
    key is (weight shapes, wargs, duo_scaling), so all 36 layers of a
    uniform model reuse 4 compilations (one per mapping shape) instead of
    recompiling a fresh closure every layer."""
    def loss_for(ratio: jnp.ndarray) -> jnp.ndarray:
        s = _candidate_scale(ratio, x_mean_j, w_mean_j, duo_scaling)
        total = jnp.zeros((), jnp.float32)
        for w in bweights:  # (N, K)
            y_ref = x_j @ w.T
            wq = fake_quantize(w * s[None, :], wargs)
            y_q = (x_j / s[None, :]) @ wq.T
            total = total + jnp.mean((y_ref - y_q) ** 2)
        return total

    # sequential over the grid: one candidate's fake-quant intermediates
    # live at a time (~|bweights| (N,K) f32 buffers). vmap batched all 20
    # candidates — at MoE expert-stack geometry (3x (64*768, 2048) f32
    # balance weights) that is a ~24 GB peak which crashed the TPU
    # compile helper outright; the loss is matmul-bound so the serial
    # map costs nothing.
    return jax.lax.map(loss_for, ratios)


def _search_scale(x_rows: np.ndarray, x_mean: np.ndarray, w_mean: np.ndarray,
                  balance_weights: List[jnp.ndarray], wargs, duo_scaling: bool
                  ) -> np.ndarray:
    """Grid-search α; returns the winning per-channel scale (K,)."""
    x_mean = np.maximum(x_mean, 1e-8)
    w_mean = np.maximum(w_mean, 1e-8)
    ratios = np.arange(N_GRID, dtype=np.float32) / N_GRID

    losses = _search_losses(
        jnp.asarray(x_rows, jnp.float32),
        jnp.asarray(x_mean, jnp.float32),
        jnp.asarray(w_mean, jnp.float32),
        tuple(balance_weights), jnp.asarray(ratios),
        wargs=wargs, duo_scaling=duo_scaling)
    best = int(jnp.argmin(losses))
    s = _candidate_scale(np.float32(ratios[best]),
                         x_mean.astype(np.float32),
                         w_mean.astype(np.float32), duo_scaling)
    logger.debug("AWQ best ratio %.2f (loss %.3e)", ratios[best], float(losses[best]))
    return np.asarray(s, np.float32)


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
            # (E, N, C): expert-specific inputs — average stats over experts
            # (gate/up share the dense input so this path only triggers for
            # down_proj). Every expert sees the same token axis, so the
            # per-token mask tiles across E and the sample budget counts
            # E×valid rows — without it a heavily padded batch fills
            # MAX_SEARCH_ROWS with duplicate padding rows (the starvation
            # the valid_rows plumbing exists to prevent).
            E, N = x_in.shape[0], x_in.shape[1]
            flat = x_in.reshape(-1, x_in.shape[-1])
            m = None
            if mask is not None and int(np.prod(mask.shape)) == N:
                m = jnp.tile(jnp.asarray(mask).reshape(-1), E)
            vr = capture.get("_valid_rows")
            r["stats"].update(flat, m,
                              valid_rows=None if vr is None else E * vr)
        else:
            r["stats"].update(x_in, mask,
                              valid_rows=capture.get("_valid_rows"))
        r["_seen_key"] = key  # one update per batch per mapping

    def sync_arrays(self, state):
        # each mapping's sum_abs accumulates once per batch; reading one
        # element of each barriers the observe reductions enqueued so far
        return [r["stats"].sum_abs for r in state["mappings"]
                if r["stats"].sum_abs is not None]

    def pre_compress(self, state, ctx: LayerCtx, matched) -> None:
        """Fold the best smoothing scales into smooth + balance weights."""
        scheme_by_prefix = {s.prefix: sch for s, _, sch in matched}
        for r in state["mappings"]:
            stats: _MappingState = r["stats"]
            if stats.rows_kept == 0 or stats.count_f() == 0.0:
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
            # column |w| mean on DEVICE — pulling the raw balance weights to
            # host costs ~130 MB/layer over a tunneled chip; only the (K,)
            # result crosses
            w_mean = np.asarray(_col_abs_mean(tuple(bweights)))
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


def _dense_from_kn(w_kn: jnp.ndarray, bias) -> QuantLinear:
    """Dense QuantLinear from an already-(K, N) DEVICE weight — the folds
    below must not round-trip ~700 MB/layer of dequantized f32 through the
    host the way dense_linear(np.asarray(w).T) would."""
    w = w_kn.astype(jnp.bfloat16)
    k, n = w.shape
    return QuantLinear(
        kind="dense", weight=w,
        bias=None if bias is None else jnp.asarray(bias, jnp.bfloat16),
        meta=(("k", k), ("n", n)),
    )


def _fold_rows(lin: QuantLinear, inv_scale: jnp.ndarray) -> QuantLinear:
    """Divide a linear's *output channels* by scale (smooth side)."""
    w = lin.dequantize(jnp.float32)  # (K, N)
    w = w / inv_scale[None, :]
    bias = None if lin.bias is None else lin.bias.astype(jnp.float32) / inv_scale
    return _dense_from_kn(w, bias)


def _fold_cols(lin: QuantLinear, scale: jnp.ndarray) -> QuantLinear:
    """Multiply a linear's *input channels* by scale (balance side)."""
    w = lin.dequantize(jnp.float32)  # (K, N)
    w = w * scale[:, None]
    return _dense_from_kn(w, lin.bias)


def _expert_stack_dequant(el: ExpertLinears) -> jnp.ndarray:
    """Dequantize ALL experts in one vmapped dispatch → (E, K, N) f32."""
    xs = el._xs()
    in_axes = tuple(0 if a is not None else None for a in xs)
    return jax.vmap(
        lambda w, s, z, b: el._from_sliced((w, s, z, b)).dequantize(jnp.float32),
        in_axes=in_axes)(*xs)


def _fold_expert_stack(el: ExpertLinears, scale: jnp.ndarray,
                       rows: bool) -> ExpertLinears:
    """Fold a smoothing scale into a whole expert stack at once — the
    per-expert loop costs E·3 dispatches/site (≈half an hour of pure
    tunnel overhead on a 128-expert, 62-layer MiniMax-class run)."""
    deq = _expert_stack_dequant(el)  # (E, K, N)
    if rows:  # smooth side: divide output channels
        deq = deq / scale[None, None, :]
        bias = None if el.bias is None else (
            el.bias.astype(jnp.float32) / scale[None, :]).astype(jnp.bfloat16)
    else:  # balance side: multiply input channels
        deq = deq * scale[None, :, None]
        bias = el.bias
    K, N = deq.shape[1], deq.shape[2]
    return ExpertLinears(kind="dense", weight=deq.astype(jnp.bfloat16),
                         bias=bias, meta=(("k", K), ("n", N)))


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
        site.set(_fold_expert_stack(site.get(), scale, rows=True))

    for b in balance:
        if b.is_expert:
            b.set(_fold_expert_stack(b.get(), scale, rows=False))
        else:
            b.set(_fold_cols(b.get(), scale))
