"""AutoRound — learned rounding via sign-gradient descent.

TPU-native implementation of the reference's ``AutoRoundModifier``
(``configs/recipes/recipe_AR_W4A16G32.yaml:7-8``, ``iters: 200``): instead
of round-to-nearest, learn a per-weight rounding perturbation
``V ∈ [-0.5, 0.5]`` minimizing the layer's output MSE on captured
activations, optimized with signSGD and straight-through rounding. The
whole optimization is one jit-compiled ``lax.fori_loop`` — `iters`
MXU matmuls, no host round-trips.
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.numerics import QuantizedTensor, compute_scale_zp, minmax_along
from ..core.scheme import QuantScheme, QuantType
from .modifiers import (
    LayerCtx,
    Modifier,
    SiteResult,
    build_site_result,
    expert_weights_enk,
    weight_nk,
)
from .sites import LinearSite

logger = logging.getLogger(__name__)

MAX_ROWS = 1024


def _round_ste(x: jnp.ndarray) -> jnp.ndarray:
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


@partial(jax.jit, static_argnames=("iters", "group_size", "qmin", "qmax", "sym", "lr"))
def _autoround_solve(W: jnp.ndarray, X: jnp.ndarray, scale: jnp.ndarray,
                     zp: Optional[jnp.ndarray], *, iters: int, group_size: int,
                     qmin: float, qmax: float, sym: bool, lr: float):
    """Optimize rounding offsets; returns final integer grid values (N, K)."""
    N, K = W.shape
    n_groups = scale.shape[1]

    def wq_of(V: jnp.ndarray) -> jnp.ndarray:
        s = jnp.repeat(scale, group_size, axis=1)[:, :K]
        x = W / s + V
        if not sym and zp is not None:
            x = x + jnp.repeat(zp, group_size, axis=1)[:, :K]
        q = jnp.clip(_round_ste(x), qmin, qmax)
        if not sym and zp is not None:
            q = q - jnp.repeat(zp, group_size, axis=1)[:, :K]
        return q * s

    y_ref = X @ W.T

    def loss_fn(V: jnp.ndarray) -> jnp.ndarray:
        return jnp.mean((X @ wq_of(V).T - y_ref) ** 2)

    grad_fn = jax.value_and_grad(loss_fn)

    def step(i, carry):
        V, bestV, bestL = carry
        loss, g = grad_fn(V)
        # best-so-far snapshots the V the loss was MEASURED at (iter 0 ⇒
        # V=0 ⇒ plain RTN), so the result can never be worse than RTN.
        better = loss < bestL
        bestV = jnp.where(better, V, bestV)
        bestL = jnp.where(better, loss, bestL)
        decay = 1.0 - i.astype(jnp.float32) / iters
        V = jnp.clip(V - lr * decay * jnp.sign(g), -0.5, 0.5)
        return (V, bestV, bestL)

    V0 = jnp.zeros_like(W)
    V, bestV, bestL = jax.lax.fori_loop(
        0, iters, step, (V0, V0, jnp.asarray(jnp.inf, jnp.float32)))
    final_loss = loss_fn(V)
    bestV = jnp.where(final_loss < bestL, V, bestV)
    bestL = jnp.minimum(final_loss, bestL)

    s = jnp.repeat(scale, group_size, axis=1)[:, :K]
    x = W / s + bestV
    if not sym and zp is not None:
        x = x + jnp.repeat(zp, group_size, axis=1)[:, :K]
    q = jnp.clip(jnp.round(x), qmin, qmax)
    return q, bestL


def autoround_quantize(w_nk: jnp.ndarray, x_rows: np.ndarray, args,
                       iters: int = 200, lr: float = 0.05) -> QuantizedTensor:
    N, K = w_nk.shape
    W = w_nk.astype(jnp.float32)
    g = int(args.group_size) if args.group_size else K
    mn, mx = minmax_along(W, args)
    scale, zp = compute_scale_zp(mn, mx, args)
    if scale.ndim == 1:
        scale = scale.reshape(-1, 1)
        if zp is not None:
            zp = zp.reshape(-1, 1)
    X = jnp.asarray(x_rows, jnp.float32)
    qmin, qmax = args.qrange
    q, loss = _autoround_solve(
        W, X, scale, zp, iters=int(iters), group_size=g,
        qmin=float(qmin), qmax=float(qmax), sym=args.symmetric, lr=float(lr))
    vals = q.astype(jnp.int8) if args.type == QuantType.INT else q
    return QuantizedTensor(values=vals, scale=scale,
                           zero_point=None if args.symmetric else zp,
                           global_scale=None, shape=(N, K))


class AutoRoundModifier(Modifier):
    name = "AutoRoundModifier"
    needs_capture = True

    def begin_layer(self, ctx: LayerCtx, matched) -> Any:
        state = super().begin_layer(ctx, matched)
        state["X"] = {}  # key -> list of row blocks
        state["rows"] = {}
        return state

    def _keep(self, state, key: str, x2, mask, valid_rows) -> None:
        """Subsample ``take`` valid rows ON DEVICE (awq._observe_stats) —
        the numpy path this replaces downloaded every captured activation
        block before subsampling: ~2.3 GB/layer through the tunneled
        transport's 16 MB/s, which made AutoRound's capture stage alone
        218 s/layer (round-5 measurement)."""
        from .awq import _observe_stats

        kept = state["rows"].get(key, 0)
        if kept >= MAX_ROWS:
            return
        rows_total = int(np.prod(x2.shape[:-1]))
        masked = mask is not None and int(np.prod(mask.shape)) == rows_total
        n_valid = valid_rows if (masked and valid_rows is not None) else rows_total
        take = min(MAX_ROWS - kept, n_valid)
        if take <= 0:
            return
        _, _, rows = _observe_stats(
            jnp.asarray(x2), jnp.asarray(mask) if masked else jnp.zeros((1,)),
            take=take, masked=masked)
        state["X"].setdefault(key, []).append(rows)  # device (take, K)
        state["rows"][key] = kept + take

    def observe(self, state, site: LinearSite, x_in, mask, capture) -> None:
        super().observe(state, site, x_in, mask, capture)
        vr = capture.get("_valid_rows")
        if site.is_expert and x_in.ndim == 3:
            for e in range(x_in.shape[0]):
                self._keep(state, site.expert_prefix(e), x_in[e], mask, vr)
            return
        self._keep(state, site.prefix, x_in.reshape(-1, x_in.shape[-1]),
                   mask, vr)

    def sync_arrays(self, state):
        # newest device row blocks — reading an element barriers the
        # observe subsampling enqueued so far (engine pipeline bound).
        # Once every site's MAX_ROWS budget is full, later batches enqueue
        # NOTHING here: return [] so the engine falls back to its
        # capture-readback dispatch bound instead of "syncing" on stale,
        # already-computed blocks (which would bound nothing).
        cur = dict(state["rows"])
        if cur == state.get("_synced_rows"):
            return []
        state["_synced_rows"] = cur
        return [blocks[-1] for blocks in state["X"].values() if blocks]

    def _rows_for(self, state, key: str, k: int) -> jnp.ndarray:
        blocks = state["X"].get(key)
        if not blocks:
            logger.warning("AutoRound: no activations for %s; using unit rows", key)
            return jnp.ones((1, k), jnp.float32)
        return jnp.concatenate([jnp.asarray(b) for b in blocks], axis=0)

    def compress(self, state, site: LinearSite, group: str,
                 scheme: QuantScheme) -> SiteResult:
        args = scheme.weights
        iters = self.spec.iters
        if site.is_expert:
            el = site.get()
            w = expert_weights_enk(el)
            qts = []
            for e in range(el.num_experts):
                key = site.expert_prefix(e) if site.name == "down_proj" else site.prefix
                X = self._rows_for(state, key, w.shape[-1])
                qts.append(autoround_quantize(w[e], X, args, iters))
            res = build_site_result(site, args, group, qt_per_expert=qts,
                                    act_args=scheme.input_activations)
        else:
            w = weight_nk(site.get())
            X = self._rows_for(state, site.prefix, w.shape[-1])
            qt = autoround_quantize(w, X, args, iters)
            res = build_site_result(site, args, group, qt=qt,
                                    act_args=scheme.input_activations)
        return self.finalize_site(state, site, scheme, res)
