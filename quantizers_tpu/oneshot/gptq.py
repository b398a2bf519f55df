"""GPTQ — Hessian-based error-compensating quantization.

TPU-native implementation of the reference's ``GPTQModifier``
(``scripts/old_scripts/main_glm4-gptq.py:108-126``: W4A16 g128 asym with
``dampening_frac``). Design:

* Hessians ``H = Σ 2·XᵀX`` accumulate on device in f32 — one ``K×K`` per
  target linear, streamed batch-by-batch (the reference's 107 GB-RAM pain
  point, ``main_devstral-gptq.py:40-42``, becomes a bounded per-layer HBM
  cost because layers are processed sequentially).
* The column elimination runs as a jit-compiled ``lax.fori_loop`` over the
  columns of each block (vectorized across all N output rows at once),
  with the classic blocked rank-1 error propagation between blocks —
  f32 accumulation throughout (the reference explicitly rejects TF32-style
  precision loss, ``docs/quantization_tips_and_tricks.md:6-15``).
* Group scales are solved up-front from the (damped) weights
  (static-groups formulation) so the inner loop is pure snap-and-propagate;
  ``actorder`` permutes columns by descending Hessian diagonal and emits
  ``weight_g_idx`` (compressed-tensors pack-quantized quintuple,
  ``recombine_weights_MiniMax-M2.1.py:54-65``).
"""

from __future__ import annotations

import logging
import os
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.numerics import compute_scale_zp, minmax_along
from ..core.scheme import ActOrder, QuantizationArgs, QuantScheme, QuantType
from .modifiers import LayerCtx, Modifier, SiteResult, build_site_result, weight_nk, expert_weights_enk
from .sites import LinearSite

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# core solve
# ---------------------------------------------------------------------------

def _solve_qparams(w: jnp.ndarray, args: QuantizationArgs):
    """Per-group (scale, zp) from current weights; returns arrays shaped
    (N, n_groups) and the group size."""
    N, K = w.shape
    g = int(args.group_size) if args.group_size else K
    mn, mx = minmax_along(w, args)  # honors strategy
    scale, zp = compute_scale_zp(mn, mx, args)
    if scale.ndim == 1:  # tensor/channel strategies
        scale = jnp.broadcast_to(scale.reshape(-1, 1), (N, (K + g - 1) // g))
        if zp is not None:
            zp = jnp.broadcast_to(zp.reshape(-1, 1), scale.shape)
    return scale, zp, g


@partial(jax.jit, static_argnames=("block_size", "qmin", "qmax", "sym"))
def _gptq_solve(W: jnp.ndarray, Hinv_u: jnp.ndarray, scale: jnp.ndarray,
                zp: Optional[jnp.ndarray], col_group: jnp.ndarray, *,
                block_size: int, qmin: float, qmax: float, sym: bool) -> jnp.ndarray:
    """Blocked GPTQ elimination. W (N, K) f32, Hinv_u upper-triangular
    Cholesky factor of H⁻¹ (K, K), col_group (K,) maps processing column →
    scale group. Returns quantized *grid values* Q (N, K) (integer levels,
    before scale multiplication)."""
    N, K = W.shape

    def snap(col_vals: jnp.ndarray, j: jnp.ndarray) -> jnp.ndarray:
        gidx = col_group[j]
        s = scale[:, gidx]
        x = col_vals / s
        if not sym and zp is not None:
            x = x + zp[:, gidx]
        q = jnp.clip(jnp.round(x), qmin, qmax)
        return q

    def dequant(q: jnp.ndarray, j: jnp.ndarray) -> jnp.ndarray:
        gidx = col_group[j]
        s = scale[:, gidx]
        x = q
        if not sym and zp is not None:
            x = x - zp[:, gidx]
        return x * s

    n_blocks = (K + block_size - 1) // block_size

    def process_block(b, carry):
        W_cur, Q = carry
        start = b * block_size

        def col_step(i, inner):
            W_blk, Q, Err = inner  # W_blk (N, bs) view of current block
            j = start + i
            w_col = jax.lax.dynamic_index_in_dim(W_blk, i, axis=1, keepdims=False)
            q = snap(w_col, j)
            dq = dequant(q, j)
            d = Hinv_u[j, j]
            err = (w_col - dq) / d  # (N,)
            # propagate within the remaining columns of this block
            u_row = jax.lax.dynamic_slice(Hinv_u, (j, start), (1, block_size))[0]
            # zero out columns <= i
            mask = (jnp.arange(block_size) > i).astype(W_blk.dtype)
            W_blk = W_blk - err[:, None] * (u_row * mask)[None, :]
            Q = jax.lax.dynamic_update_slice(Q, q[:, None], (0, j))
            Err = jax.lax.dynamic_update_slice(Err, err[:, None], (0, i))
            return (W_blk, Q, Err)

        W_blk = jax.lax.dynamic_slice(W_cur, (0, start), (N, block_size))
        Err0 = jnp.zeros((N, block_size), W.dtype)
        W_blk, Q, Err = jax.lax.fori_loop(0, block_size, col_step, (W_blk, Q, Err0))
        # propagate to all later blocks: W[:, end:] -= Err @ Hinv_u[start:end, end:]
        U_rows = jax.lax.dynamic_slice(Hinv_u, (start, 0), (block_size, K))
        tail_mask = (jnp.arange(K) >= start + block_size).astype(W.dtype)
        delta = Err @ (U_rows * tail_mask[None, :])
        W_cur = W_cur - delta
        return (W_cur, Q)

    # pad K to a multiple of block_size is assumed by caller
    Q0 = jnp.zeros((N, K), W.dtype)
    _, Q = jax.lax.fori_loop(0, n_blocks, process_block, (W, Q0))
    return Q


@jax.jit
def _ufactor(H: jnp.ndarray, dampening_frac: jnp.ndarray) -> jnp.ndarray:
    """Damped H → upper-triangular U with H⁻¹ = UᵀU, in ONE program —
    the DEFAULT on TPU (keeps the 378 MB K=9728 Hessian on device; the
    host path costs ~35 s of H-download + U-upload through the ~16-35 MB/s
    tunnel per factor, measured round 5).

    Exchange-matrix identity (see :func:`_ufactor_host`): with B = JHJ and
    B = L_b L_bᵀ, U = J L_b⁻¹ J is upper and H⁻¹ = UᵀU. One Cholesky + one
    blocked triangular solve. Memory discipline (the old chol+cho_solve+
    chol chain held ~8 live (K, K) f32 buffers and OOMed a 16 GB chip at
    K=9728): the identity RHS is solved in K×1216 column blocks under
    ``lax.scan`` so peak live state is ~4 (K, K) buffers. H is NOT
    donated: the caller's host-LAPACK fallback needs it intact if this
    program fails at execution time."""
    K = H.shape[0]
    damp = dampening_frac * jnp.mean(jnp.diag(H))
    B = (H + damp * jnp.eye(K, dtype=jnp.float32))[::-1, ::-1]
    Lb = jnp.linalg.cholesky(B)

    bs = 1216 if K % 1216 == 0 else K  # 9728 = 8*1216; odd K solves whole
    n_blk = K // bs

    def blk(carry, i):
        rhs = (jnp.arange(K)[:, None] == (i * bs + jnp.arange(bs))[None, :]
               ).astype(jnp.float32)
        m = jax.lax.linalg.triangular_solve(Lb, rhs, left_side=True,
                                            lower=True)
        return carry, m

    _, cols = jax.lax.scan(blk, 0, jnp.arange(n_blk))  # (n_blk, K, bs)
    M = jnp.moveaxis(cols, 0, 1).reshape(K, K)
    U = M[::-1, ::-1]
    return jnp.where(jnp.isnan(U).any(), jnp.eye(K, dtype=jnp.float32), U)


def _blas_threads():
    """Raise the BLAS thread limit to all cores for the factor call.

    The baked OpenBLAS defaults to ONE thread in this container (cgroup
    detection), which made the K=9728 factor a 50 s single-core stall;
    4 threads + the flip identity below bring it to ~7 s."""
    try:
        from threadpoolctl import threadpool_limits

        return threadpool_limits(limits=os.cpu_count())
    except Exception:  # threadpoolctl absent: run with ambient limits
        import contextlib

        return contextlib.nullcontext()


def _ufactor_host(H: np.ndarray, dampening_frac: float) -> np.ndarray:
    """Host (LAPACK, f64) version of :func:`_ufactor` — the FALLBACK when
    the device factor fails at compile time, and the forced path under
    ``QTPU_GPTQ_FACTOR=host``.

    The device factor is the default since round 5 (the host path costs
    ~35 s of H-download + U-upload per K=9728 factor through the
    ~16-35 MB/s tunnel); this path remains for backends where the blocked
    device chain exhausts resources. The factor is a one-time cost per
    distinct Hessian (deduped via ``ufactor_cache``).

    Uses the exchange-matrix identity ``U = J·chol_lower(J H J)⁻¹·J``
    (J = anti-diagonal flip): with B = JHJ and B = L_b L_bᵀ,
    H⁻¹ = J B⁻¹ J = (J L_b⁻¹ J)ᵀ (J L_b⁻¹ J) and J L_b⁻¹ J is upper —
    exactly the U with H⁻¹ = UᵀU that the elimination needs. One Cholesky
    + one triangular inverse instead of chol + cho_solve + chol — 2.2×
    fewer flops, verified identical to the 3-step chain to f64 roundoff."""
    import scipy.linalg as sla

    K = H.shape[0]
    Hd = H.astype(np.float64)
    damp = dampening_frac * float(np.mean(np.diag(Hd)))
    Hd[np.arange(K), np.arange(K)] += damp
    try:
        with _blas_threads():
            B = np.ascontiguousarray(Hd[::-1, ::-1])
            Lb = sla.cholesky(B, lower=True, check_finite=False)
            M = sla.solve_triangular(Lb, np.eye(K), lower=True,
                                     check_finite=False)
        U = np.ascontiguousarray(M[::-1, ::-1])
    except np.linalg.LinAlgError:
        logger.warning("GPTQ: Hessian factorization failed; identity fallback")
        U = np.eye(K)
    return U.astype(np.float32)


def gptq_quantize(w_nk: jnp.ndarray, H: jnp.ndarray, args: QuantizationArgs,
                  block_size: int = 128, dampening_frac: float = 0.01,
                  ufactor_cache: Optional[Dict[Any, jnp.ndarray]] = None,
                  cache_key: Any = None,
                  ) -> Tuple[Any, Optional[np.ndarray]]:
    """Run GPTQ on one weight. Returns (QuantizedTensor, g_idx or None).

    ``ufactor_cache``/``cache_key``: sites fed by the same activations
    share one Hessian (q/k/v; gate/up; a shared expert-stack H feeds every
    expert), and the U factor depends only on (H, actorder, dampening) —
    so callers pass a per-layer cache to factor each distinct Hessian
    once instead of once per site (the dominant GPTQ cost at K=9728)."""
    from ..core.numerics import QuantizedTensor

    N, K = w_nk.shape
    W = w_nk.astype(jnp.float32)
    H = H.astype(jnp.float32)

    # dead channels: no activation mass → pin diagonal, zero the weight col
    diag = jnp.diag(H)
    dead = diag == 0
    H = H + jnp.diag(jnp.where(dead, 1.0, 0.0))
    W = jnp.where(dead[None, :], 0.0, W)

    # activation ordering: process salient columns first.
    #   GROUP  — groups are contiguous in the *permuted* domain; persist
    #            weight_g_idx so readers regroup (compressed-tensors schema).
    #   WEIGHT — permuted processing order, but groups stay bound to the
    #            original column index (no g_idx on disk).
    perm = None
    if args.actorder in (ActOrder.GROUP, ActOrder.WEIGHT):
        perm = jnp.argsort(-jnp.diag(H))
        W_perm = W[:, perm]
        H = H[perm][:, perm]
    else:
        W_perm = W

    # upper-triangular factor U of H⁻¹ with H⁻¹ = UᵀU: U = chol(H⁻¹)ᵀ.
    # DEVICE by default (zero tunnel transfers; see _ufactor) with host
    # LAPACK fallback; QTPU_GPTQ_FACTOR=host forces the host path.
    full_key = None if cache_key is None else (
        cache_key, args.actorder, float(dampening_frac))
    if ufactor_cache is not None and full_key in ufactor_cache:
        U = ufactor_cache[full_key]
    else:
        if os.environ.get("QTPU_GPTQ_FACTOR", "device") == "device":
            try:
                U = _ufactor(H, jnp.float32(dampening_frac))
            except Exception:  # backend resource exhaustion → host LAPACK
                logger.warning("GPTQ: device U-factor failed at K=%d; "
                               "falling back to host LAPACK", K)
                U = jnp.asarray(_ufactor_host(np.asarray(H),
                                              float(dampening_frac)))
        else:
            U = jnp.asarray(_ufactor_host(np.asarray(H), float(dampening_frac)))
        if ufactor_cache is not None and full_key is not None:
            ufactor_cache[full_key] = U
    del H

    qmin, qmax = args.qrange
    g = int(args.group_size) if args.group_size else K
    if perm is not None and args.actorder == ActOrder.WEIGHT:
        # scales from original-order weights; groups = original columns
        scale, zp, _ = _solve_qparams(W, args)
        col_group = perm // g  # processing position -> original group
    else:
        scale, zp, _ = _solve_qparams(W_perm, args)
        col_group = jnp.arange(K) // g

    # pad K to block multiple
    bs = min(block_size, K)
    pad = (-K) % bs
    n_groups = scale.shape[1]
    if pad:
        W_perm = jnp.pad(W_perm, ((0, 0), (0, pad)))
        U = jnp.pad(U, ((0, pad), (0, pad)))
        U = U.at[jnp.arange(K, K + pad), jnp.arange(K, K + pad)].set(1.0)
        scale = jnp.pad(scale, ((0, 0), (0, 1)), constant_values=1.0)
        if zp is not None:
            zp = jnp.pad(zp, ((0, 0), (0, 1)))
        col_group = jnp.concatenate([col_group, jnp.full((pad,), n_groups, jnp.int32)])

    Q = _gptq_solve(W_perm, U, scale, zp, col_group.astype(jnp.int32),
                    block_size=bs, qmin=float(qmin), qmax=float(qmax),
                    sym=args.symmetric)
    Q = Q[:, :K]
    scale = scale[:, :n_groups]
    if zp is not None:
        zp = zp[:, :n_groups]

    g_idx = None
    if perm is not None:
        inv = jnp.argsort(perm)
        Q = Q[:, inv]
        if args.actorder == ActOrder.GROUP:
            # group of original column j = (its position in perm order) // g
            g_idx = np.asarray(inv // g, dtype=np.int32)

    vals = Q.astype(jnp.int8) if args.type == QuantType.INT else Q
    qt = QuantizedTensor(
        values=vals,
        scale=scale,
        zero_point=None if args.symmetric else zp,
        global_scale=None,
        shape=(N, K),
    )
    return qt, g_idx


# ---------------------------------------------------------------------------
# modifier
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("masked",), donate_argnums=(0,))
def _hess_accum(H: jnp.ndarray, x: jnp.ndarray, mask: jnp.ndarray,
                masked: bool) -> jnp.ndarray:
    """H += 2·XᵀX in ONE device dispatch (donated accumulator — no extra
    HBM buffer). f32 accumulation on the MXU."""
    x2 = x.astype(jnp.float32).reshape(-1, x.shape[-1])
    if masked:
        m = (mask.reshape(-1) > 0).astype(jnp.float32)
        x2 = x2 * m[:, None]
    # HIGHEST: true-f32 MXU passes — the default bf16 matmul precision is
    # exactly the TF32-style loss the reference rejects for quantization
    # statistics (docs/quantization_tips_and_tricks.md:6-15)
    return H + 2.0 * jnp.matmul(x2.T, x2, precision=jax.lax.Precision.HIGHEST)


@partial(jax.jit, static_argnames=("masked",), donate_argnums=(0,))
def _hess_accum_experts(H: jnp.ndarray, x: jnp.ndarray, mask: jnp.ndarray,
                        masked: bool) -> jnp.ndarray:
    """Per-expert Hessians (E, C, C) += 2·X_eᵀX_e for the whole expert
    stack in one einsum dispatch (x: (E, N, C)); padding rows masked out."""
    xf = x.astype(jnp.float32)
    if masked:
        m = (mask.reshape(-1) > 0).astype(jnp.float32)
        xf = xf * m[None, :, None]
    return H + 2.0 * jnp.einsum("enc,end->ecd", xf, xf,
                                precision=jax.lax.Precision.HIGHEST)


class GPTQModifier(Modifier):
    name = "GPTQModifier"
    needs_capture = True

    def begin_layer(self, ctx: LayerCtx, matched) -> Any:
        state = super().begin_layer(ctx, matched)
        state["H"] = {}  # canonical prefix -> (K,K) | (E,C,C) device array
        state["alias"] = {}  # site prefix -> canonical H key
        state["_seen"] = {}  # (batch_idx, id(x)) -> canonical prefix
        state["_ckey_owner"] = {}  # canonical capture_key -> owner prefix
        return state

    def observe(self, state, site: LinearSite, x_in, mask, capture) -> None:
        super().observe(state, site, x_in, mask, capture)
        # Sites fed by the SAME tensor (q/k/v share the post-norm hidden,
        # gate/up likewise) share one Hessian: X is identical, so accumulate
        # once and alias. The engine's structural map (traced off the jaxpr,
        # engine._capture_alias_map) is authoritative — jit returns a
        # DISTINCT array per capture key even for one traced tensor, so
        # id() on the runtime values cannot see the sharing. The id() path
        # below remains for direct observe() calls without an engine capture
        # (unit tests), where object identity IS meaningful.
        aliases = capture.get("_aliases")
        if aliases is not None:
            ckey = aliases.get(site.capture_key, site.capture_key)
            owner = state["_ckey_owner"].setdefault(ckey, site.prefix)
            state["alias"][site.prefix] = owner
            if owner != site.prefix:
                return
        else:
            bi = capture.get("_batch_idx", None)
            xid = (bi, id(x_in))
            canon = state["_seen"].get(xid)
            if canon is not None and canon != site.prefix \
                    and state["alias"].get(canon) == canon:
                state["alias"][site.prefix] = canon
                return
            if state["alias"].get(site.prefix, site.prefix) != site.prefix:
                # already aliased to another site in an earlier batch
                return
            state["_seen"][xid] = site.prefix
            state["alias"][site.prefix] = site.prefix

        if site.is_expert and x_in.ndim == 3:
            # (E, N, C) expert inputs → stacked per-expert Hessians
            E, N, C = x_in.shape
            masked = mask is not None and int(np.prod(mask.shape)) == N
            H = state["H"].get(site.prefix)
            if H is None:
                H = jnp.zeros((E, C, C), jnp.float32)
            state["H"][site.prefix] = _hess_accum_experts(
                H, x_in, jnp.asarray(mask) if masked else jnp.zeros((1,)),
                masked=masked)
            return
        K = x_in.shape[-1]
        rows = int(np.prod(x_in.shape[:-1]))
        masked = mask is not None and int(np.prod(mask.shape)) == rows
        H = state["H"].get(site.prefix)
        if H is None:
            H = jnp.zeros((K, K), jnp.float32)
        state["H"][site.prefix] = _hess_accum(
            H, x_in, jnp.asarray(mask) if masked else jnp.zeros((1,)),
            masked=masked)

    def _H_for(self, state, key: str):
        return state["H"].get(state["alias"].get(key, key))

    def sync_arrays(self, state):
        # every canonical Hessian accumulates once per batch; reading one
        # element of each barriers all Hessian work enqueued so far
        return list(state["H"].values())

    def compress(self, state, site: LinearSite, group: str,
                 scheme: QuantScheme) -> SiteResult:
        args = scheme.weights
        bs = self.spec.block_size
        damp = self.spec.dampening_frac
        # per-layer U-factor cache, keyed by the canonical (aliased)
        # Hessian owner: q/k/v and gate/up share one H, and a shared
        # expert-stack H feeds every expert — factor each H once
        ucache = state.setdefault("_ufactor_cache", {})
        canon = state["alias"].get(site.prefix, site.prefix)
        if site.is_expert:
            el = site.get()
            w = expert_weights_enk(el)
            # (E, C, C) stacked per-expert Hessians (down_proj: each expert's
            # activations differ), or (C, C) shared (gate/up: the capture
            # feeds every expert the same pre-routing hidden h2 —
            # models/moe.py:327 — so one Hessian is exact for all of them),
            # or None (no calibration batches → identity ≡ RTN).
            Hs = self._H_for(state, site.prefix)
            qts = []
            for e in range(el.num_experts):
                if Hs is None:
                    H = jnp.eye(w.shape[-1], dtype=jnp.float32)
                    key = ("_eye", w.shape[-1])
                elif Hs.ndim == 3:
                    H = Hs[e]
                    key = (canon, e)
                else:
                    H = Hs
                    key = (canon, None)
                qt, _ = gptq_quantize(w[e], H, args, bs, damp,
                                      ufactor_cache=ucache, cache_key=key)
                qts.append(qt)
            res = build_site_result(site, args, group, qt_per_expert=qts,
                                    act_args=scheme.input_activations)
        else:
            H = self._H_for(state, site.prefix)
            w = weight_nk(site.get())
            if H is None:
                logger.warning("GPTQ: no activations for %s; falling back to RTN", site.prefix)
                res = build_site_result(site, args, group, w_nk=w,
                                        act_args=scheme.input_activations)
                return self.finalize_site(state, site, scheme, res)
            qt, g_idx = gptq_quantize(w, H, args, bs, damp,
                                      ufactor_cache=ucache,
                                      cache_key=(canon, None))
            res = build_site_result(site, args, group, qt=qt, g_idx=g_idx,
                                    act_args=scheme.input_activations)
        return self.finalize_site(state, site, scheme, res)
