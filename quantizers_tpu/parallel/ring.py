"""Ring (context-parallel) attention over a mesh axis.

SURVEY §5 asked the prefill attention to stay *blockwise* so a
ring/context-parallel extension over ICI remains possible; this is that
extension. The sequence axis is sharded over a ``cp`` mesh axis: each
device keeps its local query block resident and the K/V blocks rotate
around the ring with ``lax.ppermute``, one hop per step. Every hop folds
one remote block into the running online-softmax state (max ``m``,
normalizer ``l``, unnormalized accumulator ``acc``) — the same
recurrence the flash kernel uses locally, so per-device memory is
O(T_local²) for one score tile regardless of the global length, and the
collective traffic rides the ICI neighbor links.

Causality is by GLOBAL position: the block arriving at step ``i``
originated on device ``(me - i) mod P``, so its key positions are
``src*T_local + col`` and the mask admits ``q_pos >= k_pos``.

Used through :func:`ring_attention` (builds the shard_map) or composed
directly inside an existing shard_map via :func:`ring_attention_local`.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_NEG_INF = -1e30


def ring_attention_local(q: jax.Array, k: jax.Array, v: jax.Array,
                         sm_scale: float, axis_name: str,
                         causal: bool = True) -> jax.Array:
    """Per-device body (call inside shard_map with T sharded on
    ``axis_name``). q/k/v local blocks (B, H, Tl, d) / (B, KV, Tl, d);
    returns the local (B, H, Tl, dv) context."""
    P_ = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    B, H, Tl, d = q.shape
    KV = k.shape[1]
    rep = H // KV
    dv = v.shape[3]

    # fold the GQA group axis into q instead of materializing repeated
    # K/V blocks every hop (the codebase-wide rule: a jnp.repeat here
    # would stream rep x the K/V bytes through each ring step)
    qg = q.reshape(B, KV, rep, Tl, d).astype(jnp.float32)
    m = jnp.full((B, KV, rep, Tl, 1), _NEG_INF, jnp.float32)
    l = jnp.zeros((B, KV, rep, Tl, 1), jnp.float32)
    acc = jnp.zeros((B, KV, rep, Tl, dv), jnp.float32)

    perm = [(j, (j + 1) % P_) for j in range(P_)]
    rows = jnp.arange(Tl)

    def fold(carry, i):
        k_blk, v_blk, m, l, acc = carry
        src = (me - i) % P_
        kf = k_blk.astype(jnp.float32)
        vf = v_blk.astype(jnp.float32)
        s = jnp.einsum("bgrtd,bgsd->bgrts", qg, kf) * sm_scale
        if causal:
            q_pos = me * Tl + rows[:, None]
            k_pos = src * Tl + rows[None, :]
            s = jnp.where(q_pos >= k_pos, s, _NEG_INF)
        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l = l * corr + p.sum(axis=-1, keepdims=True)
        acc = acc * corr + jnp.einsum("bgrts,bgsd->bgrtd", p, vf)
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        return (k_blk, v_blk, m_new, l, acc), None

    (k, v, m, l, acc), _ = jax.lax.scan(
        fold, (k, v, m, l, acc), jnp.arange(P_))
    out = acc / jnp.maximum(l, 1e-30)
    return out.reshape(B, H, Tl, dv).astype(q.dtype)


def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                   sm_scale: float, mesh: Mesh, axis: str = "cp",
                   causal: bool = True) -> jax.Array:
    """Context-parallel causal attention: shards the sequence axis of
    q/k/v (B, H|KV, T, d) over ``axis`` and runs the ring. T must divide
    by the axis size; heads replicate (compose with tp by sharding H
    outside)."""
    from jax.experimental.shard_map import shard_map

    if axis not in mesh.axis_names:
        raise ValueError(f"mesh has no axis {axis!r}")
    n = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]
    if q.shape[2] % n:
        raise ValueError(
            f"{axis} size {n} must divide the sequence length T={q.shape[2]}")

    spec = P(None, None, axis, None)
    fn = shard_map(
        partial(ring_attention_local, sm_scale=sm_scale, axis_name=axis,
                causal=causal),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_rep=False,
    )
    return fn(q, k, v)
