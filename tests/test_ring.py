"""Ring (context-parallel) attention vs the single-device oracle.

The blockwise-prefill design kept this extension open (SURVEY §5); here
the ring actually runs over the virtual 8-device mesh with the sequence
sharded on a ``cp`` axis and K/V blocks rotating via ppermute."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quantizers_tpu.parallel import make_mesh
from quantizers_tpu.parallel.ring import ring_attention


def _oracle(q, k, v, sm, causal=True):
    H, KV = q.shape[1], k.shape[1]
    kr = np.repeat(k, H // KV, axis=1)
    vr = np.repeat(v, H // KV, axis=1)
    s = np.einsum("bhtd,bhsd->bhts", q, kr) * sm
    if causal:
        T = q.shape[2]
        s = np.where(np.tril(np.ones((T, T), bool)), s, -1e30)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bhts,bhsd->bhtd", p, vr)


class TestRingAttention:
    @pytest.mark.parametrize("cp,rep,causal", [(4, 1, True), (8, 2, True),
                                               (4, 2, False)])
    def test_matches_single_device(self, cp, rep, causal):
        mesh = make_mesh({"cp": cp})
        rng = np.random.default_rng(11)
        B, KV, T, d = 2, 2, 8 * cp, 32
        H = KV * rep
        q = jnp.asarray(rng.standard_normal((B, H, T, d)) * 0.4, jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, KV, T, d)) * 0.4, jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, KV, T, d)) * 0.4, jnp.float32)
        sm = 1.0 / np.sqrt(d)
        with mesh:
            out = ring_attention(q, k, v, sm, mesh, axis="cp", causal=causal)
        ref = _oracle(np.asarray(q), np.asarray(k), np.asarray(v), sm, causal)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)

    def test_rejects_bad_shapes(self):
        mesh = make_mesh({"cp": 4})
        q = jnp.zeros((1, 2, 10, 32))  # 10 % 4 != 0
        with pytest.raises(ValueError):
            ring_attention(q, q, q, 1.0, mesh, axis="cp")
        with pytest.raises(ValueError):
            ring_attention(q, q, q, 1.0, mesh, axis="nope")

    def test_composes_with_dp(self):
        """cp ring inside a dp×cp mesh: batch sharded over dp, sequence
        ring over cp — the multi-host calibration layout."""
        mesh = make_mesh({"dp": 2, "cp": 4})
        rng = np.random.default_rng(12)
        B, KV, T, d = 2, 1, 16, 32
        q = jnp.asarray(rng.standard_normal((B, KV, T, d)) * 0.4, jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, KV, T, d)) * 0.4, jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, KV, T, d)) * 0.4, jnp.float32)
        sm = 1.0 / np.sqrt(d)
        with mesh:
            out = ring_attention(q, k, v, sm, mesh, axis="cp")
        ref = _oracle(np.asarray(q), np.asarray(k), np.asarray(v), sm)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)
