"""Serving engine + mesh-sharding tests (8 virtual CPU devices)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quantizers_tpu.models import ModelSpec, forward, init_params
from quantizers_tpu.parallel import (
    activation_pspec,
    make_mesh,
    param_pspecs,
    shard_params,
)
from quantizers_tpu.serve import generate, perplexity


@pytest.fixture(scope="module")
def model():
    spec = ModelSpec.tiny()
    return spec, init_params(spec, jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def moe_model():
    spec = ModelSpec.tiny(moe=True)
    return spec, init_params(spec, jax.random.PRNGKey(1))


class TestGenerate:
    def test_greedy_matches_stepwise_argmax(self, model):
        """Generated continuation must equal manual argmax rollout."""
        spec, params = model
        prompt = np.array([[3, 1, 4, 1, 5]], dtype=np.int32)
        out = generate(spec, params, prompt, max_new_tokens=4)

        seq = list(prompt[0])
        for _ in range(4):
            logits, _ = forward(params, spec, jnp.asarray([seq], jnp.int32))
            seq.append(int(jnp.argmax(logits[0, -1])))
        np.testing.assert_array_equal(out[0], np.asarray(seq[5:]))

    def test_batch_generation(self, model):
        spec, params = model
        prompt = np.array([[1, 2, 3], [9, 8, 7]], dtype=np.int32)
        out = generate(spec, params, prompt, max_new_tokens=5)
        assert out.shape == (2, 5)
        # rows are independent: single-row run matches batched row
        solo = generate(spec, params, prompt[:1], max_new_tokens=5)
        np.testing.assert_array_equal(out[0], solo[0])

    def test_sampling_reproducible_by_seed(self, model):
        spec, params = model
        prompt = np.array([[1, 2, 3, 4]], dtype=np.int32)
        a = generate(spec, params, prompt, max_new_tokens=6, temperature=1.0, seed=7)
        b = generate(spec, params, prompt, max_new_tokens=6, temperature=1.0, seed=7)
        c = generate(spec, params, prompt, max_new_tokens=6, temperature=1.0, seed=8)
        np.testing.assert_array_equal(a, b)
        assert (a != c).any()

    def test_perplexity_sane(self, model):
        spec, params = model
        rng = np.random.default_rng(0)
        ids = rng.integers(1, spec.vocab_size, size=(2, 32)).astype(np.int32)
        mask = np.ones_like(ids, dtype=np.float32)
        ppl = perplexity(spec, params, [(ids, mask)])
        # random model on random tokens ≈ uniform ⇒ ppl ≈ vocab_size
        assert 0.2 * spec.vocab_size < ppl < 5 * spec.vocab_size


class TestMesh:
    def test_sharded_forward_matches_single_device(self, model):
        spec, params = model
        mesh = make_mesh({"dp": 2, "tp": 4})
        ids = jnp.asarray(np.arange(16, dtype=np.int32).reshape(2, 8) % spec.vocab_size)
        ref, _ = forward(params, spec, ids)

        sharded = shard_params(spec, params, mesh)
        with mesh:
            out = jax.jit(lambda p, i: forward(p, spec, i)[0])(sharded, ids)
        np.testing.assert_allclose(
            np.asarray(ref, np.float32), np.asarray(out, np.float32),
            rtol=3e-2, atol=3e-2)

    def test_moe_expert_parallel_forward(self, moe_model):
        spec, params = moe_model
        mesh = make_mesh({"dp": 2, "ep": 4})
        ids = jnp.asarray(np.arange(8, dtype=np.int32).reshape(1, 8) % spec.vocab_size)
        ref, _ = forward(params, spec, ids)
        sharded = shard_params(spec, params, mesh)
        el = sharded["layers"][0]["moe"]["gate_proj"]
        # expert axis actually sharded over ep
        assert "ep" in str(el.weight.sharding.spec)
        with mesh:
            out = jax.jit(lambda p, i: forward(p, spec, i)[0])(sharded, ids)
        np.testing.assert_allclose(
            np.asarray(ref, np.float32), np.asarray(out, np.float32),
            rtol=3e-2, atol=3e-2)

    def test_mla_sharded_forward_matches_single_device(self):
        spec = ModelSpec.tiny(moe=True, mla=True)
        params = init_params(spec, jax.random.PRNGKey(3))
        mesh = make_mesh({"dp": 2, "tp": 4})
        ids = jnp.asarray(np.arange(12, dtype=np.int32).reshape(2, 6) % spec.vocab_size)
        ref, _ = forward(params, spec, ids)
        sharded = shard_params(spec, params, mesh)
        # b-expansions column-parallel over tp
        assert "tp" in str(sharded["layers"][0]["kv_b_proj"].weight.sharding.spec)
        with mesh:
            out = jax.jit(lambda p, i: forward(p, spec, i)[0])(sharded, ids)
        np.testing.assert_allclose(
            np.asarray(ref, np.float32), np.asarray(out, np.float32),
            rtol=3e-2, atol=3e-2)

    def test_pspecs_structure_matches(self, model):
        spec, params = model
        mesh = make_mesh({"tp": 8})
        specs = param_pspecs(spec, params, mesh)
        # same tree structure ⇒ tree_map over (params, specs) works
        jax.tree_util.tree_map(lambda a, b: None, params, specs)
        assert activation_pspec(mesh, 3) is not None

    def test_generate_under_mesh(self, model):
        """Sharded decode: generate() on tp-sharded params matches
        unsharded greedy output."""
        spec, params = model
        mesh = make_mesh({"tp": 8})
        prompt = np.array([[5, 6, 7, 8]], dtype=np.int32)
        ref = generate(spec, params, prompt, max_new_tokens=4)
        sharded = shard_params(spec, params, mesh)
        with mesh:
            out = generate(spec, sharded, prompt, max_new_tokens=4)
        np.testing.assert_array_equal(ref, out)


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-v"]))


class TestContinuousBatching:
    def test_matches_generate_oracle(self, model):
        """Per-request continuations under continuous batching (with slot
        recycling) must equal standalone greedy generation."""
        from quantizers_tpu.serve.session import ContinuousBatcher

        spec, params = model
        s = ContinuousBatcher(spec, params, max_batch=2, max_len=64,
                              prefill_buckets=(8, 16))
        reqs = [([1, 2, 3, 4], 6), ([9, 8, 7], 5), ([5, 5, 5, 5, 5, 5], 4)]
        rids = [s.submit(p, n) for p, n in reqs]
        res = s.run()
        for rid, (p, n) in zip(rids, reqs):
            ref = generate(spec, params, np.asarray([p], np.int32),
                           max_new_tokens=n)[0].tolist()
            assert res[rid] == ref

    def test_eos_stops_early(self, model):
        from quantizers_tpu.serve.session import ContinuousBatcher

        spec, params = model
        probe = ContinuousBatcher(spec, params, max_batch=1, max_len=64)
        rid = probe.submit([1, 2, 3], max_new_tokens=8)
        full = probe.run()[rid]
        eos = full[2]
        s = ContinuousBatcher(spec, params, max_batch=1, max_len=64,
                              eos_ids=[eos])
        rid = s.submit([1, 2, 3], max_new_tokens=8)
        out = s.run()[rid]
        assert out == full[:3]

    def test_submit_validation(self, model):
        from quantizers_tpu.serve.session import ContinuousBatcher

        spec, params = model
        s = ContinuousBatcher(spec, params, max_batch=1, max_len=16)
        with pytest.raises(ValueError):
            s.submit([], 4)
        with pytest.raises(ValueError):
            s.submit(list(range(20)), 4)


class TestExpertShardedDecode:
    """tp=2 expert-sharded NVFP4-MoE continuous-batching decode must match
    the single-device oracle (the concrete serving plan for the 30B-A3B
    coverage config: experts EP-sharded over tp)."""

    def test_tp2_nvfp4_moe_batcher_matches_oracle(self, moe_model):
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
        from __graft_entry__ import _quantize_params_rtn

        from quantizers_tpu.serve.session import ContinuousBatcher

        spec, params0 = moe_model
        params = _quantize_params_rtn(
            spec, jax.tree_util.tree_map(lambda x: x, params0))

        reqs = [([1, 2, 3, 4], 5), ([9, 8, 7], 4)]
        ref = {tuple(p): generate(spec, params, np.asarray([p], np.int32),
                                  max_new_tokens=n)[0].tolist()
               for p, n in reqs}

        mesh = make_mesh({"dp": 4, "tp": 2})  # 4 experts % tp(2) == 0
        sharded = shard_params(spec, params, mesh)
        from quantizers_tpu.ops.linear import infer_expert_shards

        assert infer_expert_shards(sharded) == 2
        with mesh:
            s = ContinuousBatcher(spec, sharded, max_batch=2, max_len=32,
                                  prefill_buckets=(8,))
            rids = [s.submit(p, n) for p, n in reqs]
            res = s.run()
        for rid, (p, n) in zip(rids, reqs):
            assert res[rid] == ref[tuple(p)]


class TestQuantizedLmHead:
    """w8-channel logits head: near-lossless quality, half the per-step
    head stream for tied embeddings (serving-layout option)."""

    def test_ppl_near_lossless_and_generate_matches(self, model):
        from quantizers_tpu.models.transformer import quantize_lm_head
        from quantizers_tpu.oneshot import make_batches
        from quantizers_tpu.serve.session import ContinuousBatcher

        spec, params = model
        rng = np.random.default_rng(0)
        wins = [list(rng.integers(1, spec.vocab_size, 24)) for _ in range(4)]
        batches = make_batches(wins, max_seq_length=32, batch_size=2,
                               pad_to_multiple=8)
        p0 = perplexity(spec, params, batches)
        params_q = quantize_lm_head(spec, params)
        assert params_q["lm_head"] is not None
        assert params_q["lm_head"].kind == "w8"
        p1 = perplexity(spec, params_q, batches)
        assert abs(p1 - p0) / p0 < 0.02, (p0, p1)  # near-lossless

        # batcher opt-in: greedy output should match the bf16 head (tiny
        # model, random weights -> argmax can flip on ties; compare against
        # the quantized-head oracle instead of bf16)
        s = ContinuousBatcher(spec, params, max_batch=2, max_len=32,
                              prefill_buckets=(8,), head_bits=8)
        rid = s.submit([1, 2, 3, 4], 5)
        res = s.run()
        ref = generate(spec, params_q, np.asarray([[1, 2, 3, 4]], np.int32),
                       max_new_tokens=5)[0].tolist()
        assert res[rid] == ref


class TestPaddedQuantizedHead:
    """The 1536 tile-pad rule of quantize_lm_head (never triggered by tiny
    test vocabs, whose pad fraction exceeds the 5% cap — ADVICE r3 #3):
    padded logits must slice back exactly to the unpadded head's."""

    def _spec_params(self, vocab):
        from quantizers_tpu.models import ModelSpec, init_params

        spec = ModelSpec.tiny(vocab_size=vocab, hidden_size=64,
                              num_layers=1, num_heads=2, num_kv_heads=2,
                              head_dim=32, intermediate_size=128)
        return spec, init_params(spec, jax.random.PRNGKey(0))

    def test_padded_head_slices_to_unpadded_logits(self):
        from quantizers_tpu.models.transformer import (forward,
                                                       quantize_lm_head)

        vocab = 31000  # pad = 1256 (4.05% < the 5% cap) -> padding fires
        spec, params = self._spec_params(vocab)
        pq = quantize_lm_head(spec, params)
        head = pq["lm_head"]
        assert dict(head.meta)["n"] == 32256 and dict(head.meta)["orig_n"] == vocab
        ids = jnp.asarray([[1, 5, 9, 2]], jnp.int32)
        logits, _ = forward(pq, spec, ids)
        assert logits.shape[-1] == vocab
        # unpadded oracle: same quantized weights, pad sliced off
        import dataclasses as dc

        unpadded = dc.replace(
            head, weight=head.weight[:, :vocab], scale=head.scale[:, :vocab],
            meta=tuple((k, vocab if k == "n" else v) for k, v in head.meta
                       if k != "orig_n"))
        ref, _ = forward(dict(pq, lm_head=unpadded), spec, ids)
        np.testing.assert_allclose(np.asarray(logits, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=1e-3, atol=1e-3)

    def test_untied_head_bias_preserved(self):
        """A biased untied lm_head keeps its bias through quantization
        (ADVICE r3 #4) — padded with zeros when the tile-pad fires."""
        from quantizers_tpu.models.transformer import quantize_lm_head
        from quantizers_tpu.ops.linear import dense_linear

        vocab = 31000
        spec, params = self._spec_params(vocab)
        rng = np.random.default_rng(3)
        w = rng.standard_normal((vocab, 64)).astype(np.float32) * 0.1
        b = rng.standard_normal((vocab,)).astype(np.float32)
        params = dict(params, lm_head=dense_linear(w, bias=b))
        pq = quantize_lm_head(spec, params)
        head = pq["lm_head"]
        assert head.bias is not None and head.bias.shape == (32256,)
        np.testing.assert_allclose(np.asarray(head.bias[:vocab]), b,
                                   rtol=1e-2, atol=1e-2)
        assert float(jnp.abs(head.bias[vocab:]).max()) == 0.0


class TestServingLayoutContract:
    """The benched artifact must be the served artifact, by construction
    (round-4 verdict #3): bench_moe builds through serve.session.
    serving_layout, and the batcher's params are exactly that function's
    output."""

    def test_batcher_params_are_serving_layout(self, moe_model):
        import jax.tree_util as jtu

        from quantizers_tpu.serve.session import ContinuousBatcher, serving_layout

        spec, params = moe_model
        expected = serving_layout(spec, params)
        b = ContinuousBatcher(spec, params, max_batch=2, max_len=32)
        ls_e, td_e = jtu.tree_flatten(expected)
        ls_b, td_b = jtu.tree_flatten(b.params)
        assert td_e == td_b
        for a, c in zip(ls_e, ls_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(c))

    def test_benches_build_through_serving_layout(self):
        # anti-drift pin: every decode bench must keep building its
        # measured model via the session's layout function (same drift
        # class as the round-3 bench.py w8-head finding)
        import pathlib

        root = pathlib.Path(__file__).resolve().parent.parent
        assert "serving_layout(spec, params)" in (
            root / "benchmarks" / "bench_moe.py").read_text()
        assert "serving_layout(spec, raw" in (root / "bench.py").read_text()
        for name in ("bench_mla", "bench_fp8"):
            assert "serving_layout(spec, raw" in (
                root / "benchmarks" / f"{name}.py").read_text(), name

    def test_fuse_for_decode_idempotent(self, model):
        import jax.tree_util as jtu

        from quantizers_tpu.models.transformer import fuse_for_decode

        spec, params = model
        once = fuse_for_decode(spec, params)
        twice = fuse_for_decode(spec, once)
        ls1, td1 = jtu.tree_flatten(once)
        ls2, td2 = jtu.tree_flatten(twice)
        assert td1 == td2
        for a, b in zip(ls1, ls2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
