"""Model-layer tests: functional transformer, KV cache, MoE, loaders.

The reference never tests model execution (it trusts transformers /
llmcompressor — SURVEY.md §4); for a from-scratch framework these numeric
and round-trip tests are mandatory.
"""

import json
import tempfile
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantizers_tpu.core.numerics import quantize
from quantizers_tpu.core.scheme import PRESET_SCHEMES
from quantizers_tpu.models import (
    KVCache,
    ModelSpec,
    forward,
    init_params,
    load_hf_model,
)
from quantizers_tpu.models.loader import (
    iter_model_linears,
    load_compressed_model,
    model_plain_tensors,
)
from quantizers_tpu.models.moe import route_topk
from quantizers_tpu.ops.linear import QuantLinear, from_quantized
from quantizers_tpu.formats.checkpoint import CompressedParam, save_compressed_model
from quantizers_tpu.formats.safetensors_io import ShardedWriter, dump_json


@pytest.fixture(scope="module")
def dense_model():
    spec = ModelSpec.tiny()
    params = init_params(spec, jax.random.PRNGKey(0))
    return spec, params


@pytest.fixture(scope="module")
def moe_model():
    spec = ModelSpec.tiny(moe=True)
    params = init_params(spec, jax.random.PRNGKey(1))
    return spec, params


@pytest.fixture(scope="module")
def mla_model():
    spec = ModelSpec.tiny(mla=True)
    params = init_params(spec, jax.random.PRNGKey(2))
    return spec, params


@pytest.fixture(scope="module")
def mla_moe_model():
    """DeepSeek-V3-shaped tiny model: MLA + sigmoid-scored MoE with a
    shared expert and a first dense layer."""
    spec = ModelSpec.tiny(moe=True, mla=True)
    params = init_params(spec, jax.random.PRNGKey(3))
    return spec, params


class TestForward:
    def test_shapes_and_determinism(self, dense_model):
        spec, params = dense_model
        ids = jnp.arange(12, dtype=jnp.int32).reshape(2, 6) % spec.vocab_size
        logits, _ = forward(params, spec, ids)
        assert logits.shape == (2, 6, spec.vocab_size)
        logits2, _ = forward(params, spec, ids)
        np.testing.assert_array_equal(np.asarray(logits), np.asarray(logits2))

    def test_causality(self, dense_model):
        """Changing a future token must not change past logits."""
        spec, params = dense_model
        ids1 = jnp.array([[1, 2, 3, 4]], dtype=jnp.int32)
        ids2 = jnp.array([[1, 2, 3, 9]], dtype=jnp.int32)
        l1, _ = forward(params, spec, ids1)
        l2, _ = forward(params, spec, ids2)
        np.testing.assert_allclose(
            np.asarray(l1[:, :3], np.float32), np.asarray(l2[:, :3], np.float32)
        )

    def test_kv_cache_matches_full_forward(self, dense_model):
        spec, params = dense_model
        B, T = 1, 8
        ids = (jnp.arange(T, dtype=jnp.int32)[None, :] * 7 + 3) % spec.vocab_size
        full, _ = forward(params, spec, ids)

        caches = KVCache.init(spec, batch=B, max_len=16)
        pre, caches = forward(params, spec, ids[:, :5], caches=caches)
        np.testing.assert_allclose(
            np.asarray(pre, np.float32), np.asarray(full[:, :5], np.float32),
            rtol=2e-2, atol=2e-2,
        )
        for t in range(5, T):
            step, caches = forward(params, spec, ids[:, t : t + 1], caches=caches)
            np.testing.assert_allclose(
                np.asarray(step[:, 0], np.float32),
                np.asarray(full[:, t], np.float32),
                rtol=2e-2, atol=2e-2,
            )

    def test_fp8_kv_cache_close(self, dense_model):
        spec, params = dense_model
        ids = jnp.array([[5, 9, 2, 7]], dtype=jnp.int32)
        full, _ = forward(params, spec, ids)
        caches = KVCache.init(spec, 1, 8, fp8=True, k_scale=0.05, v_scale=0.05)
        out, _ = forward(params, spec, ids, caches=caches)
        # fp8 kv introduces modest error but must stay close
        f = np.asarray(full, np.float32)
        o = np.asarray(out, np.float32)
        assert np.mean(np.abs(f - o)) / (np.mean(np.abs(f)) + 1e-9) < 0.1

    def test_jit_forward(self, dense_model):
        spec, params = dense_model
        f = jax.jit(lambda p, i: forward(p, spec, i)[0])
        ids = jnp.array([[1, 2, 3]], dtype=jnp.int32)
        out = f(params, ids)
        ref, _ = forward(params, spec, ids)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=1e-2, atol=1e-2
        )


class TestMoE:
    def test_route_topk(self):
        logits = jnp.array([[10.0, 0.0, 5.0, -1.0]])
        w = route_topk(logits, top_k=2, norm_topk_prob=True)
        w = np.asarray(w)[0]
        assert w[1] == 0 and w[3] == 0
        assert abs(w.sum() - 1.0) < 1e-5
        assert w[0] > w[2] > 0

    def test_moe_forward_and_capture(self, moe_model):
        spec, params = moe_model
        ids = jnp.array([[3, 1, 4, 1, 5]], dtype=jnp.int32)
        logits, _ = forward(params, spec, ids)
        assert logits.shape == (1, 5, spec.vocab_size)
        assert jnp.isfinite(logits.astype(jnp.float32)).all()

    def test_moe_capture_keys(self, moe_model):
        from quantizers_tpu.models.transformer import apply_layer, embed

        spec, params = moe_model
        ids = jnp.array([[3, 1, 4, 1, 5]], dtype=jnp.int32)
        x = embed(params, ids)
        pos = jnp.arange(5)[None, :]
        cap = {}
        apply_layer(params["layers"][0], spec, 0, x, pos, capture=cap)
        assert "moe_down_proj" in cap
        E = spec.num_experts
        assert cap["moe_down_proj"].shape == (E, 5, spec.moe_intermediate_size)
        assert cap["moe_weights"].shape == (5, E)
        # top-k routing: exactly k nonzero weights per token
        nz = (np.asarray(cap["moe_weights"]) > 0).sum(axis=-1)
        np.testing.assert_array_equal(nz, spec.num_experts_per_tok)


class TestMLA:
    def test_forward_shapes(self, mla_model):
        spec, params = mla_model
        assert spec.is_mla
        ids = jnp.array([[3, 1, 4, 1, 5, 9]], dtype=jnp.int32)
        logits, _ = forward(params, spec, ids)
        assert logits.shape == (1, 6, spec.vocab_size)
        assert jnp.isfinite(logits.astype(jnp.float32)).all()

    def test_causality(self, mla_model):
        spec, params = mla_model
        l1, _ = forward(params, spec, jnp.array([[1, 2, 3, 4]], dtype=jnp.int32))
        l2, _ = forward(params, spec, jnp.array([[1, 2, 3, 9]], dtype=jnp.int32))
        np.testing.assert_allclose(
            np.asarray(l1[:, :3], np.float32), np.asarray(l2[:, :3], np.float32))

    def test_kv_cache_matches_full_forward(self, mla_model):
        spec, params = mla_model
        T = 8
        ids = (jnp.arange(T, dtype=jnp.int32)[None, :] * 5 + 2) % spec.vocab_size
        full, _ = forward(params, spec, ids)
        caches = KVCache.init(spec, batch=1, max_len=16)
        # MLA latent cache: one shared (c_kv, padded rope-k) row per token
        assert caches[0].k.shape == (1, 1, 16, spec.kv_lora_rank)
        rope_pad = -(-spec.qk_rope_head_dim // 128) * 128
        assert caches[0].v.shape == (1, 1, 16, rope_pad)
        pre, caches = forward(params, spec, ids[:, :4], caches=caches)
        np.testing.assert_allclose(
            np.asarray(pre, np.float32), np.asarray(full[:, :4], np.float32),
            rtol=2e-2, atol=2e-2)
        for t in range(4, T):
            step, caches = forward(params, spec, ids[:, t : t + 1], caches=caches)
            np.testing.assert_allclose(
                np.asarray(step[:, 0], np.float32),
                np.asarray(full[:, t], np.float32), rtol=2e-2, atol=2e-2)

    def test_deepseek_moe_forward(self, mla_moe_model):
        spec, params = mla_moe_model
        assert spec.num_shared_experts == 1 and spec.scoring_func == "sigmoid"
        assert not spec.layer_is_moe(0) and spec.layer_is_moe(1)
        ids = jnp.array([[3, 1, 4, 1, 5]], dtype=jnp.int32)
        logits, _ = forward(params, spec, ids)
        assert logits.shape == (1, 5, spec.vocab_size)
        assert jnp.isfinite(logits.astype(jnp.float32)).all()

    def test_sigmoid_routing_bias_changes_selection_not_weights(self):
        logits = jnp.array([[2.0, 1.9, -3.0, -3.1]])
        w0 = np.asarray(route_topk(logits, 2, True, scoring_func="sigmoid"))
        # huge bias on expert 3 forces it into the top-k...
        bias = jnp.array([0.0, 0.0, 0.0, 100.0])
        w1 = np.asarray(route_topk(logits, 2, True, scoring_func="sigmoid", bias=bias))
        assert w0[0, 3] == 0 and w1[0, 3] > 0
        # ...but its combine weight still comes from the un-biased sigmoid
        s = jax.nn.sigmoid(logits.astype(jnp.float32))
        expect = float(s[0, 3] / (s[0, 0] + s[0, 3]))
        np.testing.assert_allclose(w1[0, 3], expect, rtol=1e-5)

    def test_routed_scaling_factor(self):
        logits = jnp.array([[1.0, 0.5, 0.0, -0.5]])
        w1 = np.asarray(route_topk(logits, 2, True, scoring_func="sigmoid"))
        w2 = np.asarray(route_topk(logits, 2, True, scoring_func="sigmoid",
                                   routed_scaling_factor=2.5))
        np.testing.assert_allclose(w2, w1 * 2.5, rtol=1e-6)

    def test_mla_capture_sites(self, mla_model):
        from quantizers_tpu.models.transformer import apply_layer, embed
        from quantizers_tpu.oneshot.sites import layer_sites

        spec, params = mla_model
        ids = jnp.array([[3, 1, 4]], dtype=jnp.int32)
        x = embed(params, ids)
        cap = {}
        apply_layer(params["layers"][0], spec, 0, x, jnp.arange(3)[None, :],
                    capture=cap)
        sites = layer_sites(spec, 0, params["layers"][0])
        names = {s.name for s in sites}
        assert names == {"q_a_proj", "q_b_proj", "kv_a_proj_with_mqa",
                         "kv_b_proj", "o_proj", "gate_proj", "up_proj", "down_proj"}
        for s in sites:
            assert s.capture_key in cap, f"missing capture for {s.capture_key}"


class TestFusedDecodeLayout:
    def test_fused_forward_matches(self, dense_model):
        from quantizers_tpu.models.transformer import fuse_for_decode

        spec, params = dense_model
        fused = fuse_for_decode(spec, params)
        assert "qkv_proj" in fused["layers"][0]
        assert "gateup_proj" in fused["layers"][0]["mlp"]
        ids = jnp.array([[1, 2, 3, 4, 5]], dtype=jnp.int32)
        l1, _ = forward(params, spec, ids)
        l2, _ = forward(fused, spec, ids)
        np.testing.assert_allclose(
            np.asarray(l1, np.float32), np.asarray(l2, np.float32),
            rtol=2e-2, atol=2e-2)

    def test_fused_quantized_w4(self, dense_model):
        from quantizers_tpu.models.transformer import fuse_for_decode
        from quantizers_tpu.ops.linear import from_quantized

        spec, params = dense_model
        scheme = PRESET_SCHEMES["W4A16_G32"]

        def q(obj):
            if isinstance(obj, QuantLinear) and obj.kind == "dense":
                w_nk = np.asarray(obj.weight, np.float32).T
                return from_quantized(quantize(jnp.asarray(w_nk), scheme.weights),
                                      scheme.weights, bias=obj.bias)
            return obj

        qparams = jax.tree_util.tree_map(
            q, params, is_leaf=lambda x: isinstance(x, QuantLinear))
        fused = fuse_for_decode(spec, qparams)
        assert fused["layers"][0]["qkv_proj"].kind == "w4"
        ids = jnp.array([[3, 1, 4, 1]], dtype=jnp.int32)
        l1, _ = forward(qparams, spec, ids)
        l2, _ = forward(fused, spec, ids)
        np.testing.assert_allclose(
            np.asarray(l1, np.float32), np.asarray(l2, np.float32),
            rtol=2e-2, atol=2e-2)

    def test_kv_cache_decode_fused(self, dense_model):
        from quantizers_tpu.models.transformer import fuse_for_decode

        spec, params = dense_model
        fused = fuse_for_decode(spec, params)
        ids = jnp.array([[5, 6, 7, 8]], dtype=jnp.int32)
        full, _ = forward(params, spec, ids)
        caches = KVCache.init(spec, 1, 8)
        pre, caches = forward(fused, spec, ids[:, :3], caches=caches)
        step, _ = forward(fused, spec, ids[:, 3:4], caches=caches)
        np.testing.assert_allclose(
            np.asarray(step[:, 0], np.float32), np.asarray(full[:, 3], np.float32),
            rtol=2e-2, atol=2e-2)


class TestQuantizedModel:
    def test_w4_model_close_to_dense(self, dense_model):
        spec, params = dense_model
        scheme = PRESET_SCHEMES["W4A16_G32"]

        def maybe_quant(obj):
            if isinstance(obj, QuantLinear) and obj.kind == "dense":
                w_nk = np.asarray(obj.weight, np.float32).T  # back to (N, K)
                qt = quantize(jnp.asarray(w_nk), scheme.weights)
                bias = obj.bias
                return from_quantized(qt, scheme.weights, bias=bias)
            return obj

        qparams = jax.tree_util.tree_map(
            maybe_quant, params,
            is_leaf=lambda x: isinstance(x, QuantLinear),
        )
        ids = jnp.array([[1, 2, 3, 4, 5, 6]], dtype=jnp.int32)
        ref, _ = forward(params, spec, ids)
        out, _ = forward(qparams, spec, ids)
        r = np.asarray(ref, np.float32)
        o = np.asarray(out, np.float32)
        rel = np.abs(r - o).mean() / (np.abs(r).mean() + 1e-9)
        assert rel < 0.25, f"w4 model diverges: rel err {rel}"
        # top-1 agreement on most positions
        agree = (r.argmax(-1) == o.argmax(-1)).mean()
        assert agree >= 0.5


class TestLoaders:
    def _save_hf(self, spec, params, out: Path):
        tensors = model_plain_tensors(spec, params)
        for prefix, lin in iter_model_linears(spec, params):
            tensors[f"{prefix}.weight"] = np.asarray(lin.weight, np.float32).T
            if lin.bias is not None:
                tensors[f"{prefix}.bias"] = np.asarray(lin.bias, np.float32)
        w = ShardedWriter(out, max_shard_bytes=1 << 20)
        w.add_many(tensors)
        w.finalize()
        dump_json(spec.to_hf_config(), out / "config.json")

    def test_mistral_llama_style_config(self):
        """Mistral/Llama-family configs (the reference's Devstral target,
        ``main_devstral-gptq.py``) map onto the generic dense decoder: no
        qk-norm, no attention bias, GQA, untied embeddings."""
        from quantizers_tpu.models import ModelSpec, forward, init_params

        cfg = {
            "model_type": "mistral", "vocab_size": 384, "hidden_size": 64,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "num_key_value_heads": 2, "intermediate_size": 128,
            "rms_norm_eps": 1e-5, "rope_theta": 1e6,
            "max_position_embeddings": 4096, "tie_word_embeddings": False,
        }
        spec = ModelSpec.from_hf_config(cfg)
        assert not spec.qk_norm and not spec.attention_bias
        assert not spec.is_moe and not spec.is_mla
        assert spec.num_kv_heads == 2 and spec.head_dim == 16
        params = init_params(spec, jax.random.PRNGKey(6))
        logits, _ = forward(params, spec, jnp.array([[5, 6, 7]], jnp.int32))
        assert logits.shape == (1, 3, 384)
        assert jnp.isfinite(logits.astype(jnp.float32)).all()

    def test_hf_roundtrip(self, dense_model, tmp_path):
        spec, params = dense_model
        self._save_hf(spec, params, tmp_path)
        spec2, params2 = load_hf_model(tmp_path)
        assert spec2.hidden_size == spec.hidden_size
        assert spec2.qk_norm == spec.qk_norm
        ids = jnp.array([[1, 2, 3, 4]], dtype=jnp.int32)
        l1, _ = forward(params, spec, ids)
        l2, _ = forward(params2, spec2, ids)
        np.testing.assert_allclose(
            np.asarray(l1, np.float32), np.asarray(l2, np.float32), rtol=2e-2, atol=2e-2
        )

    def test_moe_hf_roundtrip(self, moe_model, tmp_path):
        spec, params = moe_model
        self._save_hf(spec, params, tmp_path)
        spec2, params2 = load_hf_model(tmp_path)
        assert spec2.is_moe and spec2.num_experts == spec.num_experts
        ids = jnp.array([[7, 8, 9]], dtype=jnp.int32)
        l1, _ = forward(params, spec, ids)
        l2, _ = forward(params2, spec2, ids)
        np.testing.assert_allclose(
            np.asarray(l1, np.float32), np.asarray(l2, np.float32), rtol=2e-2, atol=2e-2
        )

    def test_mla_moe_hf_roundtrip(self, mla_moe_model, tmp_path):
        spec, params = mla_moe_model
        self._save_hf(spec, params, tmp_path)
        spec2, params2 = load_hf_model(tmp_path)
        assert spec2.is_mla and spec2.kv_lora_rank == spec.kv_lora_rank
        assert spec2.num_shared_experts == spec.num_shared_experts
        assert spec2.mlp_only_layers == spec.mlp_only_layers
        ids = jnp.array([[7, 8, 9, 1]], dtype=jnp.int32)
        l1, _ = forward(params, spec, ids)
        l2, _ = forward(params2, spec2, ids)
        np.testing.assert_allclose(
            np.asarray(l1, np.float32), np.asarray(l2, np.float32), rtol=2e-2, atol=2e-2
        )

    def test_compressed_roundtrip(self, dense_model, tmp_path):
        spec, params = dense_model
        scheme = PRESET_SCHEMES["W4A16_G32"]
        plain = model_plain_tensors(spec, params)
        quant = {}
        for prefix, lin in iter_model_linears(spec, params):
            w_nk = np.asarray(lin.weight, np.float32).T
            if prefix == "lm_head":
                plain[f"{prefix}.weight"] = w_nk
                continue
            qt = quantize(jnp.asarray(w_nk), scheme.weights)
            quant[prefix] = CompressedParam(qt=qt, args=scheme.weights)
        save_compressed_model(
            tmp_path, plain, quant,
            config_groups={"group_0": scheme},
            ignore=["lm_head"],
            base_config=spec.to_hf_config(),
        )
        spec2, params2 = load_compressed_model(tmp_path)
        # quantized modules loaded as w4 layouts
        assert params2["layers"][0]["q_proj"].kind == "w4"
        ids = jnp.array([[1, 2, 3, 4]], dtype=jnp.int32)
        logits, _ = forward(params2, spec2, ids)
        assert jnp.isfinite(logits.astype(jnp.float32)).all()


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-v"]))


class TestMoEGatheredDecode:
    """The decode-path gathered top-k MoE must match the dense all-expert
    scan bit-for-tolerance (same math, only selected experts touched)."""

    def _mk(self, kind="dense"):
        spec = ModelSpec.tiny(moe=True, num_experts=16, num_experts_per_tok=2)
        params = init_params(spec, jax.random.PRNGKey(7))
        if kind == "w4":
            from quantizers_tpu.models.moe import ExpertLinears
            from quantizers_tpu.ops.linear import from_quantized

            scheme = PRESET_SCHEMES["W4A16_G32"]
            moe = params["layers"][0]["moe"]
            for proj in ("gate_proj", "up_proj", "down_proj"):
                el = moe[proj]
                qs = []
                for e in range(el.num_experts):
                    w_nk = np.asarray(el.expert(e).dequantize(jnp.float32)).T
                    qs.append(from_quantized(quantize(jnp.asarray(w_nk), scheme.weights),
                                             scheme.weights))
                moe[proj] = ExpertLinears.stack(qs)
        return spec, params

    @pytest.mark.parametrize("kind", ["dense", "w4"])
    def test_matches_dense_scan(self, kind):
        from quantizers_tpu.models.moe import moe_forward

        spec, params = self._mk(kind)
        moe = params["layers"][0]["moe"]
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 1, spec.hidden_size),
                              jnp.bfloat16) * 0.5
        # N*k = 4 < E = 16 -> gathered path
        y_gather = moe_forward(moe, spec, x)
        # capture forces the dense scan path
        y_dense = moe_forward(moe, spec, x, capture={})
        np.testing.assert_allclose(
            np.asarray(y_gather, np.float32), np.asarray(y_dense, np.float32),
            rtol=3e-2, atol=3e-2)

    def test_prefill_uses_dense(self):
        from quantizers_tpu.models.moe import moe_forward, _GATHER_DECODE_MAX_TOKENS

        spec, params = self._mk()
        moe = params["layers"][0]["moe"]
        T = _GATHER_DECODE_MAX_TOKENS + 4
        x = jax.random.normal(jax.random.PRNGKey(4), (2, T, spec.hidden_size),
                              jnp.bfloat16) * 0.5
        y = moe_forward(moe, spec, x)  # N > threshold -> dense scan, no error
        assert y.shape == x.shape
        assert jnp.isfinite(y.astype(jnp.float32)).all()
