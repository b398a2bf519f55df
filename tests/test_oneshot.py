"""Oneshot engine tests: RTN / AWQ / GPTQ / AutoRound on tiny models.

The reference has no numeric tests for quantization algorithms (they live
in llmcompressor); here each algorithm gets a golden property test —
AWQ/GPTQ/AutoRound must beat plain RTN in their own objective — plus full
pipeline round-trips (oneshot → compressed checkpoint → reload → forward).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quantizers_tpu.core.numerics import dequantize, fake_quantize, quantize
from quantizers_tpu.core.scheme import PRESET_SCHEMES, QuantizationArgs, QuantStrategy, QuantType
from quantizers_tpu.models import ModelSpec, forward, init_params
from quantizers_tpu.models.loader import load_compressed_model, model_plain_tensors, iter_model_linears
from quantizers_tpu.oneshot import make_batches, oneshot
from quantizers_tpu.oneshot.gptq import gptq_quantize
from quantizers_tpu.oneshot.autoround import autoround_quantize
from quantizers_tpu.recipes import parse_recipe
from quantizers_tpu.formats.checkpoint import save_compressed_model


W4G32 = {
    "targets": ["Linear"],
    "weights": {"num_bits": 4, "type": "int", "symmetric": True,
                "strategy": "group", "group_size": 32},
}


def _recipe(modifier: str, extra=None, ignore=("lm_head",)):
    body = {"config_groups": {"group_0": dict(W4G32)}, "ignore": list(ignore)}
    body.update(extra or {})
    return parse_recipe({"quant_stage": {"quant_modifiers": {modifier: body}}})


def _tiny_batches(spec, n=4, T=16):
    rng = np.random.default_rng(0)
    samples = [list(rng.integers(1, spec.vocab_size, size=rng.integers(T // 2, T)))
               for _ in range(n)]
    return make_batches(samples, max_seq_length=T, batch_size=2, pad_to_multiple=8)


@pytest.fixture(scope="module")
def dense():
    spec = ModelSpec.tiny()
    return spec, init_params(spec, jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def moe():
    spec = ModelSpec.tiny(moe=True)
    return spec, init_params(spec, jax.random.PRNGKey(1))


def _clone(params):
    return jax.tree_util.tree_map(lambda x: x, params)


def _logits(spec, params, ids):
    out, _ = forward(params, spec, ids)
    return np.asarray(out, np.float32)


class TestMakeBatches:
    def test_shapes_and_mask(self):
        batches = make_batches([[1, 2, 3], [4, 5], list(range(1, 30))],
                               max_seq_length=16, batch_size=2, pad_to_multiple=8)
        assert len(batches) == 2
        for ids, mask in batches:
            assert ids.shape == mask.shape
            assert ids.shape[1] % 8 == 0
            assert ids.shape[1] <= 16
        # total real tokens preserved (truncated to max_seq_length)
        total = sum(int(m.sum()) for _, m in batches)
        assert total == 3 + 2 + 16

    def test_dict_rows(self):
        batches = make_batches([{"input_ids": [1, 2, 3]}], max_seq_length=8,
                               batch_size=1, pad_to_multiple=4)
        assert batches[0][0].shape == (1, 4)


class TestRTN:
    def test_oneshot_quantizes_and_runs(self, dense):
        spec, params0 = dense
        params = _clone(params0)
        ids = jnp.array([[1, 2, 3, 4, 5, 6, 7, 8]], dtype=jnp.int32)
        ref = _logits(spec, params0, ids)

        res = oneshot(spec, params, _recipe("QuantizationModifier"),
                      _tiny_batches(spec))
        # every attn+mlp linear in both layers quantized; lm_head ignored
        assert len(res.records) == spec.num_layers * 7
        assert all(".lm_head" not in p for p in res.records)
        assert res.params["layers"][0]["q_proj"].kind == "w4"

        out = _logits(spec, res.params, ids)
        rel = np.abs(ref - out).mean() / (np.abs(ref).mean() + 1e-9)
        assert rel < 0.3

    def test_oneshot_mla_deepseek_moe(self):
        """RTN oneshot over a DeepSeek-shaped model (MLA + shared-expert MoE):
        every site — MLA projections, routed experts, shared experts — gets
        compressed, router stays ignored (mirrors the reference's ignore
        policy, `quant_GLM-4.7-Flash-FP8.py:15-22`)."""
        spec = ModelSpec.tiny(moe=True, mla=True)
        params0 = init_params(spec, jax.random.PRNGKey(3))
        params = _clone(params0)
        ids = jnp.array([[1, 2, 3, 4, 5, 6]], dtype=jnp.int32)
        ref = _logits(spec, params0, ids)

        recipe = parse_recipe({"quant_stage": {"quant_modifiers": {
            "QuantizationModifier": {
                "config_groups": {"group_0": dict(W4G32)},
                "ignore": ["lm_head", "re:.*mlp\\.gate$"]}}}})
        res = oneshot(spec, params, recipe, _tiny_batches(spec))
        # layer 0 (dense mlp): 5 MLA + 3 mlp = 8 records
        # layer 1 (moe): 5 MLA + 3 experts*4 + 3 shared = 8 + 12 + 3... records
        # count: expert sites emit one record per expert
        prefixes = set(res.records)
        assert "model.layers.0.self_attn.kv_b_proj" in prefixes
        assert "model.layers.1.mlp.experts.0.down_proj" in prefixes
        assert "model.layers.1.mlp.shared_experts.down_proj" in prefixes
        assert not any(p.endswith("mlp.gate") for p in prefixes)

        out = _logits(spec, res.params, ids)
        rel = np.abs(ref - out).mean() / (np.abs(ref).mean() + 1e-9)
        assert rel < 0.35

    def test_static_fp8_act_scales(self, dense):
        spec, params0 = dense
        params = _clone(params0)
        scheme = {
            "targets": ["Linear"],
            "weights": {"num_bits": 8, "type": "float", "strategy": "channel"},
            "input_activations": {"num_bits": 8, "type": "float",
                                  "strategy": "tensor", "dynamic": False},
        }
        recipe = parse_recipe({"quant_stage": {"quant_modifiers": {
            "QuantizationModifier": {
                "config_groups": {"group_0": scheme}, "ignore": ["lm_head"]}}}})
        res = oneshot(spec, params, recipe, _tiny_batches(spec))
        scales = [k for k in res.extra_tensors if k.endswith(".input_scale")]
        assert len(scales) == spec.num_layers * 7
        assert all(res.extra_tensors[k][0] > 0 for k in scales)


class TestAWQ:
    def test_awq_beats_rtn_on_outlier_channels(self):
        """Synthetic case with activation outliers — AWQ's home turf."""
        rng = np.random.default_rng(3)
        K, N, rows = 64, 32, 256
        W = rng.normal(size=(N, K)).astype(np.float32)
        X = rng.normal(size=(rows, K)).astype(np.float32)
        X[:, :4] *= 50.0  # outlier channels

        args = QuantizationArgs(num_bits=4, type=QuantType.INT, symmetric=True,
                                strategy=QuantStrategy.GROUP, group_size=32)
        Xj, Wj = jnp.asarray(X), jnp.asarray(W)
        y_ref = Xj @ Wj.T

        # plain RTN
        err_rtn = float(jnp.mean((Xj @ fake_quantize(Wj, args).T - y_ref) ** 2))

        # AWQ-style: scale by duo formula, search
        from quantizers_tpu.oneshot.awq import _search_scale

        x_mean = np.abs(X).mean(axis=0)
        w_mean = np.abs(W).mean(axis=0)
        s = _search_scale(X, x_mean, w_mean, [Wj], args, duo_scaling=True)
        sj = jnp.asarray(s)
        wq = fake_quantize(Wj * sj[None, :], args)
        err_awq = float(jnp.mean(((Xj / sj[None, :]) @ wq.T - y_ref) ** 2))
        assert err_awq < err_rtn, (err_awq, err_rtn)

    def test_awq_oneshot_runs(self, dense):
        spec, params0 = dense
        params = _clone(params0)
        ids = jnp.array([[1, 2, 3, 4, 5, 6, 7, 8]], dtype=jnp.int32)
        ref = _logits(spec, params0, ids)
        res = oneshot(spec, params,
                      _recipe("AWQModifier", {"duo_scaling": True}),
                      _tiny_batches(spec))
        assert len(res.records) == spec.num_layers * 7
        out = _logits(spec, res.params, ids)
        rel = np.abs(ref - out).mean() / (np.abs(ref).mean() + 1e-9)
        assert rel < 0.3


class TestGPTQ:
    def test_gptq_beats_rtn_in_hessian_metric(self):
        rng = np.random.default_rng(5)
        K, N, rows = 64, 16, 512
        W = rng.normal(size=(N, K)).astype(np.float32)
        X = rng.normal(size=(rows, K)).astype(np.float32)
        X[:, : K // 4] *= 8.0  # anisotropic inputs
        H = jnp.asarray(2.0 * X.T @ X)
        args = QuantizationArgs(num_bits=4, type=QuantType.INT, symmetric=True,
                                strategy=QuantStrategy.GROUP, group_size=32)
        Wj, Xj = jnp.asarray(W), jnp.asarray(X)
        y_ref = Xj @ Wj.T

        qt, g_idx = gptq_quantize(Wj, H, args, block_size=32)
        assert g_idx is None
        w_gptq = dequantize(qt, args)
        err_gptq = float(jnp.mean((Xj @ w_gptq.T - y_ref) ** 2))
        err_rtn = float(jnp.mean((Xj @ fake_quantize(Wj, args).T - y_ref) ** 2))
        assert err_gptq < err_rtn, (err_gptq, err_rtn)

    def test_gptq_actorder_group_emits_gidx(self):
        rng = np.random.default_rng(6)
        K, N = 64, 8
        W = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32))
        X = rng.normal(size=(128, K)).astype(np.float32)
        X[:, ::3] *= 10
        H = jnp.asarray(2.0 * X.T @ X)
        args = QuantizationArgs(num_bits=4, type=QuantType.INT, symmetric=True,
                                strategy=QuantStrategy.GROUP, group_size=16,
                                actorder="group")
        qt, g_idx = gptq_quantize(W, H, args, block_size=32)
        assert g_idx is not None and g_idx.shape == (K,)
        # every group index used exactly group_size times
        vals, counts = np.unique(g_idx, return_counts=True)
        assert list(vals) == list(range(K // 16))
        assert all(c == 16 for c in counts)

    def test_gptq_oneshot_runs(self, dense):
        spec, params0 = dense
        params = _clone(params0)
        ids = jnp.array([[1, 2, 3, 4, 5, 6, 7, 8]], dtype=jnp.int32)
        ref = _logits(spec, params0, ids)
        res = oneshot(spec, params, _recipe("GPTQModifier"), _tiny_batches(spec))
        assert len(res.records) == spec.num_layers * 7
        out = _logits(spec, res.params, ids)
        rel = np.abs(ref - out).mean() / (np.abs(ref).mean() + 1e-9)
        assert rel < 0.3


class TestAutoRound:
    def test_autoround_beats_rtn(self):
        rng = np.random.default_rng(7)
        K, N, rows = 32, 16, 128
        W = rng.normal(size=(N, K)).astype(np.float32)
        X = rng.normal(size=(rows, K)).astype(np.float32)
        args = QuantizationArgs(num_bits=3, type=QuantType.INT, symmetric=True,
                                strategy=QuantStrategy.GROUP, group_size=16)
        Wj, Xj = jnp.asarray(W), jnp.asarray(X)
        y_ref = Xj @ Wj.T
        qt = autoround_quantize(Wj, X, args, iters=100)
        w_ar = dequantize(qt, args)
        err_ar = float(jnp.mean((Xj @ w_ar.T - y_ref) ** 2))
        err_rtn = float(jnp.mean((Xj @ fake_quantize(Wj, args).T - y_ref) ** 2))
        assert err_ar <= err_rtn * 1.001, (err_ar, err_rtn)

    def test_autoround_oneshot_runs(self, dense):
        spec, params0 = dense
        params = _clone(params0)
        res = oneshot(spec, params, _recipe("AutoRoundModifier", {"iters": 8}),
                      _tiny_batches(spec))
        assert len(res.records) == spec.num_layers * 7


class TestMoEOneshot:
    def test_experts_only_nvfp4(self, moe):
        """Mirror of reference recipe_MoE_RTN_NVFP4.yaml: experts quantized,
        router + attention kept high-precision."""
        spec, params0 = moe
        params = _clone(params0)
        recipe = parse_recipe({"quant_stage": {"quant_modifiers": {
            "QuantizationModifier": {
                "config_groups": {"group_0": {
                    "targets": ["re:.*mlp\\.experts\\.\\d+\\.(gate|up|down)_proj$"],
                    "weights": {"num_bits": 4, "type": "float", "symmetric": True,
                                "strategy": "tensor_group", "group_size": 16},
                }},
                "ignore": ["lm_head", "re:.*mlp\\.gate$"],
            }}}})
        res = oneshot(spec, params, recipe, _tiny_batches(spec),
                      moe_calibrate_all_experts=True)
        E = spec.num_experts
        assert len(res.records) == spec.num_layers * 3 * E
        layer0 = res.params["layers"][0]
        assert layer0["moe"]["gate_proj"].kind == "nvfp4"
        assert layer0["moe"]["router"].kind == "dense"
        assert layer0["q_proj"].kind == "dense"
        ids = jnp.array([[1, 2, 3, 4]], dtype=jnp.int32)
        out, _ = forward(res.params, spec, ids)
        assert np.isfinite(np.asarray(out, np.float32)).all()


class TestEndToEnd:
    def test_oneshot_save_reload(self, dense, tmp_path):
        spec, params0 = dense
        params = _clone(params0)
        res = oneshot(spec, params, _recipe("QuantizationModifier"),
                      _tiny_batches(spec))
        plain = model_plain_tensors(spec, res.params)
        for prefix, lin in iter_model_linears(spec, res.params):
            if prefix not in res.records:
                plain[f"{prefix}.weight"] = np.asarray(
                    lin.dequantize(jnp.float32)).T
        save_compressed_model(
            tmp_path, plain, res.records,
            config_groups=res.config_groups, ignore=res.ignore,
            base_config=spec.to_hf_config(),
        )
        spec2, params2 = load_compressed_model(tmp_path)
        assert params2["layers"][0]["q_proj"].kind == "w4"
        ids = jnp.array([[1, 2, 3, 4]], dtype=jnp.int32)
        a = _logits(spec, res.params, ids)
        b = _logits(spec2, params2, ids)
        np.testing.assert_allclose(a, b, rtol=5e-2, atol=5e-2)


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-v"]))


class TestMSEObserver:
    def test_mse_beats_minmax_with_outlier(self):
        """A single huge outlier blows up the minmax scale; MSE clips it."""
        rng = np.random.default_rng(11)
        W = rng.normal(size=(8, 64)).astype(np.float32)
        W[0, 0] = 40.0  # outlier
        args_mm = QuantizationArgs(num_bits=4, type=QuantType.INT, symmetric=True,
                                   strategy=QuantStrategy.GROUP, group_size=64,
                                   observer="minmax")
        args_mse = QuantizationArgs(num_bits=4, type=QuantType.INT, symmetric=True,
                                    strategy=QuantStrategy.GROUP, group_size=64,
                                    observer="mse")
        Wj = jnp.asarray(W)
        err_mm = float(jnp.mean((fake_quantize(Wj, args_mm) - Wj) ** 2))
        err_mse = float(jnp.mean((fake_quantize(Wj, args_mse) - Wj) ** 2))
        assert err_mse < err_mm, (err_mse, err_mm)

    def test_mse_asymmetric(self):
        rng = np.random.default_rng(12)
        W = jnp.asarray(rng.normal(size=(4, 32)).astype(np.float32) + 1.5)
        args = QuantizationArgs(num_bits=4, type=QuantType.INT, symmetric=False,
                                strategy=QuantStrategy.CHANNEL, observer="mse")
        out = fake_quantize(W, args)
        assert float(jnp.mean((out - W) ** 2)) < 0.05


class TestSmoothQuant:
    def test_smoothquant_plus_rtn(self, dense):
        """SmoothQuant transforms, RTN compresses — forward stays close."""
        spec, params0 = dense
        params = _clone(params0)
        recipe = parse_recipe({"quant_stage": {"quant_modifiers": {
            "SmoothQuantModifier": {"smoothing_strength": 0.5},
            "QuantizationModifier": {
                "config_groups": {"group_0": dict(W4G32)},
                "ignore": ["lm_head"]},
        }}})
        ids = jnp.array([[1, 2, 3, 4, 5, 6, 7, 8]], dtype=jnp.int32)
        ref = _logits(spec, params0, ids)
        res = oneshot(spec, params, recipe, _tiny_batches(spec))
        # all sites still compressed by RTN (SmoothQuant claims none)
        assert len(res.records) == spec.num_layers * 7
        out = _logits(spec, res.params, ids)
        rel = np.abs(ref - out).mean() / (np.abs(ref).mean() + 1e-9)
        assert rel < 0.3


class TestKVCacheCalibration:
    def test_kv_scales_emitted(self, dense):
        spec, params0 = dense
        params = _clone(params0)
        recipe = parse_recipe({"quant_stage": {"quant_modifiers": {
            "QuantizationModifier": {
                "config_groups": {"group_0": dict(W4G32)},
                "ignore": ["lm_head"],
                "kv_cache_scheme": {"num_bits": 8, "type": "float",
                                    "strategy": "tensor", "symmetric": True},
            }}}})
        res = oneshot(spec, params, recipe, _tiny_batches(spec))
        assert res.kv_cache_scheme is not None
        for li in range(spec.num_layers):
            k = res.extra_tensors[f"model.layers.{li}.self_attn.k_scale"]
            v = res.extra_tensors[f"model.layers.{li}.self_attn.v_scale"]
            assert k[0] > 0 and v[0] > 0

    def test_mla_kv_scales_describe_latent_cache(self):
        """For MLA the serving cache stores (c_kv latent, post-rope k_pe)
        rows — the emitted fp8 scales must be calibrated from THOSE
        tensors, not from the expanded per-head K/V whose ranges differ.
        k_pe values are bounded by the rope rotation of the raw kv_a
        output, so its absmax differs from the expanded-V absmax; the
        sanity check here is that scales exist and the k-side scale
        corresponds to the latent's magnitude (latent dim >> rope dim)."""
        import jax as _jax

        from quantizers_tpu.models import ModelSpec, forward, init_params

        spec = ModelSpec.tiny(mla=True)
        params = init_params(spec, _jax.random.PRNGKey(9))
        recipe = parse_recipe({"quant_stage": {"quant_modifiers": {
            "QuantizationModifier": {
                "config_groups": {"group_0": dict(W4G32)},
                "ignore": ["lm_head", "re:.*kv_a_proj.*", "re:.*kv_b_proj.*",
                           "re:.*q_a_proj.*", "re:.*q_b_proj.*"],
                "kv_cache_scheme": {"num_bits": 8, "type": "float",
                                    "strategy": "tensor", "symmetric": True},
            }}}})
        rng = np.random.default_rng(3)
        rows = [list(rng.integers(1, spec.vocab_size, 12)) for _ in range(4)]
        batches = make_batches(rows, max_seq_length=16, batch_size=2,
                               pad_to_multiple=8)
        res = oneshot(spec, params, recipe, batches)
        assert res.kv_cache_scheme is not None
        divisor = res.kv_cache_scheme.scale_divisor

        # recompute the latent absmax directly from a capture-style forward
        from quantizers_tpu.models.transformer import apply_layer, embed

        ids, mask = batches[0]
        h = embed(res.params, jnp.asarray(ids))
        pos = jnp.broadcast_to(jnp.arange(h.shape[1])[None, :], h.shape[:2])
        cap = {}
        apply_layer(res.params["layers"][0], spec, 0, h, pos, None,
                    capture=cap)
        lat_max = float(jnp.max(jnp.abs(cap["k_cache"].astype(jnp.float32))))
        k_scale = float(res.extra_tensors["model.layers.0.self_attn.k_scale"][0])
        # emitted scale = max-over-batches(latent absmax)/divisor >= this
        # single batch's latent absmax / divisor
        assert k_scale >= lat_max / divisor * 0.999
        # and the captured k-side tensor IS the latent (shape check)
        assert cap["k_cache"].shape[-1] == spec.kv_lora_rank


class TestHostOffload:
    """offload='host' streams one layer + one hidden batch through the
    device at a time and must match the all-device pipeline bit-for-bit
    (VERDICT: the engine docstring's layer-streaming memory model)."""

    def test_results_match_device_mode(self, dense):
        spec, params = dense
        recipe = _recipe("AWQModifier")
        batches = _tiny_batches(spec)
        res_dev = oneshot(spec, _clone(params), recipe, batches)
        res_host = oneshot(spec, _clone(params), recipe, batches,
                           offload="host")
        assert set(res_dev.records) == set(res_host.records)
        for k in res_dev.records:
            np.testing.assert_array_equal(
                np.asarray(res_dev.records[k].qt.values),
                np.asarray(res_host.records[k].qt.values))
        ids = np.array([[5, 6, 7, 8]], np.int32)
        np.testing.assert_allclose(_logits(spec, res_dev.params, ids),
                                   _logits(spec, res_host.params, ids),
                                   rtol=2e-2, atol=2e-2)

    def test_host_params_stay_numpy(self, dense):
        spec, params = dense
        recipe = _recipe("QuantizationModifier")
        res = oneshot(spec, _clone(params), recipe, _tiny_batches(spec),
                      offload="host")
        import jax as _jax

        for leaf in _jax.tree_util.tree_leaves(res.params["layers"]):
            assert isinstance(leaf, np.ndarray), type(leaf)

    def test_record_residency_tracks_offload_mode(self, dense):
        """Records stay DEVICE-resident in the default pipeline (the
        per-site host download through a ~16 MB/s tunnel was a third of
        the GPTQ wall; serialization downloads at write time) but must be
        HOST-resident under offload='host' — keeping a 30B model's
        records in HBM would defeat the one-layer-in-HBM streaming."""
        import jax as _jax

        spec, params = dense
        recipe = _recipe("QuantizationModifier")
        res_dev = oneshot(spec, _clone(params), recipe, _tiny_batches(spec))
        assert all(isinstance(cp.qt.values, _jax.Array)
                   and not isinstance(cp.qt.values, np.ndarray)
                   for cp in res_dev.records.values())
        res_host = oneshot(spec, _clone(params), recipe, _tiny_batches(spec),
                           offload="host")
        assert all(isinstance(cp.qt.values, np.ndarray)
                   for cp in res_host.records.values())

    def test_bad_offload_rejected(self, dense):
        spec, params = dense
        with pytest.raises(ValueError, match="offload"):
            oneshot(spec, params, _recipe("QuantizationModifier"), [],
                    offload="disk")

    def test_streaming_peak_bytes_30b_fits_one_chip(self):
        """Shape math for a Qwen3-30B-A3B-shaped spec: the host-offload
        peak (one layer + one hidden batch) must fit a single v5e's 16 GB
        HBM, while the all-device footprint plainly cannot."""
        from quantizers_tpu.oneshot import streaming_peak_bytes

        spec = ModelSpec(
            vocab_size=151936, hidden_size=2048, num_layers=48,
            num_heads=32, num_kv_heads=4, head_dim=128,
            intermediate_size=6144, num_experts=128,
            num_experts_per_tok=8, moe_intermediate_size=768,
            qk_norm=True, model_type="qwen3_moe",
        )
        est = streaming_peak_bytes(spec, batch_size=4, seq_len=4096)
        # one MoE layer bf16 ~= 1.2 GB; hiddens 4x4096x2048 bf16 = 64 MB
        assert est["layer_bytes"] < 2e9
        assert est["hidden_bytes"] < 1e8
        assert est["peak_bytes"] < 16e9, est
        # whole model on device would need > 60 GB — streaming is required
        total = est["layer_bytes"] * spec.num_layers + est["embed_bytes"]
        assert total > 55e9


class TestObservePathEfficiency:
    """Round-4 TPU-side observe/compile optimizations: activation stats
    reduce ON DEVICE (AWQ), shared-input sites share one Hessian (GPTQ),
    and same-kind layers share one compiled capture/propagate program."""

    def test_awq_observe_stats_matches_numpy(self):
        from quantizers_tpu.oneshot.awq import _observe_stats

        rng = np.random.default_rng(3)
        x = rng.normal(size=(2, 8, 16)).astype(np.float32)
        mask = np.ones((2, 8), np.float32)
        mask[1, 5:] = 0.0  # 13 valid rows
        sum_abs, count, rows = _observe_stats(
            jnp.asarray(x), jnp.asarray(mask), take=5, masked=True)
        x2 = x.reshape(-1, 16)
        valid = x2[mask.reshape(-1) > 0]
        np.testing.assert_allclose(np.asarray(sum_abs),
                                   np.abs(valid).sum(0), rtol=1e-5)
        assert float(count) == 13.0
        # the 5 sampled rows are valid rows, evenly spread over the 13
        expect = valid[(np.arange(5) * 13 // 5)]
        np.testing.assert_allclose(np.asarray(rows), expect, rtol=1e-6)

    def test_gptq_hessian_shared_across_same_input_sites(self, dense):
        from quantizers_tpu.oneshot.gptq import GPTQModifier
        from quantizers_tpu.oneshot.modifiers import LayerCtx
        from quantizers_tpu.oneshot.sites import layer_sites

        spec, params = dense
        layer = _clone(params)["layers"][0]
        sites = {s.name: s for s in layer_sites(spec, 0, layer)}
        recipe = _recipe("GPTQModifier")
        mspec = recipe.modifiers[0]
        scheme = next(iter(mspec.config_groups.values()))
        mod = GPTQModifier(mspec)
        ctx = LayerCtx(spec=spec, layer_idx=0, layer=layer,
                       sites=list(sites.values()))
        matched = [(sites[n], "group_0", scheme) for n in ("q_proj", "k_proj", "v_proj")]
        state = mod.begin_layer(ctx, matched)

        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 4, spec.hidden_size)).astype(np.float32))
        cap = {"_batch_idx": 0}
        for n in ("q_proj", "k_proj", "v_proj"):
            mod.observe(state, sites[n], x, None, cap)
        # ONE Hessian accumulated, both others alias to it
        assert len(state["H"]) == 1
        canon = next(iter(state["H"]))
        for n in ("q_proj", "k_proj", "v_proj"):
            assert state["alias"][sites[n].prefix] == canon
        x2 = np.asarray(x, np.float64).reshape(-1, spec.hidden_size)
        np.testing.assert_allclose(np.asarray(state["H"][canon]),
                                   2.0 * x2.T @ x2, rtol=1e-4, atol=1e-3)
        # a second batch with a fresh array keeps accumulating, not aliasing
        x_b1 = x + 1.0
        cap = {"_batch_idx": 1}
        for n in ("q_proj", "k_proj", "v_proj"):
            mod.observe(state, sites[n], x_b1, None, cap)
        assert len(state["H"]) == 1
        x2b = np.asarray(x_b1, np.float64).reshape(-1, spec.hidden_size)
        np.testing.assert_allclose(np.asarray(state["H"][canon]),
                                   2.0 * (x2.T @ x2 + x2b.T @ x2b),
                                   rtol=1e-4, atol=1e-3)

    def test_gptq_moe_expert_hessians(self, moe):
        """GPTQ on a MoE model: gate/up expert sites capture the SHARED 2-D
        pre-routing hidden (models/moe.py — one Hessian, exact for every
        expert; previously silently fell back to identity), down_proj gets
        stacked per-expert (E, C, C) Hessians with padding rows masked."""
        from quantizers_tpu.oneshot.gptq import GPTQModifier

        spec, params0 = moe
        params = _clone(params0)
        ids = jnp.array([[1, 2, 3, 4, 5, 6, 7, 8]], dtype=jnp.int32)
        ref = _logits(spec, params0, ids)
        res = oneshot(spec, params, _recipe("GPTQModifier"), _tiny_batches(spec),
                      moe_calibrate_all_experts=True)
        # every expert weight quantized
        E = spec.num_experts
        n_expert_records = sum(1 for k in res.records if "experts" in k)
        assert n_expert_records == spec.num_layers * 3 * E
        out = _logits(spec, res.params, ids)
        rel = np.abs(ref - out).mean() / (np.abs(ref).mean() + 1e-9)
        assert np.isfinite(rel) and rel < 0.3, rel

        # internals: shared 2-D Hessian for gate/up (aliased), 3-D for down
        from quantizers_tpu.oneshot.modifiers import LayerCtx
        from quantizers_tpu.oneshot.sites import layer_sites

        layer = _clone(params0)["layers"][0]
        sites = {s.name: s for s in layer_sites(spec, 0, layer)}
        mspec = _recipe("GPTQModifier").modifiers[0]
        scheme = next(iter(mspec.config_groups.values()))
        mod = GPTQModifier(mspec)
        expert_names = [n for n, s_ in sites.items() if s_.is_expert]
        matched = [(sites[n], "group_0", scheme) for n in expert_names]
        ctx = LayerCtx(spec=spec, layer_idx=0, layer=layer,
                       sites=list(sites.values()))
        state = mod.begin_layer(ctx, matched)
        rng = np.random.default_rng(0)
        D = spec.hidden_size
        Fe = spec.moe_intermediate_size or spec.intermediate_size
        h2 = jnp.asarray(rng.normal(size=(8, D)).astype(np.float32))
        down_in = jnp.asarray(rng.normal(size=(E, 8, Fe)).astype(np.float32))
        mask = np.ones((2, 4), np.float32)
        mask[1, 2:] = 0.0  # 6 valid rows
        cap = {"_batch_idx": 0}
        mod.observe(state, sites["gate_proj"], h2, jnp.asarray(mask), cap)
        mod.observe(state, sites["up_proj"], h2, jnp.asarray(mask), cap)
        mod.observe(state, sites["down_proj"], down_in, jnp.asarray(mask), cap)
        H_gu = mod._H_for(state, sites["gate_proj"].prefix)
        assert H_gu is not None and H_gu.shape == (D, D)
        assert mod._H_for(state, sites["up_proj"].prefix) is H_gu  # aliased
        H_dn = mod._H_for(state, sites["down_proj"].prefix)
        assert H_dn.shape == (E, Fe, Fe)
        # masking: padding rows contribute nothing
        x_np = np.asarray(down_in, np.float64)[0][mask.reshape(-1) > 0]
        np.testing.assert_allclose(np.asarray(H_dn[0]), 2.0 * x_np.T @ x_np,
                                   rtol=1e-4, atol=1e-3)

    def test_capture_alias_map_structural(self, dense, moe):
        """The engine's jaxpr-level alias map must find shared capture
        inputs (q/k/v one tensor, gate/up one tensor) — jit returns a
        distinct array per key, so id()-based dedup can never fire through
        the real capture path."""
        from quantizers_tpu.oneshot.engine import _capture_alias_map

        def canon(amap, key):
            return amap.get(key, key)

        for spec, params in (dense, moe):
            h = jnp.zeros((2, 8, spec.hidden_size), jnp.bfloat16)
            pos = jnp.broadcast_to(jnp.arange(8)[None, :], (2, 8))
            amap = _capture_alias_map(params["layers"][0], spec, 0, h, pos, True)
            # q/k/v share the post-norm hidden
            assert canon(amap, "q_proj") == canon(amap, "k_proj") \
                == canon(amap, "v_proj"), amap
            assert canon(amap, "o_proj") != canon(amap, "q_proj"), amap
            if spec.num_experts:
                # MoE gate/up (and the router) all see the pre-routing h2
                assert canon(amap, "moe_gate_proj") == canon(amap, "moe_up_proj") \
                    == canon(amap, "router"), amap
            else:
                assert canon(amap, "gate_proj") == canon(amap, "up_proj"), amap
                assert canon(amap, "down_proj") != canon(amap, "gate_proj"), amap

    def test_gptq_hessians_dedup_through_real_capture(self, dense):
        """End-to-end through the REAL jitted capture: one Hessian for
        q/k/v, one for gate/up — 4 accumulators for 7 sites."""
        from quantizers_tpu.oneshot.engine import _capture_alias_map, _capture_jit
        from quantizers_tpu.oneshot.gptq import GPTQModifier
        from quantizers_tpu.oneshot.modifiers import LayerCtx
        from quantizers_tpu.oneshot.sites import layer_sites

        spec, params0 = dense
        layer = _clone(params0)["layers"][0]
        sites = {s.name: s for s in layer_sites(spec, 0, layer)}
        mspec = _recipe("GPTQModifier").modifiers[0]
        scheme = next(iter(mspec.config_groups.values()))
        mod = GPTQModifier(mspec)
        matched = [(s, "group_0", scheme) for s in sites.values()]
        ctx = LayerCtx(spec=spec, layer_idx=0, layer=layer,
                       sites=list(sites.values()))
        state = mod.begin_layer(ctx, matched)
        h = jnp.zeros((2, 8, spec.hidden_size), jnp.bfloat16) + 0.1
        pos = jnp.broadcast_to(jnp.arange(8)[None, :], (2, 8))
        amap = _capture_alias_map(layer, spec, 0, h, pos, False)
        for bi in range(2):
            _, cap = _capture_jit(layer, spec, 0, h, pos, False)
            cap["_batch_idx"] = bi
            cap["_aliases"] = amap
            for s in sites.values():
                x_in = cap.get(s.capture_key)
                if x_in is not None:
                    mod.observe(state, s, x_in, None, cap)
        # 7 dense sites -> 4 Hessians: {q,k,v}, o, {gate,up}, down
        assert len(state["H"]) == 4, sorted(state["H"])
        al = state["alias"]
        assert al[sites["k_proj"].prefix] == al[sites["q_proj"].prefix] \
            == al[sites["v_proj"].prefix]
        assert al[sites["up_proj"].prefix] == al[sites["gate_proj"].prefix]
        assert al[sites["down_proj"].prefix] != al[sites["gate_proj"].prefix]

    def test_awq_take_budget_uses_valid_rows(self):
        """A heavily padded batch must not fill the sample budget with
        duplicate rows and starve later batches."""
        from quantizers_tpu.oneshot.awq import MAX_SEARCH_ROWS, _MappingState

        st = _MappingState()
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(4, 300, 16)).astype(np.float32))
        mask = np.zeros((4, 300), np.float32)
        mask[:, :25] = 1.0  # 100 valid of 1200 rows
        st.update(x, jnp.asarray(mask), valid_rows=100)
        assert st.rows_kept == 100  # not 512
        st.update(x + 1.0, jnp.asarray(mask), valid_rows=100)
        assert st.rows_kept == 200
        st.update(x, None)  # unmasked: all 1200 rows are valid
        assert st.rows_kept == MAX_SEARCH_ROWS

    def test_layer_forwards_compile_once_per_kind(self, dense):
        from quantizers_tpu.oneshot.engine import _capture_jit, _propagate_jit

        spec, params = dense  # uniform dense layers
        _capture_jit._clear_cache()
        _propagate_jit._clear_cache()
        # fixed-length samples -> one shape bucket
        samples = [list(range(1, 17))] * 4
        batches = make_batches(samples, max_seq_length=16, batch_size=2,
                               pad_to_multiple=8)
        oneshot(spec, _clone(params), _recipe("AWQModifier"), batches)
        assert _capture_jit._cache_size() == 1, _capture_jit._cache_size()
        assert _propagate_jit._cache_size() == 1, _propagate_jit._cache_size()


def test_layer_kind_is_trace_authoritative():
    """``spec.layer_kind`` is the engine's jit-sharing key
    (``_canonical_layer_idx``): two layers of equal kind MUST trace to
    identical programs, or same-kind sharing would silently calibrate
    later layers with the first layer's semantics (ADVICE r4 #1). This
    pins the contract with jaxpr equality on an interleaved dense/MoE
    spec — any future per-layer-index behavior must extend layer_kind
    (and will fail here if it doesn't)."""
    import jax

    from quantizers_tpu.models import init_params
    from quantizers_tpu.models.transformer import apply_layer
    from quantizers_tpu.oneshot.engine import _canonical_layer_idx

    spec = ModelSpec.tiny(moe=True, num_layers=4, decoder_sparse_step=2)
    kinds = [spec.layer_is_moe(i) for i in range(4)]
    assert kinds == [False, True, False, True]  # interleaved
    params = init_params(spec, jax.random.PRNGKey(0))
    x = jnp.zeros((2, 8, spec.hidden_size), jnp.bfloat16)
    pos = jnp.broadcast_to(jnp.arange(8)[None, :], (2, 8))

    shared = 0
    for i in range(4):
        c = _canonical_layer_idx(spec, i)
        assert spec.layer_kind(i) == spec.layer_kind(c)
        if c == i:
            continue
        shared += 1
        layer = params["layers"][i]
        jx_i = jax.make_jaxpr(
            lambda l, h, p, _i=i: apply_layer(l, spec, _i, h, p)[0]
        )(layer, x, pos)
        jx_c = jax.make_jaxpr(
            lambda l, h, p, _c=c: apply_layer(l, spec, _c, h, p)[0]
        )(layer, x, pos)
        assert str(jx_i) == str(jx_c), (
            f"apply_layer traces differ between layer {i} and its "
            f"canonical same-kind layer {c}; spec.layer_kind must be "
            f"extended to cover whatever distinguishes them")
    assert shared == 2  # layers 2,3 shared onto 0,1


def test_quantization_args_hash_with_unhashable_observer_kwargs():
    """A YAML recipe can put a LIST inside observer_kwargs; args ride as
    jit static args, so __hash__ must not raise (ADVICE r4 #3)."""
    a = QuantizationArgs(num_bits=4, type=QuantType.INT, symmetric=True,
                         strategy=QuantStrategy.GROUP, group_size=32,
                         observer_kwargs={"percentiles": [0.01, 0.99]})
    b = QuantizationArgs(num_bits=4, type=QuantType.INT, symmetric=True,
                         strategy=QuantStrategy.GROUP, group_size=32,
                         observer_kwargs={"percentiles": [0.01, 0.99]})
    assert hash(a) == hash(b)
    assert isinstance(hash(a), int)


def test_multi_modifier_with_unmatched_modifier_and_sync(dense, monkeypatch):
    """A sequential recipe where one modifier matches NO sites in the
    decoder layers must not crash the capture-pipeline barrier: the sync
    loop reads modifier states, and an unmatched modifier has none
    (round-5 review finding — KeyError at states[id(mod)])."""
    monkeypatch.setenv("QTPU_CAPTURE_SYNC_EVERY", "1")  # barrier every batch
    spec, params = dense
    recipe = parse_recipe({"quant_stage": {"quant_modifiers": {
        "GPTQModifier": {"config_groups": {"group_0": {
            "targets": ["re:.*self_attn.*"],
            "weights": dict(W4G32["weights"])}}, "ignore": ["lm_head"]},
        "QuantizationModifier": {"config_groups": {"group_1": {
            "targets": ["lm_head"],
            "weights": dict(W4G32["weights"])}}},
    }}})
    res = oneshot(spec, _clone(params), recipe, _tiny_batches(spec))
    assert res.records  # attention sites got quantized; no KeyError
