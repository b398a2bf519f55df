"""Golden numeric tests for the scheme zoo.

The reference has *no* numeric-accuracy tests (quantization math lives in
llmcompressor); SURVEY.md §4 calls for adding them here.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from quantizers_tpu.core import (
    FP4_E2M1_VALUES,
    PRESET_SCHEMES,
    QuantizationArgs,
    QuantStrategy,
    QuantType,
    dequantize,
    dynamic_quantize_group_fp8,
    dynamic_quantize_token_fp8,
    fake_quantize,
    quantize,
    quantize_to_fp4,
    quantize_to_fp8,
)


def rand(shape, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=shape).astype(np.float32) * scale)


class TestIntGroup:
    def test_w4_group_roundtrip_error_bounded(self):
        w = rand((64, 128), seed=1)
        args = QuantizationArgs(num_bits=4, type=QuantType.INT, strategy=QuantStrategy.GROUP, group_size=32)
        qt = quantize(w, args)
        wd = dequantize(qt, args)
        # max error <= scale/2 per element
        g = np.asarray(w).reshape(64, 4, 32)
        scale = np.asarray(qt.scale)
        err = np.abs(np.asarray(wd).reshape(64, 4, 32) - g)
        assert np.all(err <= scale[..., None] / 2 + 1e-6)

    def test_w4_values_on_grid(self):
        w = rand((16, 64), seed=2)
        args = QuantizationArgs(num_bits=4, type=QuantType.INT, strategy=QuantStrategy.GROUP, group_size=32)
        qt = quantize(w, args)
        v = np.asarray(qt.values)
        assert v.dtype == np.int8
        assert v.min() >= -8 and v.max() <= 7

    def test_asymmetric_zero_point(self):
        w = jnp.abs(rand((8, 32), seed=3)) + 1.0  # all positive
        args = QuantizationArgs(
            num_bits=4, type=QuantType.INT, symmetric=False, strategy=QuantStrategy.GROUP, group_size=32
        )
        qt = quantize(w, args)
        assert qt.zero_point is not None
        wd = dequantize(qt, args)
        assert np.allclose(np.asarray(wd), np.asarray(w), atol=np.asarray(qt.scale).max())

    def test_int8_channel(self):
        w = rand((32, 64), seed=4)
        args = QuantizationArgs(num_bits=8, type=QuantType.INT, strategy=QuantStrategy.CHANNEL)
        wd = fake_quantize(w, args)
        rel = np.abs(np.asarray(wd - w)).max() / np.abs(np.asarray(w)).max()
        assert rel < 0.01

    def test_group_padding_when_indivisible(self):
        w = rand((8, 40), seed=5)  # 40 not divisible by 32
        args = QuantizationArgs(num_bits=4, type=QuantType.INT, strategy=QuantStrategy.GROUP, group_size=32)
        wd = fake_quantize(w, args)
        assert wd.shape == w.shape


class TestFP8:
    def test_fp8_grid_snapping(self):
        x = jnp.asarray([0.0, 1.0, 448.0, 500.0, -500.0, 0.3])
        q = np.asarray(quantize_to_fp8(x))
        assert q[2] == 448.0
        assert q[3] == 448.0  # clipped
        assert q[4] == -448.0
        # every output must be representable in e4m3
        back = jnp.asarray(q).astype(jnp.float8_e4m3fn).astype(jnp.float32)
        assert np.array_equal(np.asarray(back), q)

    def test_fp8_tensor_scheme(self):
        w = rand((32, 32), seed=6, scale=10.0)
        args = QuantizationArgs(num_bits=8, type=QuantType.FLOAT, strategy=QuantStrategy.TENSOR)
        wd = fake_quantize(w, args)
        rel = np.abs(np.asarray(wd - w)).max() / np.abs(np.asarray(w)).max()
        assert rel < 0.05

    def test_fp8_block_128(self):
        w = rand((256, 384), seed=7)
        args = QuantizationArgs(
            num_bits=8, type=QuantType.FLOAT, strategy=QuantStrategy.BLOCK, block_structure=(128, 128)
        )
        qt = quantize(w, args)
        assert qt.scale.shape == (2, 3)
        wd = dequantize(qt, args)
        assert wd.shape == w.shape
        rel = np.abs(np.asarray(wd - w)).max() / np.abs(np.asarray(w)).max()
        assert rel < 0.05

    def test_fp8_block_pads_ragged_shapes(self):
        w = rand((200, 200), seed=8)
        args = QuantizationArgs(
            num_bits=8, type=QuantType.FLOAT, strategy=QuantStrategy.BLOCK, block_structure=(128, 128)
        )
        qt = quantize(w, args)
        assert qt.scale.shape == (2, 2)
        assert dequantize(qt, args).shape == w.shape

    def test_dynamic_token_fp8(self):
        x = rand((4, 16, 64), seed=9, scale=3.0)
        q, s = dynamic_quantize_token_fp8(x)
        assert q.dtype == jnp.float8_e4m3fn
        assert s.shape == (4, 16, 1)
        xd = q.astype(jnp.float32) * s
        assert np.abs(np.asarray(xd - x)).max() / np.abs(np.asarray(x)).max() < 0.1

    def test_dynamic_group_fp8(self):
        x = rand((2, 8, 256), seed=10)
        q, s = dynamic_quantize_group_fp8(x, 128)
        assert s.shape == (2, 8, 2)


class TestFP4NVFP4:
    def test_fp4_grid(self):
        x = jnp.asarray([0.0, 0.24, 0.26, 0.74, 0.76, 5.1, 7.0, -2.4, -2.6])
        q = np.asarray(quantize_to_fp4(x))
        expected = [0.0, 0.0, 0.5, 0.5, 1.0, 6.0, 6.0, -2.0, -3.0]
        assert np.allclose(q, expected)
        assert set(np.abs(q).tolist()) <= set(FP4_E2M1_VALUES)

    def test_nvfp4_two_level(self):
        w = rand((32, 64), seed=11)
        args = PRESET_SCHEMES["NVFP4"].weights
        qt = quantize(w, args)
        assert qt.global_scale is not None
        assert qt.scale.shape == (32, 4)  # groups of 16
        # scales must sit on the fp8 grid
        s8 = np.asarray(qt.scale)
        back = jnp.asarray(s8).astype(jnp.float8_e4m3fn).astype(jnp.float32)
        assert np.array_equal(np.asarray(back), s8)
        wd = dequantize(qt, args)
        rel = np.abs(np.asarray(wd - w)).max() / np.abs(np.asarray(w)).max()
        assert rel < 0.3  # fp4 is coarse

    def test_nvfp4_values_on_fp4_grid(self):
        w = rand((16, 32), seed=12)
        args = PRESET_SCHEMES["NVFP4"].weights
        qt = quantize(w, args)
        vals = set(np.unique(np.abs(np.asarray(qt.values))).tolist())
        assert vals <= set(FP4_E2M1_VALUES)


class TestSchemes:
    def test_presets_parse(self):
        for name, scheme in PRESET_SCHEMES.items():
            d = scheme.to_dict()
            assert "weights" in d

    def test_scheme_dict_roundtrip(self):
        from quantizers_tpu.core import QuantScheme

        d = {
            "targets": ["Linear"],
            "weights": {
                "num_bits": 4,
                "type": "int",
                "symmetric": True,
                "strategy": "group",
                "group_size": 32,
                "observer": "memoryless_minmax",
            },
        }
        s = QuantScheme.from_dict(d)
        assert s.weights.group_size == 32
        assert s.weights.observer == "memoryless_minmax"
        d2 = s.to_dict()
        assert d2["weights"]["group_size"] == 32
        assert d2["format"] == "pack-quantized"

    def test_invalid_args_raise(self):
        with pytest.raises(ValueError):
            QuantizationArgs(strategy=QuantStrategy.GROUP)  # no group size
        with pytest.raises(ValueError):
            QuantizationArgs(strategy=QuantStrategy.BLOCK)  # no block structure
        with pytest.raises(ValueError):
            QuantizationArgs(num_bits=3, type=QuantType.FLOAT)

    def test_block_structure_string_form(self):
        a = QuantizationArgs.from_dict({"num_bits": 8, "type": "float", "strategy": "block", "block_structure": "128x128"})
        assert a.block_structure == (128, 128)


class TestObservers:
    def test_minmax_running_envelope(self):
        from quantizers_tpu.core import observe_batches

        args = QuantizationArgs(num_bits=8, type=QuantType.INT, strategy=QuantStrategy.TENSOR)
        b1 = jnp.asarray([[1.0, -2.0]])
        b2 = jnp.asarray([[4.0, -1.0]])
        scale, _ = observe_batches([b1, b2], args, "minmax")
        assert float(scale) == pytest.approx(4.0 / 127.5)

    def test_memoryless_uses_last(self):
        from quantizers_tpu.core import observe_batches

        args = QuantizationArgs(num_bits=8, type=QuantType.INT, strategy=QuantStrategy.TENSOR)
        b1 = jnp.asarray([[100.0]])
        b2 = jnp.asarray([[4.0]])
        scale, _ = observe_batches([b1, b2], args, "memoryless_minmax")
        assert float(scale) == pytest.approx(4.0 / 127.5)

    def test_unknown_observer(self):
        from quantizers_tpu.core import get_observer

        with pytest.raises(ValueError):
            get_observer("bogus")


class TestTargetMatching:
    def test_match(self):
        from quantizers_tpu.core import is_ignored, match_targets

        assert match_targets("model.layers.0.self_attn.q_proj", "Linear", ["Linear"])
        assert match_targets(
            "model.layers.3.mlp.experts.7.down_proj",
            "Linear",
            [r"re:.*mlp\.experts\.\d+\.(down_proj|gate_proj|up_proj)$"],
        )
        assert not match_targets(
            "model.layers.3.mlp.gate", "Linear", [r"re:.*mlp\.experts\.\d+\.(down_proj|gate_proj|up_proj)$"]
        )
        assert is_ignored("lm_head", ["lm_head"])
        assert is_ignored("model.mlp.gate", [r"re:.*mlp\.gate$"])
        assert not is_ignored("model.mlp.gate_proj", [r"re:.*mlp\.gate$"])
