"""ops-layer tests: QuantLinear layouts, XLA reference path, and Pallas
kernels in interpret mode vs the XLA oracle."""

import numpy as np
import pytest

import jax

import jax.numpy as jnp

from quantizers_tpu.core import (
    PRESET_SCHEMES,
    QuantizationArgs,
    QuantStrategy,
    QuantType,
    dequantize,
    quantize,
)
from quantizers_tpu.ops import QuantLinear, dense_linear, from_quantized
from quantizers_tpu.ops.dispatch import xla_quant_matmul
from quantizers_tpu.ops import kernels as K


def rand(shape, seed=0, scale=1.0):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape).astype(np.float32) * scale)


W4_ARGS = QuantizationArgs(num_bits=4, type=QuantType.INT, strategy=QuantStrategy.GROUP, group_size=32)


class TestLayouts:
    def test_dense(self):
        w = rand((64, 32), seed=0)  # (N, K)
        lin = dense_linear(w)
        x = rand((4, 32), seed=1)
        y = xla_quant_matmul(x, lin)
        expected = x @ w.T
        assert np.allclose(np.asarray(y), np.asarray(expected), atol=0.15)

    def test_w4_layout_matches_host_dequant(self):
        w = rand((128, 256), seed=2)
        qt = quantize(w, W4_ARGS)
        host_deq = np.asarray(dequantize(qt, W4_ARGS))  # (N, K)
        lin = from_quantized(qt, W4_ARGS)
        dev_deq = np.asarray(lin.dequantize(dtype=jnp.float32))  # (K, N)
        assert np.allclose(dev_deq.T, host_deq, atol=1e-2, rtol=1e-2)

    def test_w4_matmul_matches_fakequant(self):
        w = rand((128, 256), seed=3)
        qt = quantize(w, W4_ARGS)
        lin = from_quantized(qt, W4_ARGS)
        x = rand((8, 256), seed=4)
        y = np.asarray(lin.apply(x, use_kernel=False))
        expected = np.asarray(x @ dequantize(qt, W4_ARGS).T)
        assert np.allclose(y, expected, atol=0.5, rtol=0.05)

    def test_fp8_block_layout(self):
        args = PRESET_SCHEMES["FP8_BLOCK"].weights
        w = rand((256, 256), seed=5)
        qt = quantize(w, args)
        lin = from_quantized(qt, args)
        dev = np.asarray(lin.dequantize(dtype=jnp.float32)).T
        host = np.asarray(dequantize(qt, args))
        assert np.allclose(dev, host, atol=1e-3)

    def test_nvfp4_layout(self):
        args = PRESET_SCHEMES["NVFP4"].weights
        w = rand((128, 128), seed=6)
        qt = quantize(w, args)
        lin = from_quantized(qt, args)
        dev = np.asarray(lin.dequantize(dtype=jnp.float32)).T
        host = np.asarray(dequantize(qt, args))
        assert np.allclose(dev, host, atol=2e-2, rtol=2e-2)

    def test_w8_channel_layout(self):
        args = QuantizationArgs(num_bits=8, type=QuantType.INT, strategy=QuantStrategy.CHANNEL)
        w = rand((64, 128), seed=7)
        qt = quantize(w, args)
        lin = from_quantized(qt, args)
        dev = np.asarray(lin.dequantize(dtype=jnp.float32)).T
        host = np.asarray(dequantize(qt, args))
        assert np.allclose(dev, host, atol=1e-3, rtol=1e-2)

    @pytest.mark.parametrize("name,args", [
        ("w4_group", W4_ARGS),
        ("w4_asym", QuantizationArgs(num_bits=4, type=QuantType.INT,
                                     symmetric=False,
                                     strategy=QuantStrategy.GROUP,
                                     group_size=32)),
        ("w8_channel", QuantizationArgs(num_bits=8, type=QuantType.INT,
                                        strategy=QuantStrategy.CHANNEL)),
        ("w8_group", QuantizationArgs(num_bits=8, type=QuantType.INT,
                                      strategy=QuantStrategy.GROUP,
                                      group_size=32)),
        ("fp8_channel", QuantizationArgs(num_bits=8, type=QuantType.FLOAT,
                                         strategy=QuantStrategy.CHANNEL)),
        ("fp8_tensor", QuantizationArgs(num_bits=8, type=QuantType.FLOAT,
                                        strategy=QuantStrategy.TENSOR)),
        ("fp8_block", QuantizationArgs(num_bits=8, type=QuantType.FLOAT,
                                       strategy=QuantStrategy.BLOCK,
                                       block_structure=[32, 32])),
        ("nvfp4", PRESET_SCHEMES["NVFP4"].weights),
    ])
    def test_device_path_matches_host_path(self, name, args):
        """from_quantized's device-resident fast path (no host round-trip —
        through the tunneled axon transport a big-head download runs at
        ~16 MB/s) must produce byte-identical layouts to the numpy path."""
        w = rand((64, 128), seed=12)
        qt_dev = jax.jit(lambda x: quantize(x, args))(w)
        qt_host = qt_dev._replace(
            values=np.asarray(qt_dev.values),
            scale=np.asarray(qt_dev.scale),
            zero_point=(None if qt_dev.zero_point is None
                        else np.asarray(qt_dev.zero_point)),
            global_scale=(None if qt_dev.global_scale is None
                          else np.asarray(qt_dev.global_scale)))
        lin_d = from_quantized(qt_dev, args)
        lin_h = from_quantized(qt_host, args)
        assert lin_d.kind == lin_h.kind
        assert lin_d.meta == lin_h.meta
        np.testing.assert_array_equal(
            np.asarray(lin_d.weight).view(np.uint8),
            np.asarray(lin_h.weight).view(np.uint8))
        np.testing.assert_array_equal(
            np.asarray(lin_d.scale, np.float32),
            np.asarray(lin_h.scale, np.float32))
        if lin_h.zero_point is not None:
            np.testing.assert_array_equal(np.asarray(lin_d.zero_point),
                                          np.asarray(lin_h.zero_point))

    def test_pytree_roundtrip(self):
        import jax

        w = rand((64, 64), seed=8)
        qt = quantize(w, W4_ARGS)
        lin = from_quantized(qt, W4_ARGS)
        leaves, treedef = jax.tree_util.tree_flatten(lin)
        lin2 = jax.tree_util.tree_unflatten(treedef, leaves)
        assert lin2.kind == "w4" and lin2.meta == lin.meta

    def test_bias(self):
        w = rand((32, 64), seed=9)
        b = rand((32,), seed=10)
        lin = dense_linear(w, bias=b)
        x = rand((2, 64), seed=11)
        y = np.asarray(lin.apply(x, use_kernel=False))
        expected = np.asarray(x @ w.T + b)
        assert np.allclose(y, expected, atol=0.3)


class TestPallasInterpret:
    """Kernels vs the XLA oracle, interpret mode (CPU CI)."""

    def _check(self, lin, k, atol=0.35):
        x = rand((4, k), seed=20, scale=0.5)
        ref = np.asarray(xla_quant_matmul(x, lin), dtype=np.float32)
        got = np.asarray(K.KERNELS[lin.kind](x, lin, interpret=True), dtype=np.float32)
        assert got.shape == ref.shape
        err = np.abs(got - ref).max()
        assert err <= atol, f"kernel {lin.kind} mismatch: {err}"

    def test_w4_kernel(self):
        w = rand((256, 512), seed=21)
        qt = quantize(w, W4_ARGS)
        self._check(from_quantized(qt, W4_ARGS), 512)

    def test_w4_kernel_3d_input(self):
        w = rand((128, 512), seed=22)
        qt = quantize(w, W4_ARGS)
        lin = from_quantized(qt, W4_ARGS)
        x = rand((2, 3, 512), seed=23)
        ref = np.asarray(xla_quant_matmul(x, lin), dtype=np.float32)
        got = np.asarray(K.w4_matmul(x, lin, interpret=True), dtype=np.float32)
        assert got.shape == (2, 3, 128)
        assert np.abs(got - ref).max() < 0.35

    def test_w4_kernel_int4_layout(self):
        """The signed-int4 device layout (w4_packed_to_int4) must produce
        the same result as the packed-u8 kernel and the XLA oracle."""
        import dataclasses

        from quantizers_tpu.ops.linear import w4_packed_to_int4

        w = rand((256, 512), seed=24)
        qt = quantize(w, W4_ARGS)
        lin = from_quantized(qt, W4_ARGS)
        lin_i4 = dataclasses.replace(lin, weight=w4_packed_to_int4(lin.weight))
        assert lin_i4.weight.shape == (512, 256)
        assert lin_i4.weight.dtype == jnp.int4
        self._check(lin_i4, 512)
        # dequantize() must understand the converted layout too
        np.testing.assert_allclose(
            np.asarray(lin_i4.dequantize(jnp.float32)),
            np.asarray(lin.dequantize(jnp.float32)), rtol=0, atol=0)

    def test_nvfp4_kernel_i8_layout(self):
        """The int8-doubled device layout (2x values, halved scale) must
        match the packed-u8 nvfp4 kernel and dequantize() exactly."""
        import dataclasses

        from quantizers_tpu.core.scheme import PRESET_SCHEMES
        from quantizers_tpu.ops.linear import nvfp4_packed_to_i8

        args = PRESET_SCHEMES["NVFP4"].weights
        w = rand((256, 512), seed=31)
        qt = quantize(w, args)
        lin = from_quantized(qt, args)
        lin_i8 = dataclasses.replace(
            lin, weight=nvfp4_packed_to_i8(lin.weight),
            scale=(lin.scale.astype(jnp.float32) * 0.5).astype(lin.scale.dtype))
        assert lin_i8.weight.shape == (512, 256)
        assert lin_i8.weight.dtype == jnp.int8
        x = rand((4, 512), seed=32, scale=0.5)
        y_u8 = np.asarray(K.nvfp4_matmul(x, lin, interpret=True), np.float32)
        y_i8 = np.asarray(K.nvfp4_matmul(x, lin_i8, interpret=True), np.float32)
        np.testing.assert_allclose(y_i8, y_u8, rtol=2e-2, atol=2e-2)
        np.testing.assert_allclose(
            np.asarray(lin_i8.dequantize(jnp.float32)),
            np.asarray(lin.dequantize(jnp.float32)), rtol=1e-6, atol=1e-7)

    def test_group_larger_than_in_features(self):
        """group_size > K degrades to one group over all K rows
        (llmcompressor semantics; core.quantize pads the in-dim). The
        GPTQ-g128 recipe on a K=64 o_proj crashed dequantize before."""
        args = QuantizationArgs(num_bits=4, type=QuantType.INT, symmetric=True,
                                strategy=QuantStrategy.GROUP, group_size=128)
        w = rand((32, 64), seed=41)  # K=64 < group 128
        qt = quantize(w, args)
        lin = from_quantized(qt, args)
        deq = np.asarray(lin.dequantize(jnp.float32))
        assert deq.shape == (64, 32)
        # device scales are stored bf16 -> bf16-level tolerance
        np.testing.assert_allclose(
            deq.T, np.asarray(dequantize(qt, args)), rtol=1e-2, atol=1e-2)
        x = rand((2, 64), seed=42)
        y = np.asarray(lin.apply(x, use_kernel=False))
        assert y.shape == (2, 32) and np.isfinite(y).all()

    def test_group_with_ragged_tail(self):
        """K % g != 0 with K > g: scales must band by the NOMINAL group
        size (a row-count-derived size silently mis-bands rows — the
        reviewer's K=100/g=32 reproduction hit 2.39 max abs error)."""
        args = QuantizationArgs(num_bits=4, type=QuantType.INT, symmetric=True,
                                strategy=QuantStrategy.GROUP, group_size=32)
        w = rand((16, 100), seed=43)
        qt = quantize(w, args)
        lin = from_quantized(qt, args)
        deq = np.asarray(lin.dequantize(jnp.float32))
        assert deq.shape == (100, 16)
        np.testing.assert_allclose(
            deq.T, np.asarray(dequantize(qt, args)), rtol=1e-2, atol=1e-2)

    def test_i4_device_layout_treemap(self):
        """i4_device_layout converts symmetric w4 leaves (and only those)
        inside jit; off-TPU (this CI) it must be an identity."""
        from quantizers_tpu.ops.linear import i4_device_layout

        w = rand((128, 256), seed=25)
        qt = quantize(w, W4_ARGS)
        lin = from_quantized(qt, W4_ARGS)
        tree = {"a": lin, "b": jnp.ones((3,))}
        out = jax.jit(i4_device_layout)(tree)
        # on CPU: no-op (packed u8 kept for the interpret path)
        assert out["a"].weight.dtype == jnp.uint8

    def test_w4_kernel_small_k_falls_back(self):
        """K too small for the TPU scale-tile row quantum -> the dispatcher
        must fall back to the XLA path rather than mis-tile."""
        from quantizers_tpu.ops.dispatch import quant_matmul

        w = rand((128, 256), seed=22)
        qt = quantize(w, W4_ARGS)
        lin = from_quantized(qt, W4_ARGS)
        x = rand((2, 256), seed=23)
        with pytest.raises(K.KernelUnsupported):
            K.w4_matmul(x, lin, interpret=True)
        ref = np.asarray(xla_quant_matmul(x, lin), dtype=np.float32)
        got = np.asarray(quant_matmul(x, lin), dtype=np.float32)
        np.testing.assert_allclose(got, ref, rtol=1e-2, atol=1e-2)

    def test_fp8_kernel(self):
        args = PRESET_SCHEMES["FP8_BLOCK"].weights
        w = rand((256, 256), seed=24)
        qt = quantize(w, args)
        self._check(from_quantized(qt, args), 256)

    def test_nvfp4_kernel(self):
        args = PRESET_SCHEMES["NVFP4"].weights
        w = rand((128, 256), seed=25)
        qt = quantize(w, args)
        self._check(from_quantized(qt, args), 256)

    def test_w8_channel_kernel(self):
        args = QuantizationArgs(num_bits=8, type=QuantType.INT, strategy=QuantStrategy.CHANNEL)
        w = rand((128, 256), seed=26)
        qt = quantize(w, args)
        self._check(from_quantized(qt, args), 256)

    def test_unsupported_shapes_raise(self):
        w = rand((100, 96), seed=27)  # N not mult of 128
        args = QuantizationArgs(num_bits=4, type=QuantType.INT, strategy=QuantStrategy.GROUP, group_size=32)
        qt = quantize(w, args)
        lin = from_quantized(qt, args)
        with pytest.raises(K.KernelUnsupported):
            K.w4_matmul(rand((2, 96), seed=28), lin, interpret=True)

    def test_dispatch_falls_back(self):
        """dispatch must not crash on unsupported kernel shapes."""
        w = rand((100, 96), seed=29)
        qt = quantize(w, W4_ARGS)
        lin = from_quantized(qt, W4_ARGS)
        x = rand((2, 96), seed=30)
        y = lin.apply(x)  # CPU -> XLA path regardless
        assert y.shape == (2, 100)


class TestDecodeAttention:
    """In-place decode attention kernel vs the XLA reference math."""

    def _reference(self, q, nk, nv, ck, cv, lengths):
        B, KV, rep, hd = q.shape
        S = ck.shape[2]
        k_all = np.array(ck)
        v_all = np.array(cv)
        ctx = np.zeros((B, KV, rep, cv.shape[3]), np.float32)
        for b in range(B):
            L = int(lengths[b])
            k_all[b, :, L] = nk[b]
            v_all[b, :, L] = nv[b]
            for h in range(KV):
                for r in range(rep):
                    s = (k_all[b, h, : L + 1].astype(np.float32)
                         @ np.asarray(q[b, h, r], np.float32)) / np.sqrt(hd)
                    p = np.exp(s - s.max()); p /= p.sum()
                    ctx[b, h, r] = p @ v_all[b, h, : L + 1].astype(np.float32)
        return ctx, k_all, v_all

    def test_matches_reference(self):
        from quantizers_tpu.ops.kernels import decode_attention

        rng = np.random.default_rng(0)
        B, KV, rep, hd, S = 2, 2, 2, 128, 16
        q = jnp.asarray(rng.standard_normal((B, KV, rep, hd)), jnp.bfloat16)
        nk = jnp.asarray(rng.standard_normal((B, KV, hd)), jnp.bfloat16)
        nv = jnp.asarray(rng.standard_normal((B, KV, hd)), jnp.bfloat16)
        ck = jnp.asarray(rng.standard_normal((B, KV, S, hd)), jnp.bfloat16)
        cv = jnp.asarray(rng.standard_normal((B, KV, S, hd)), jnp.bfloat16)
        lengths = jnp.asarray([3, 7], jnp.int32)

        ctx, k2, v2 = decode_attention(q, nk, nv, ck, cv, lengths,
                                       1.0 / np.sqrt(hd), interpret=True)
        ref_ctx, ref_k, ref_v = self._reference(
            np.asarray(q, np.float32), np.asarray(nk, np.float32),
            np.asarray(nv, np.float32), np.asarray(ck, np.float32),
            np.asarray(cv, np.float32), np.asarray(lengths))
        np.testing.assert_allclose(np.asarray(ctx, np.float32), ref_ctx,
                                   rtol=3e-2, atol=3e-2)
        np.testing.assert_allclose(np.asarray(k2, np.float32), ref_k,
                                   rtol=1e-2, atol=1e-2)
        np.testing.assert_allclose(np.asarray(v2, np.float32), ref_v,
                                   rtol=1e-2, atol=1e-2)

    def test_mla_decode_kernel_matches_reference(self):
        """Absorbed latent-cache MLA decode kernel vs a numpy oracle."""
        from quantizers_tpu.ops.kernels import mla_decode_attention

        rng = np.random.default_rng(1)
        B, H, r, dp, S = 2, 4, 128, 128, 16
        dr = 64  # real rope dims in the padded head
        q_abs = jnp.asarray(rng.standard_normal((B, H, r)) * 0.3, jnp.bfloat16)
        q_pe = jnp.asarray(
            np.pad(rng.standard_normal((B, H, dr)) * 0.3,
                   ((0, 0), (0, 0), (0, dp - dr))), jnp.bfloat16)
        new_c = jnp.asarray(rng.standard_normal((B, r)) * 0.3, jnp.bfloat16)
        new_p = jnp.asarray(
            np.pad(rng.standard_normal((B, dr)) * 0.3,
                   ((0, 0), (0, dp - dr))), jnp.bfloat16)
        cc = jnp.asarray(rng.standard_normal((B, 1, S, r)) * 0.3, jnp.bfloat16)
        cp = jnp.asarray(
            np.pad(rng.standard_normal((B, 1, S, dr)) * 0.3,
                   ((0, 0), (0, 0), (0, 0), (0, dp - dr))), jnp.bfloat16)
        lengths = jnp.asarray([3, 7], jnp.int32)
        sm = 1.0 / np.sqrt(192)

        ctx, c2, p2 = mla_decode_attention(q_abs, q_pe, new_c, new_p,
                                           cc, cp, lengths, sm, interpret=True)

        c_np = np.asarray(cc, np.float32).copy()
        p_np = np.asarray(cp, np.float32).copy()
        ref = np.zeros((B, H, r), np.float32)
        for b in range(B):
            L = int(lengths[b])
            c_np[b, 0, L] = np.asarray(new_c, np.float32)[b]
            p_np[b, 0, L] = np.asarray(new_p, np.float32)[b]
            for h in range(H):
                s = (c_np[b, 0, :L + 1] @ np.asarray(q_abs, np.float32)[b, h]
                     + p_np[b, 0, :L + 1] @ np.asarray(q_pe, np.float32)[b, h]
                     ) * sm
                pr = np.exp(s - s.max()); pr /= pr.sum()
                ref[b, h] = pr @ c_np[b, 0, :L + 1]
        np.testing.assert_allclose(np.asarray(ctx, np.float32), ref,
                                   rtol=4e-2, atol=4e-2)
        np.testing.assert_allclose(np.asarray(c2, np.float32), c_np,
                                   rtol=1e-2, atol=1e-2)
        np.testing.assert_allclose(np.asarray(p2, np.float32), p_np,
                                   rtol=1e-2, atol=1e-2)

    def test_model_decode_uses_same_math(self):
        """forward() decode with hd=128 (kernel-eligible shapes) matches the
        full-context forward on CPU interpret mode."""
        from quantizers_tpu.models import ModelSpec, forward, init_params, KVCache

        spec = ModelSpec.tiny(num_heads=2, num_kv_heads=1, head_dim=128,
                              hidden_size=256, intermediate_size=128)
        params = init_params(spec, jax.random.PRNGKey(0))
        ids = jnp.array([[1, 5, 9, 2]], dtype=jnp.int32)
        full, _ = forward(params, spec, ids)
        caches = KVCache.init(spec, 1, 8)
        _, caches = forward(params, spec, ids[:, :3], caches=caches)
        step, _ = forward(params, spec, ids[:, 3:4], caches=caches)
        np.testing.assert_allclose(
            np.asarray(step[:, 0], np.float32), np.asarray(full[:, 3], np.float32),
            rtol=3e-2, atol=3e-2)


class TestFlashAttention:
    """Blockwise prefill attention vs the einsum oracle (interpret mode)."""

    def _oracle(self, q, k, v, sm):
        B, H, T, d = q.shape
        KV = k.shape[1]
        rep = H // KV
        kr = np.repeat(k, rep, axis=1)
        vr = np.repeat(v, rep, axis=1)
        s = np.einsum("bhtd,bhsd->bhts", q, kr) * sm
        mask = np.tril(np.ones((T, T), bool))
        s = np.where(mask, s, -1e30)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        return np.einsum("bhts,bhsd->bhtd", p, vr)

    @pytest.mark.parametrize("rep", [1, 2])
    def test_matches_einsum(self, rep):
        from quantizers_tpu.ops.flash import flash_attention

        rng = np.random.default_rng(7)
        B, KV, T, d = 2, 2, 64, 128
        H = KV * rep
        q = jnp.asarray(rng.standard_normal((B, H, T, d)) * 0.3, jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, KV, T, d)) * 0.3, jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, KV, T, d)) * 0.3, jnp.bfloat16)
        sm = 1.0 / np.sqrt(d)
        out = flash_attention(q, k, v, sm, block_q=16, block_k=16,
                              interpret=True)
        ref = self._oracle(np.asarray(q, np.float32), np.asarray(k, np.float32),
                           np.asarray(v, np.float32), sm)
        np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                                   rtol=4e-2, atol=4e-2)

    def test_unsupported_shapes_raise(self):
        from quantizers_tpu.ops.flash import flash_attention
        from quantizers_tpu.ops.kernels import KernelUnsupported

        q = jnp.zeros((1, 2, 6, 128), jnp.bfloat16)
        kv = jnp.zeros((1, 2, 6, 128), jnp.bfloat16)
        with pytest.raises(KernelUnsupported):
            flash_attention(q, kv, kv, 1.0, interpret=True)  # 6 % 8
        q = jnp.zeros((1, 2, 8, 64), jnp.bfloat16)
        kv = jnp.zeros((1, 2, 8, 64), jnp.bfloat16)
        with pytest.raises(KernelUnsupported):
            flash_attention(q, kv, kv, 1.0, interpret=True)  # 64 % 128

    def test_mla_forward_flash_path_matches(self):
        """MLA no-cache forward on flash-eligible shapes (padded 128-lane
        qk head, dv=128, 8|T) must match the einsum fallback."""
        from quantizers_tpu.models import ModelSpec, forward, init_params

        spec = ModelSpec.tiny(
            mla=True, hidden_size=128, q_lora_rank=32, kv_lora_rank=64,
            qk_nope_head_dim=64, qk_rope_head_dim=32, v_head_dim=128,
            num_heads=2, num_kv_heads=2)
        params = init_params(spec, jax.random.PRNGKey(5))
        ids = jnp.asarray((np.arange(16)[None, :] * 13 + 1) % spec.vocab_size,
                          jnp.int32)
        full, _ = forward(params, spec, ids)          # T=16 -> flash
        odd, _ = forward(params, spec, ids[:, :15])   # T=15 -> einsum
        np.testing.assert_allclose(
            np.asarray(full[:, :15], np.float32), np.asarray(odd, np.float32),
            rtol=3e-2, atol=3e-2)

    def test_model_forward_flash_path_matches(self):
        """A no-cache forward on flash-eligible shapes (hd=128, 8|T) must
        match a flash-ineligible equivalent run (einsum fallback at odd
        T), i.e. the flash wiring changes nothing numerically."""
        from quantizers_tpu.models import ModelSpec, forward, init_params

        spec = ModelSpec.tiny(num_heads=2, num_kv_heads=1, head_dim=128,
                              hidden_size=256, intermediate_size=128)
        params = init_params(spec, jax.random.PRNGKey(4))
        ids = jnp.asarray((np.arange(16)[None, :] * 11 + 2) % spec.vocab_size,
                          jnp.int32)
        full, _ = forward(params, spec, ids)          # T=16 -> flash
        odd, _ = forward(params, spec, ids[:, :15])   # T=15 -> einsum
        np.testing.assert_allclose(
            np.asarray(full[:, :15], np.float32), np.asarray(odd, np.float32),
            rtol=3e-2, atol=3e-2)


class TestMoESlotFFN:
    """Fused slot-FFN kernel vs the XLA gathered reference."""

    def _experts(self, kind, E, k_in, n_out, seed):
        from quantizers_tpu.models.moe import ExpertLinears
        from quantizers_tpu.core.scheme import PRESET_SCHEMES
        from quantizers_tpu.core import quantize as _q

        args = (PRESET_SCHEMES["NVFP4"] if kind == "nvfp4"
                else PRESET_SCHEMES["W4A16_G32"]).weights
        rng = np.random.default_rng(seed)
        lins = []
        for e in range(E):
            w = jnp.asarray(rng.standard_normal((n_out, k_in)), jnp.float32) * 0.2
            lins.append(from_quantized(_q(w, args), args))
        return ExpertLinears.stack(lins)

    @pytest.mark.parametrize("kind", ["w4", "nvfp4"])
    def test_matches_xla_gather(self, kind):
        from quantizers_tpu.ops.kernels import moe_slot_ffn
        from quantizers_tpu.models.moe import _slot_dequant

        E, D, Fe, S = 4, 256, 128, 8
        gate = self._experts(kind, E, D, Fe, 1)
        up = self._experts(kind, E, D, Fe, 2)
        down = self._experts(kind, E, Fe, D, 3)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((S, D)), jnp.bfloat16)
        idx = jnp.asarray(rng.integers(0, E, S), jnp.int32)

        y = moe_slot_ffn(x, idx, gate, up, down, interpret=True)

        gw = _slot_dequant(gate, idx)
        uw = _slot_dequant(up, idx)
        dw = _slot_dequant(down, idx)
        g = jnp.einsum("sd,sdf->sf", x, gw, preferred_element_type=jnp.float32)
        u = jnp.einsum("sd,sdf->sf", x, uw, preferred_element_type=jnp.float32)
        a = (jax.nn.silu(g) * u).astype(jnp.bfloat16)
        ref = jnp.einsum("sf,sfd->sd", a, dw, preferred_element_type=jnp.float32)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=5e-2, atol=5e-2)

    @pytest.mark.parametrize("kind", ["w4", "nvfp4"])
    def test_converted_device_layout_matches(self, kind):
        """The int4/float4 serving layouts (the TPU fast path) must agree
        with the packed-u8 kernel and the XLA gather reference."""
        import dataclasses as dc

        from quantizers_tpu.models.moe import ExpertLinears, _slot_dequant
        from quantizers_tpu.ops.kernels import moe_slot_ffn
        from quantizers_tpu.ops.linear import nvfp4_packed_to_i8

        E, D, Fe, S = 4, 256, 128, 8
        els = [self._experts(kind, E, D, Fe, 11), self._experts(kind, E, D, Fe, 12),
               self._experts(kind, E, Fe, D, 13)]

        def conv(el: ExpertLinears) -> ExpertLinears:
            if kind == "w4":
                lo = (el.weight.astype(jnp.int32) & 0x0F) - 8
                hi = (el.weight.astype(jnp.int32) >> 4) - 8
                w = jnp.concatenate([lo, hi], axis=-2).astype(jnp.int4)
                return dc.replace(el, weight=w)
            w = nvfp4_packed_to_i8(el.weight)
            s = (el.scale.astype(jnp.float32) * 0.5).astype(el.scale.dtype)
            return dc.replace(el, weight=w, scale=s)

        gate, up, down = els
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.standard_normal((S, D)), jnp.bfloat16)
        idx = jnp.asarray(rng.integers(0, E, S), jnp.int32)

        y_u8 = moe_slot_ffn(x, idx, gate, up, down, interpret=True)
        y_cv = moe_slot_ffn(x, idx, conv(gate), conv(up), conv(down),
                            interpret=True)
        np.testing.assert_allclose(np.asarray(y_cv), np.asarray(y_u8),
                                   rtol=3e-2, atol=3e-2)
        # gather fallback understands the converted layout too
        gw1 = np.asarray(_slot_dequant(gate, idx))
        gw2 = np.asarray(_slot_dequant(conv(gate), idx))
        np.testing.assert_allclose(gw1, gw2, rtol=1e-2, atol=1e-2)


class TestNvfp4CapacityPlan:
    """Capacity-aware nvfp4 layout decision (round-2 verdict weak #3): the
    int8-doubled layout is taken only when it fits per-chip HBM, expert
    stacks divide by their EP shard count, and the real Qwen3-30B-A3B
    geometry gets a concrete serving plan."""

    def _nv_stack(self, e=4, k=64, n=32):
        from quantizers_tpu.models.moe import ExpertLinears

        codes = jnp.zeros((e, k // 2, n), jnp.uint8)
        scale = jnp.full((e, k // 16, n), 0.01, jnp.bfloat16)
        return ExpertLinears(kind="nvfp4", weight=codes, scale=scale,
                             meta=(("k", k), ("n", n), ("group_size", 16)))

    def test_plan_decision_flips_with_budget(self):
        from quantizers_tpu.ops.linear import nvfp4_capacity_plan

        tree = {"experts": self._nv_stack()}
        # payload 4*32*32=4096 B packed (+256B scale *2B =512); int8 adds 4096
        roomy = nvfp4_capacity_plan(tree, hbm_bytes=1_000_000)
        tight = nvfp4_capacity_plan(tree, hbm_bytes=int(
            (roomy["int8_bytes"] - 1) / 0.75))
        assert roomy["int8_ok"] is True
        assert tight["int8_ok"] is False
        assert roomy["int8_bytes"] == roomy["packed_bytes"] + 4096

    def test_expert_shards_divide_payload(self):
        from quantizers_tpu.ops.linear import nvfp4_capacity_plan

        tree = {"experts": self._nv_stack()}
        p1 = nvfp4_capacity_plan(tree, hbm_bytes=10**9, expert_shards=1)
        p4 = nvfp4_capacity_plan(tree, hbm_bytes=10**9, expert_shards=4)
        assert p4["int8_bytes"] * 4 == p1["int8_bytes"]

    def test_layout_respects_pinned_decision(self):
        """i4_device_layout(nvfp4_int8=False) keeps packed u8 even on a
        path where conversion would happen (forced via monkeypatched
        _on_tpu)."""
        from quantizers_tpu.ops import dispatch
        from quantizers_tpu.ops import linear as linmod

        stack = self._nv_stack()
        orig = dispatch._on_tpu
        dispatch._on_tpu = lambda: True
        try:
            kept = linmod.i4_device_layout({"e": stack}, nvfp4_int8=False)
            conv = linmod.i4_device_layout({"e": stack}, nvfp4_int8=True)
        finally:
            dispatch._on_tpu = orig
        assert kept["e"].weight.dtype == jnp.uint8
        assert conv["e"].weight.dtype == jnp.int8
        assert conv["e"].weight.shape[1] == 2 * stack.weight.shape[1]

    def test_qwen3_30b_a3b_serving_plan(self):
        """The BASELINE coverage config's concrete v5e serving plan, from
        pure shape math: single chip cannot hold the model AT ALL (even
        packed u8 exceeds 16 GB), tp=2 serves packed, tp=4 unlocks the
        fast int8 layout."""
        from quantizers_tpu.models import ModelSpec
        from quantizers_tpu.models.loader import abstract_quantized_tree
        from quantizers_tpu.ops.linear import nvfp4_capacity_plan

        spec = ModelSpec(
            vocab_size=151936, hidden_size=2048, num_layers=48, num_heads=32,
            num_kv_heads=4, head_dim=128, intermediate_size=6144,
            qk_norm=True, tie_word_embeddings=True,
            num_experts=128, num_experts_per_tok=8, moe_intermediate_size=768,
            norm_topk_prob=True, model_type="qwen3_moe",
        )
        tree = abstract_quantized_tree(spec, scale_dtype=jnp.float8_e4m3fn)
        v5e = 16_000_000_000
        plans = {s: nvfp4_capacity_plan(tree, hbm_bytes=v5e, expert_shards=s)
                 for s in (1, 2, 4)}
        assert plans[1]["packed_bytes"] > v5e          # 1 chip: no fit at all
        assert not plans[1]["int8_ok"]
        assert plans[2]["packed_bytes"] <= plans[2]["budget_bytes"]  # tp=2 packed
        assert not plans[2]["int8_ok"]
        assert plans[4]["int8_ok"]                     # tp=4: fast layout fits

    def test_infer_expert_shards_from_sharding(self):
        """infer_expert_shards reads the EP axis size off a NamedSharding."""
        from quantizers_tpu.ops.linear import infer_expert_shards
        from quantizers_tpu.parallel import make_mesh, shard_params
        from quantizers_tpu.models import ModelSpec, init_params

        spec = ModelSpec.tiny(moe=True)  # 4 experts -> tp must divide 4
        params = init_params(spec, jax.random.PRNGKey(0))
        assert infer_expert_shards(params) == 1
        mesh = make_mesh({"dp": 2, "tp": 4})
        sharded = shard_params(spec, params, mesh)
        assert infer_expert_shards(sharded) == 4


class TestFp8ServingLayout:
    """fp8 serves as an explicitly-hoisted bf16-dense copy on TPU (no
    viable fused fp8 kernel on v5e); conversion must be exact and
    capacity-gated like the nvfp4 int8 layout."""

    def _fp8_lin(self, k=256, n=256):
        from quantizers_tpu.core import PRESET_SCHEMES

        args = PRESET_SCHEMES["FP8_BLOCK"].weights
        w = rand((n, k), seed=71)
        return from_quantized(quantize(w, args), args)

    def test_converts_to_dense_and_preserves_numerics(self):
        from quantizers_tpu.ops import dispatch
        from quantizers_tpu.ops import linear as linmod

        lin = self._fp8_lin()
        ref = np.asarray(lin.dequantize(jnp.bfloat16), np.float32)
        orig = dispatch._on_tpu
        dispatch._on_tpu = lambda: True
        try:
            out = linmod.i4_device_layout({"l": lin}, nvfp4_int8=True)["l"]
            kept = linmod.i4_device_layout({"l": lin}, nvfp4_int8=False)["l"]
        finally:
            dispatch._on_tpu = orig
        assert out.kind == "dense" and out.weight.dtype == jnp.bfloat16
        np.testing.assert_array_equal(np.asarray(out.weight, np.float32), ref)
        assert kept.kind == "fp8"  # over-capacity: fp8 stays at rest

    def test_fp8_dense_pin_overrides_capacity(self):
        """fp8_dense pins the fp8 layout independently of the capacity
        decision — the session's QTPU_FP8_LAYOUT=resident override and
        what bench_fp8's fallback row measures (round-5 review: on real
        TPUs the default layout pre-hoists, so the fallback needs the
        pinned-resident layout, not a post-hoc gate)."""
        from quantizers_tpu.ops import dispatch
        from quantizers_tpu.ops import linear as linmod

        lin = self._fp8_lin()
        orig = dispatch._on_tpu
        dispatch._on_tpu = lambda: True
        try:
            pinned = linmod.i4_device_layout(
                {"l": lin}, nvfp4_int8=True, fp8_dense=False)["l"]
            forced = linmod.i4_device_layout(
                {"l": lin}, nvfp4_int8=False, fp8_dense=True)["l"]
        finally:
            dispatch._on_tpu = orig
        assert pinned.kind == "fp8"    # resident despite capacity OK
        assert forced.kind == "dense"  # dense despite capacity NO

    def test_capacity_plan_prices_fp8_doubling(self):
        from quantizers_tpu.ops.linear import nvfp4_capacity_plan

        lin = self._fp8_lin()
        plan = nvfp4_capacity_plan({"l": lin}, hbm_bytes=10**9)
        w_bytes = lin.weight.size  # 1 byte/weight at rest
        assert plan["int8_bytes"] == plan["packed_bytes"] + w_bytes


class TestW8A8TokenPath:
    """W8A8: dynamic per-token int8 activations on the int8 MXU path
    (ops/dispatch.py:w8a8_token_matmul). The integer dot is exact, so the
    path must match a float emulation of the same quantization to f32
    rounding, be platform-independent, and only engage when the scheme's
    input_activations say so."""

    def _w8a8_lin(self, k=128, n=96, seed=20):
        scheme = PRESET_SCHEMES["W8A8"]
        w = rand((n, k), seed=seed)
        qt = quantize(w, scheme.weights)
        return from_quantized(qt, scheme.weights,
                              act_args=scheme.input_activations)

    def test_act_meta_recorded(self):
        lin = self._w8a8_lin()
        assert lin.meta_dict.get("act") == "token_i8"
        # weight-only W8A16 must NOT carry it
        args = PRESET_SCHEMES["W8A16"].weights
        w = rand((96, 128), seed=21)
        lin16 = from_quantized(quantize(w, args), args)
        assert "act" not in lin16.meta_dict

    def test_matches_float_emulation(self):
        from quantizers_tpu.core.numerics import dynamic_quantize_token_int8
        from quantizers_tpu.ops.dispatch import w8a8_token_matmul

        lin = self._w8a8_lin()
        x = rand((4, 7, 128), seed=22, scale=3.0)
        y = np.asarray(w8a8_token_matmul(x, lin), np.float32)
        xq, sx = dynamic_quantize_token_int8(x.astype(jnp.float32))
        ref = (np.asarray(xq, np.float32) @ np.asarray(lin.weight, np.float32)
               ) * np.asarray(sx) * np.asarray(
                   lin.scale, np.float32).reshape(-1)
        assert y.shape == (4, 7, 96)
        np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-4)

    def test_dispatch_routes_by_act_meta(self):
        """apply() uses the int8 path iff act meta is present;
        use_kernel=False forces the A16 dequant oracle."""
        from quantizers_tpu.ops.dispatch import w8a8_token_matmul

        lin = self._w8a8_lin(seed=23)
        x = rand((8, 128), seed=24, scale=2.0)
        routed = np.asarray(lin.apply(x))
        direct = np.asarray(w8a8_token_matmul(x, lin))
        np.testing.assert_array_equal(routed, direct)
        # A16 oracle: same weights, unquantized activations — close but
        # NOT identical (activation quantization is a real numeric change)
        a16 = np.asarray(lin.apply(x, use_kernel=False))
        assert not np.array_equal(routed, a16)
        np.testing.assert_allclose(routed, a16, rtol=0.15, atol=0.3)

    def test_group_scales_fall_back_to_dequant(self):
        """int8 accumulation across K is only exact with per-channel
        scales; group-wise w8 must keep the dequant path."""
        args = QuantizationArgs(num_bits=8, type=QuantType.INT,
                                strategy=QuantStrategy.GROUP, group_size=32)
        w = rand((96, 128), seed=25)
        lin = from_quantized(quantize(w, args), args)
        object.__setattr__(lin, "meta", lin.meta + (("act", "token_i8"),))
        x = rand((4, 128), seed=26)
        y = np.asarray(lin.apply(x))
        ref = np.asarray(xla_quant_matmul(x, lin))
        np.testing.assert_array_equal(y, ref)

    def test_oneshot_w8a8_records_act_meta(self):
        """RTN oneshot with the W8A8 recipe produces serving linears that
        carry the act meta (end-to-end plumbing through build_site_result)."""
        from pathlib import Path

        from quantizers_tpu.models import ModelSpec, init_params
        from quantizers_tpu.oneshot import make_batches, oneshot
        from quantizers_tpu.recipes import parse_recipe

        recipe = parse_recipe(Path(__file__).resolve().parents[1]
                              / "configs/recipes/recipe_w8a8_int8.yaml")
        spec = ModelSpec.tiny()
        params = init_params(spec, jax.random.PRNGKey(0))
        batches = make_batches([[1, 2, 3, 4, 5, 6, 7, 8]],
                               max_seq_length=8, batch_size=1)
        result = oneshot(spec, params, recipe, batches)
        lin = result.params["layers"][0]["q_proj"]
        assert lin.kind == "w8"
        assert lin.meta_dict.get("act") == "token_i8"
        lin_mlp = result.params["layers"][0]["mlp"]["down_proj"]
        assert lin_mlp.meta_dict.get("act") == "token_i8"


class TestMoEW8pcFusedLayout:
    """int8-per-channel fused expert serving layout (round-4): requant
    onto a 4-16x finer grid, gate|up fused into one payload, per-channel
    scales folded into the slot kernel's matmul outputs
    (ops.linear.moe_w8pc_layout + ops.kernels.moe_slot_gu_ffn)."""

    def _moe(self, E=4, D=256, Fe=128, g=16, seed=0):
        from quantizers_tpu.core import quantize as _q
        from quantizers_tpu.core.scheme import PRESET_SCHEMES
        from quantizers_tpu.models.moe import ExpertLinears

        args = PRESET_SCHEMES["NVFP4"].weights
        rng = np.random.default_rng(seed)

        def stack(k_in, n_out, s):
            lins = []
            for e in range(E):
                w = jnp.asarray(rng.standard_normal((n_out, k_in)),
                                jnp.float32) * 0.2
                lins.append(from_quantized(_q(w, args), args))
            return ExpertLinears.stack(lins)

        return {
            "router": dense_linear(rand((E, D), seed=seed + 9) * 0.1),
            "gate_proj": stack(D, Fe, 1),
            "up_proj": stack(D, Fe, 2),
            "down_proj": stack(Fe, D, 3),
        }

    def test_layout_shapes_and_requant_error_bound(self):
        from quantizers_tpu.ops.linear import moe_w8pc_layout

        moe = self._moe()
        fused = moe_w8pc_layout(moe)
        assert "gate_up_proj" in fused and "gate_proj" not in fused
        gu = fused["gate_up_proj"]
        assert gu.kind == "w8" and gu.weight.dtype == jnp.int8
        assert dict(gu.meta)["n"] == 256 and dict(gu.meta)["group_size"] is None
        assert gu.scale.shape == (4, 1, 256)
        # requant error is bounded by half an int8 step per element
        exact = moe["gate_proj"].expert(0).dequantize(jnp.float32)
        requant = gu.expert(0).dequantize(jnp.float32)[:, :128]
        step = np.abs(np.asarray(exact)).max(axis=0) / 127.0
        err = np.abs(np.asarray(requant - exact))
        assert (err <= step[None, :] * 0.51 + 1e-7).all()

    def test_requant_exact_when_representable(self):
        """Weights already on an int8-per-channel grid round-trip exactly."""
        from quantizers_tpu.models.moe import ExpertLinears
        from quantizers_tpu.ops.linear import experts_to_w8pc

        E, k, n = 2, 32, 16
        rng = np.random.default_rng(1)
        w8 = rng.integers(-127, 128, (E, k, n)).astype(np.int8)
        w8[:, 0, :] = 127  # pin each column's absmax so the recomputed
        sc = np.full((E, 1, n), 0.013, np.float32)  # scale reproduces
        el = ExpertLinears(kind="w8", weight=jnp.asarray(w8),
                           scale=jnp.asarray(sc),
                           meta=(("k", k), ("n", n), ("group_size", None)))
        out = experts_to_w8pc(el)
        np.testing.assert_allclose(
            np.asarray(out.expert(0).dequantize(jnp.float32)),
            np.asarray(el.expert(0).dequantize(jnp.float32)), rtol=1e-5)

    def test_biased_experts_keep_bias_and_decode_applies_it(self):
        """Expert-FFN biases survive the w8pc requant+fuse, and the decode
        forward applies them — the gathered slot path ignores biases, so
        biased stacks must route through the scan path (code-review r4)."""
        import dataclasses

        from quantizers_tpu.models.moe import moe_forward
        from quantizers_tpu.ops.linear import moe_w8pc_layout

        moe = self._moe()
        rng = np.random.default_rng(5)
        for key in ("gate_proj", "up_proj", "down_proj"):
            el = moe[key]
            n = dict(el.meta)["n"]
            bias = jnp.asarray(rng.normal(size=(4, n)).astype(np.float32))
            moe[key] = dataclasses.replace(el, bias=bias)
        fused = moe_w8pc_layout(moe)
        gu = fused["gate_up_proj"]
        assert gu.bias is not None and gu.bias.shape == (4, 256)
        assert fused["down_proj"].bias is not None

        class _Spec:
            num_experts = 4
            num_experts_per_tok = 2
            norm_topk_prob = True
            scoring_func = "softmax"
            routed_scaling_factor = 1.0

        x = jnp.asarray(rng.normal(size=(1, 2, 256)).astype(np.float32) * 0.1)
        y = moe_forward(fused, _Spec(), x)  # decode regime (tiny N, no capture)
        # reference: biased un-fused stack through the all-expert scan path
        y_ref = moe_forward(moe, _Spec(), x, all_experts=True)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=0.12, atol=0.12)
        # and the bias actually matters (drop it -> different output)
        y_nobias = moe_forward(
            {**fused,
             "gate_up_proj": dataclasses.replace(gu, bias=None),
             "down_proj": dataclasses.replace(fused["down_proj"], bias=None)},
            _Spec(), x)
        assert np.abs(np.asarray(y) - np.asarray(y_nobias)).max() > 0.01

    def test_fused_kernel_matches_xla_exact(self):
        from quantizers_tpu.models.moe import _slot_dequant
        from quantizers_tpu.ops.kernels import moe_slot_gu_ffn
        from quantizers_tpu.ops.linear import moe_w8pc_layout

        fused = moe_w8pc_layout(self._moe())
        rng = np.random.default_rng(4)
        S, D, Fe = 8, 256, 128
        x = jnp.asarray(rng.standard_normal((S, D)), jnp.bfloat16)
        idx = jnp.asarray(rng.integers(0, 4, S), jnp.int32)

        y = moe_slot_gu_ffn(x, idx, fused["gate_up_proj"],
                            fused["down_proj"], interpret=True)
        guw = _slot_dequant(fused["gate_up_proj"], idx)
        guv = jnp.einsum("sd,sdf->sf", x, guw,
                         preferred_element_type=jnp.float32)
        a = (jax.nn.silu(guv[:, :Fe]) * guv[:, Fe:]).astype(jnp.bfloat16)
        dw = _slot_dequant(fused["down_proj"], idx)
        ref = jnp.einsum("sf,sfd->sd", a, dw,
                         preferred_element_type=jnp.float32)
        # kernel computes in bf16; outputs are O(30) here, so scale atol
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=5e-2, atol=0.5)

    def test_moe_forward_fused_paths_match_unfused(self):
        from quantizers_tpu.models.config import ModelSpec
        from quantizers_tpu.models.moe import moe_forward
        from quantizers_tpu.ops.linear import moe_w8pc_layout

        moe = self._moe()
        fused = moe_w8pc_layout(moe)
        spec = ModelSpec.tiny(moe=True, num_experts=4, num_experts_per_tok=2,
                              hidden_size=256, moe_intermediate_size=128)
        rng = np.random.default_rng(7)
        # gathered decode regime (few tokens)
        x = jnp.asarray(rng.standard_normal((1, 4, 256)), jnp.bfloat16)
        y_f = moe_forward(fused, spec, x)
        y_u = moe_forward(moe, spec, x)
        np.testing.assert_allclose(np.asarray(y_f, np.float32),
                                   np.asarray(y_u, np.float32),
                                   rtol=6e-2, atol=0.5)
        # all-expert scan regime (calibration/prefill semantics)
        xb = jnp.asarray(rng.standard_normal((1, 40, 256)), jnp.bfloat16)
        y_f = moe_forward(fused, spec, xb, all_experts=True)
        y_u = moe_forward(moe, spec, xb, all_experts=True)
        # requant (int8-pc over nvfp4) + bf16 accumulation: compare on a
        # normalized scale, not elementwise-relative near zeros
        diff = np.abs(np.asarray(y_f, np.float32) - np.asarray(y_u, np.float32))
        assert diff.max() / (np.abs(np.asarray(y_u, np.float32)).max() + 1e-9) < 0.05

    def test_forced_nf2_matches_nf1(self, monkeypatch):
        """The NF>1 per-row accumulation path of the unfused slot kernel
        (exercised at production geometry only) vs the nf=1 result —
        forced via the debug-only QTPU_MOE_NF override (ADVICE r3 #3)."""
        import dataclasses as dc

        from quantizers_tpu.core import quantize as _q
        from quantizers_tpu.core.scheme import PRESET_SCHEMES
        from quantizers_tpu.models.moe import ExpertLinears
        from quantizers_tpu.ops.kernels import moe_slot_ffn
        from quantizers_tpu.ops.linear import nvfp4_packed_to_i8

        args = PRESET_SCHEMES["NVFP4"].weights
        rng = np.random.default_rng(11)
        E, D, Fe, S = 4, 256, 256, 8

        def stack(k_in, n_out):
            lins = []
            for _ in range(E):
                w = jnp.asarray(rng.standard_normal((n_out, k_in)),
                                jnp.float32) * 0.2
                lins.append(from_quantized(_q(w, args), args))
            el = ExpertLinears.stack(lins)
            # int8 device layout (u8-packed payloads cannot be Fe-sliced)
            return dc.replace(
                el, weight=nvfp4_packed_to_i8(el.weight),
                scale=(el.scale.astype(jnp.float32) * 0.5).astype(el.scale.dtype))

        gate, up, down = stack(D, Fe), stack(D, Fe), stack(Fe, D)
        x = jnp.asarray(rng.standard_normal((S, D)), jnp.bfloat16)
        idx = jnp.asarray(rng.integers(0, E, S), jnp.int32)

        y1 = moe_slot_ffn(x, idx, gate, up, down, interpret=True)
        monkeypatch.setenv("QTPU_MOE_NF", "2")
        y2 = moe_slot_ffn(x, idx, gate, up, down, interpret=True)
        np.testing.assert_allclose(np.asarray(y2), np.asarray(y1),
                                   rtol=2e-2, atol=2e-2)
        # garbage / budget-violating overrides are ignored, not fatal
        monkeypatch.setenv("QTPU_MOE_NF", "notanint")
        y3 = moe_slot_ffn(x, idx, gate, up, down, interpret=True)
        np.testing.assert_allclose(np.asarray(y3), np.asarray(y1),
                                   rtol=2e-2, atol=2e-2)
