#!/usr/bin/env python
"""Calibration-forward (no-cache prefill) throughput: flash vs einsum.

The oneshot capture pass runs no-cache forwards at the calibration window
(4k-8k); the blockwise flash kernel keeps memory linear in T where the
einsum path materializes (B, H, T, T) f32 scores. This bench times one
Qwen3-4B-shaped layer stack forward at T=2048 both ways on hardware.

Prints ONE JSON line with tokens/s for both paths.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, ".")
from bench import build_params  # noqa: E402

from quantizers_tpu.models import ModelSpec, forward  # noqa: E402

B, T = 2, 2048
LAYERS = 8  # depth-scaled; per-layer cost extrapolates


def main():
    from quantizers_tpu.utils import enable_persistent_cache

    enable_persistent_cache()  # tunnel compiles are 1-40 s; cache loads ~0.1 s
    backend = jax.default_backend()
    on_tpu = backend in ("tpu", "axon")
    log(f"backend={backend}")
    if on_tpu:
        spec = ModelSpec(
            vocab_size=151936, hidden_size=2560, num_layers=LAYERS,
            num_heads=32, num_kv_heads=8, head_dim=128,
            intermediate_size=9728, qk_norm=True, tie_word_embeddings=True,
            model_type="qwen3",
        )
        steps = 4
    else:
        spec = ModelSpec.tiny(num_heads=2, num_kv_heads=1, head_dim=128,
                              hidden_size=256, intermediate_size=512)
        steps = 1
    global T
    if not on_tpu:
        T = 64

    params = build_params(spec, jax.random.PRNGKey(0))
    params = jax.block_until_ready(params)
    ids = jnp.asarray((np.arange(B * T).reshape(B, T) * 97 + 1)
                      % spec.vocab_size, jnp.int32)

    import quantizers_tpu.models.transformer as TR

    results = {}
    for tag, use_flash in (("flash", True), ("einsum", False)):
        if not use_flash:
            # force the einsum fallback by shrinking the eligible block
            import quantizers_tpu.ops.flash as FL

            orig_fa = FL.flash_attention

            def reject(*a, **k):
                from quantizers_tpu.ops.kernels import KernelUnsupported

                raise KernelUnsupported("forced einsum for bench")

            FL.flash_attention = reject
        try:
            fwd = jax.jit(lambda p, i: forward(p, spec, i)[0][:, -1])
            t0 = time.time()
            out = np.asarray(fwd(params, ids))
            comp = time.time() - t0
            best = float("inf")
            for s in range(steps):
                t0 = time.time()
                out = np.asarray(fwd(params, (ids + s * 97) % spec.vocab_size))
                best = min(best, time.time() - t0)
            tok_s = B * T / best
            results[tag] = round(tok_s, 1)
            log(f"{tag}: {best*1e3:.0f} ms for {B}x{T} tokens "
                f"({tok_s:.0f} tok/s, compile {comp:.0f}s)")
        except Exception as e:
            log(f"{tag} FAILED: {type(e).__name__}: {str(e)[:200]}")
            results[tag] = None
        finally:
            if not use_flash:
                FL.flash_attention = orig_fa

    print(json.dumps({
        "metric": f"prefill_tokens_per_s_{LAYERS}L_qwen3_w4a16",
        "flash": results.get("flash"),
        "einsum": results.get("einsum"),
        "unit": "tok/s",
    }))


if __name__ == "__main__":
    main()
