"""Model layer: pure-JAX decoder-only transformers over QuantLinear pytrees.

The reference delegates model execution to HF ``transformers`` + torch
(``scripts/do_oneshot.py:82-96`` loads ``AutoModelForCausalLM``); this layer
is its TPU-native replacement. Models are (spec, params-pytree) pairs with
purely functional forward passes — no module objects — so they compose
directly with jit / pjit / shard_map, and every linear weight is a
:class:`quantizers_tpu.ops.QuantLinear` that dispatches to fused Pallas
dequant-matmul kernels when quantized.
"""

from .config import ModelSpec  # noqa: F401
from .transformer import (  # noqa: F401
    KVCache,
    apply_layer,
    embed,
    forward,
    init_params,
    logits_head,
    quantize_lm_head,
)
from .loader import load_hf_model, load_compressed_model  # noqa: F401
