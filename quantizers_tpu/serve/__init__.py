"""Serving layer: quantized prefill/decode over (optionally) a device mesh.

The reference only sanity-generates after quantization
(``quantization_multiple_modifiers.py:112-118``); the serving engine is the
north-star extension — it consumes compressed-tensors checkpoints straight
into kernel-ready layouts and decodes with a jit-compiled KV-cache loop.
"""

from .engine import generate, perplexity, prefill  # noqa: F401
from .session import ContinuousBatcher, serving_layout  # noqa: F401
