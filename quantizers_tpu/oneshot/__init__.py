"""Oneshot calibration & compression engine.

TPU-native replacement for ``llmcompressor.oneshot`` and its modifier zoo
(reference call site ``scripts/do_oneshot.py:177-187``): a layer-sequential
calibration driver over the functional transformer, with modifiers as pure
weight/activation transforms — RTN (`QuantizationModifier`), AWQ, GPTQ and
AutoRound — plus the data-free ``model_free_ptq`` path
(``scripts/quant_GLM-4.7-Flash-FP8.py``).
"""

from .engine import (  # noqa: F401
    OneshotResult,
    make_batches,
    oneshot,
    streaming_peak_bytes,
)
from .model_free import model_free_ptq  # noqa: F401
