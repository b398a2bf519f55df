"""quantizers_tpu — a TPU-native post-training-quantization framework.

A from-scratch JAX / XLA / Pallas rebuild of the capability surface of
``mratsim/quantizers`` (and the llmcompressor + compressed-tensors engines it
delegates to): YAML-driven calibrated quantization (RTN / AWQ / GPTQ /
AutoRound), data-free PTQ, the FP8 / NVFP4 / INT4 scheme zoo,
compressed-tensors-compatible checkpoints, and a sharded TPU serving path
with fused dequant-matmul Pallas kernels.

Quick start::

    from quantizers_tpu import load_quantization_config
    cfg = load_quantization_config("configs/test-quantize_qwen3-4b-awq.yaml")

    from quantizers_tpu.data import CalibrationSet
    calib = CalibrationSet.from_config(cfg.calibration_set_config, cache_dir="./cache")
"""

__version__ = "0.1.0"

from .config import (  # noqa: F401
    ModelConfig,
    QuantizationConfig,
    QuantizationRunConfig,
    load_quantization_config,
    load_yaml,
)
from .data.formatters import DatasetFmt  # noqa: F401

__all__ = [
    "__version__",
    "ModelConfig",
    "QuantizationConfig",
    "QuantizationRunConfig",
    "load_quantization_config",
    "load_yaml",
    "DatasetFmt",
]
