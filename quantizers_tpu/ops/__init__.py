"""TPU compute layer: quantized linear pytrees, Pallas kernels, dispatch."""

from .linear import (  # noqa: F401
    QuantLinear,
    dense_linear,
    from_quantized,
    i4_device_layout,
    infer_expert_shards,
    nvfp4_capacity_plan,
)
from .dispatch import quant_matmul, xla_quant_matmul  # noqa: F401
