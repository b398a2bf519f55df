"""TPU compute layer: quantized linear pytrees, Pallas kernels, dispatch."""

from .linear import QuantLinear, dense_linear, from_quantized  # noqa: F401
from .dispatch import quant_matmul, xla_quant_matmul  # noqa: F401
