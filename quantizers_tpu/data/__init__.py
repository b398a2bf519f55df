"""Calibration data layer: formatters + calibration-set engine."""

from .calibration_sets import (  # noqa: F401
    STREAMING_DEFAULT_SAMPLE_LIMIT,
    CalibrationSet,
    CalibrationSetConfig,
    DatasetEntryConfig,
)
from .formatters import DatasetFmt, available_formatters, formatter, get_formatter  # noqa: F401
