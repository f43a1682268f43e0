"""Scalar/statistical kernels shared across algorithms."""

from graph_data_science_spark.functions.scalers import scale_property

__all__ = ["scale_property"]
