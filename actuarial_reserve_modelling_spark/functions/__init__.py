"""Scalar/table function surface: the Monte Carlo kernel and UDF helpers."""
