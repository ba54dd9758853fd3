"""Scalar/vectorized function library (the engine's `pyspark.sql.functions` analog)."""
