"""Scalar/vector helper functions built purely from pyspark.sql.functions —
JVM-side, codegen-friendly, no Python UDFs in any hot path."""

from .vectors import cosine, dot, l2_norm  # noqa: F401
