"""Vector math over array<float> columns using array HOFs (zip_with +
aggregate) — stays in the JVM and needs no UDF, but NOTE: HOF lambdas
evaluate INTERPRETED, outside whole-stage codegen (measured on minhash:
same work was ~90x faster as explode+projection). That is acceptable here
because these expressions score BOUNDED pair sets (queries x corpus after
broadcast, or LSH/IVF candidates), never a full corpus cross product; when
the pair count itself scales, score through the Arrow/numpy path instead
(see operators/similarity.py ivf_topk's pandas_udf matmul).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array<numeric> columns, accumulated in double,
    sequential left-to-right (deterministic). Length-mismatched vectors
    RAISE at execution: zip_with pads the shorter side with NULLs and the
    silent alternative — a NULL score — reads as "not similar" to every
    downstream threshold, quietly disabling dedup for any row whose
    embedding was truncated or corrupted. NULL ELEMENTS inside
    equal-length vectors still yield NULL (score unknown)."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    products = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    raw = F.aggregate(products, F.lit(0.0), lambda acc, v: acc + v)
    return F.when(
        F.size(a) != F.size(b),
        F.raise_error(
            F.concat(
                F.lit("vectors.dot: length mismatch "),
                F.size(a).cast("string"),
                F.lit(" vs "),
                F.size(b).cast("string"),
            )
        ),
    ).otherwise(raw)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL if either vector has zero norm."""
    num = dot(a, b)
    den = l2_norm(a) * l2_norm(b)
    return F.when(den > 0, num / den)
