"""Similarity search over embedding columns (array<float>).

Two tiers (SURVEY.md §2B):

* :func:`brute_force_topk` — exact cosine top-k: broadcast the (small) query
  set against the corpus, score with JVM-side HOFs, rank with a window. The
  corpus is never shuffled — the only exchange is the per-query top-k, which
  AQE coalesces. Correct at any corpus size IF the query set is small enough
  to broadcast; cost is O(|corpus| * |queries| * dim).

* :func:`lsh_topk` — random-hyperplane LSH: deterministic hyperplanes,
  per-vector bit signature, candidates = corpus rows sharing the signature
  bucket (optionally within Hamming radius via multi-probe over bands),
  exact re-scoring inside buckets. Sub-linear candidate sets at 100 TB in
  exchange for bounded recall loss (measured in tests against brute force).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..functions.vectors import cosine

# deterministic pseudo-random doubles in [-1, 1) from a fixed LCG: avoids a
# numpy dependency at definition time and guarantees reproducible planes
_LCG_MOD = 2**63


def _plane_coeffs(n_planes: int, dim: int, seed: int) -> list[list[float]]:
    state = (seed * 2862933555777941757 + 3037000493) % _LCG_MOD or 1
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % _LCG_MOD
            row.append(state / _LCG_MOD * 2.0 - 1.0)
        planes.append(row)
    return planes


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self-matches excluded when ids
    collide). Returns (query_id, neighbor_id, rank, score)."""
    q = queries.select(
        F.col(id_col).alias(query_id_col), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .select(
            query_id_col,
            "neighbor_id",
            cosine(F.col("__qv"), F.col("__cv")).alias("__score"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("__score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col,
            "neighbor_id",
            "rank",
            F.round("__score", 4).alias("score"),
        )
    )


def add_lsh_signature(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    n_planes: int = 12,
    dim: int = 64,
    seed: int = 42,
    out_col: str = "lsh_sig",
) -> DataFrame:
    """Random-hyperplane signature: bit i = (v . h_i) > 0, packed into a
    long. Pure column expressions — the plane coefficients are literals, so
    the whole signature runs inside codegen with zero Python involvement."""
    planes = _plane_coeffs(n_planes, dim, seed)
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        coeffs = F.array(*[F.lit(c) for c in plane])
        d = F.aggregate(
            F.zip_with(F.col(vec_col), coeffs, lambda x, c: x.cast("double") * c),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig.bitwiseXOR(
            F.shiftleft(F.when(d > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")), i)
        )
    return df.withColumn(out_col, sig)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 12,
    bands: int = 3,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share at least one of ``bands`` bands of
    the hyperplane signature (banding trades precision for recall exactly as
    in MinHash-LSH), then exact cosine re-scoring within candidates.

    Scale shape: equi-join on (band_idx, band_val) — no cross join anywhere;
    candidate count per query is corpus_fraction ~= bands * 2^-(planes/bands).
    """
    if n_planes % bands:
        raise ValueError("n_planes must be divisible by bands")
    bits_per_band = n_planes // bands

    def banded(df: DataFrame, id_alias: str) -> DataFrame:
        with_sig = add_lsh_signature(
            df.select(F.col(id_col), F.col(vec_col)),
            vec_col=vec_col,
            n_planes=n_planes,
            dim=dim,
            seed=seed,
        )
        mask = (1 << bits_per_band) - 1
        return with_sig.select(
            F.col(id_col).alias(id_alias),
            F.col(vec_col).alias(f"__v_{id_alias}"),
            F.posexplode(
                F.array(
                    *[
                        F.shiftright(F.col("lsh_sig"), b * bits_per_band)
                        .bitwiseAND(F.lit(mask))
                        for b in range(bands)
                    ]
                )
            ).alias("band_idx", "band_val"),
        )

    qb = banded(queries, query_id_col)
    cb = banded(corpus, "neighbor_id")
    cands = (
        qb.join(cb, ["band_idx", "band_val"])
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .select(query_id_col, "neighbor_id", f"__v_{query_id_col}", "__v_neighbor_id")
        .dropDuplicates([query_id_col, "neighbor_id"])
    )
    scored = cands.select(
        query_id_col,
        "neighbor_id",
        cosine(F.col(f"__v_{query_id_col}"), F.col("__v_neighbor_id")).alias(
            "__score"
        ),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("__score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col,
            "neighbor_id",
            "rank",
            F.round("__score", 4).alias("score"),
        )
    )
