"""Similarity search over embedding columns (array<float>).

Reference: brute-force cosine semantic search
(``indexmanager/semantic.go:240-377``), vector math
(``pkg/embedding/vector.go:16-100``).

Two paths:
- brute-force top-k: F.aggregate/zip_with dot products — pure Catalyst,
  correct baseline; O(N·d) per query, fine when the query set is small
  or the corpus is pre-filtered (hybrid search).
- LSH (random hyperplane) bucketed ANN: deterministic hash-derived
  hyperplanes (no stored model), bucket equi-join, exact rerank inside
  buckets — the 100 TB path; probes = Hamming-adjacent buckets.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_sim_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: int | None = None,
) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector.

    The query vector is folded into the plan as a literal array (no
    join); deterministic tie-break by id."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    out = embeddings.select(
        F.col(id_col).alias("vec_id"),
        cosine_sim_expr(F.col(vec_col), q).alias("cosine"),
    )
    if exclude_self is not None:
        out = out.filter(F.col("vec_id") != exclude_self)
    return out.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random unit hyperplane: sin-hash sequence
    (reproducible everywhere, no RNG state)."""
    vals = [math.sin(0.7548776662 * (plane_idx * dim + j) + 0.1) for j in range(dim)]
    n = math.sqrt(sum(v * v for v in vals))
    return [v / n for v in vals]


def hyperplane_signature(vec: Column, n_planes: int = 16, dim: int = 64) -> Column:
    """Bit signature of sign(v·h_i) over n deterministic hyperplanes.

    dim = number of leading vector components used (truncation keeps the
    literal plan small; cosine-preserving enough for bucketing, exact
    rerank fixes the rest)."""
    sig = F.lit(0).cast("long")
    for i in range(n_planes):
        h = _hyperplane(dim, i)
        d = F.aggregate(
            F.zip_with(
                F.slice(vec, 1, dim),
                F.array(*[F.lit(v) for v in h]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig.bitwiseOR(F.shiftleft(F.when(d >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long"), i))
    return sig


def ann_topk_lsh(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: restrict exact rerank to vectors whose hyperplane bucket
    is within Hamming distance 1 of the query's bucket (n_planes+1
    buckets probed), then brute-force cosine inside.

    Recall < 1 by construction; the candidate count drops ~2^n_planes-fold.
    """
    dim = min(64, len(query_vec))
    sigs = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        hyperplane_signature(F.col(vec_col), n_planes, dim).alias("bucket"),
    )
    # query bucket computed driver-side with the same deterministic planes
    qsig = 0
    for i in range(n_planes):
        h = _hyperplane(dim, i)
        d = sum(float(query_vec[j]) * h[j] for j in range(dim))
        if d >= 0:
            qsig |= 1 << i
    probes = [qsig] + [qsig ^ (1 << i) for i in range(n_planes)]
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        sigs.filter(F.col("bucket").isin(probes))
        .select("vec_id", cosine_sim_expr(F.col("v"), q).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )
