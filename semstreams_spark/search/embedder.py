"""Deterministic hashed text embedder + content-hash embedding dedup.

Reference: the BM25-hashed embedder produces fixed-dim vectors by hashing
terms into dimensions with TF weighting and L2-normalizing
(``pkg/embedding/bm25_embedder.go:46-64,83-293``, 384-dim default), and
the embedding pipeline dedups embedder calls by content hash
(``docs/architecture/GRAPHRAG_LESSONS_LEARNED.md:514``, G8).

Spark shape: tokens → portable hash % dim → per-bucket counts folded into
a dense array — one explode + one groupBy, all Catalyst; no model state,
bit-reproducible anywhere (DuckDB mirror in oracles.sql_entity_semantic_topk,
driver-side mirror in embed_text_py for query vectors).
"""

from __future__ import annotations

import hashlib
import math
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.textops import portable_hash, tokens

DEFAULT_DIM = 384  # reference default (bm25_embedder.go:61-62)


def embed_texts(df: DataFrame, id_col: str, text_col: str = "text", dim: int = DEFAULT_DIM) -> DataFrame:
    """(id, embedding array<double>[dim]): hashed-TF embedding, L2-normalized.

    vec[i] = |{tokens t : H(t) mod dim == i}| (with multiplicity), then
    vec / ||vec||. Empty-token texts embed to the zero vector (norm guard).

    r6: ONE Arrow ``mapInPandas`` pass — per batch each row is tokenized,
    md5-bucketed and normalized exactly like :func:`embed_text_py` (the
    proven driver-side mirror: same token regex, same md5-hex-prefix hash,
    same index-order norm fold), so values are bit-identical to the
    expression form, which remains below as :func:`embed_texts_expr` with
    a parity test. Why: the expression form cost three shuffles (token
    explode → (id, bucket) agg → map agg) plus a dim-wide interpreted
    transform per row (HOFs bypass codegen, guide §4.2); the kernel is a
    single map pass with no exchange — per doc O(tokens + dim), the same
    asymptotics, and no Python-boundary crossings beyond the one batch.
    """
    import numpy as np
    import pandas as pd

    id_t = dict(df.dtypes)[id_col]

    def gen(it):
        for pdf in it:
            if not len(pdf):
                continue
            ids, out = [], []
            for _id, text in zip(pdf[id_col], pdf[text_col]):
                toks = [t for t in re.split(r"[^a-z0-9_]+", (text or "").lower()) if t]
                if not toks:
                    # the expression form's explode drops token-less docs
                    # entirely — replicate (parity over presence, not
                    # just values)
                    continue
                vec = np.zeros(dim)
                for t in toks:
                    vec[int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % dim] += 1.0
                acc = 0.0
                for x in vec:
                    acc = acc + x * x
                n = math.sqrt(acc)
                ids.append(_id)
                out.append(vec / n if n > 0 else vec)
            yield pd.DataFrame({id_col: ids, "embedding": out})

    return df.select(id_col, text_col).mapInPandas(
        gen, f"{id_col} {id_t}, embedding array<double>"
    )


def embed_texts_expr(df: DataFrame, id_col: str, text_col: str = "text", dim: int = DEFAULT_DIM) -> DataFrame:
    """The pure-Catalyst expression form of :func:`embed_texts` (kept as
    the cross-engine reference implementation + parity-test anchor).

    Densify is O(tokens + dim) per doc: tokens aggregate to (bucket →
    count) map entries (two-level hash agg, map-side combinable), then one
    transform does a map lookup per dimension — not a filter-scan of the
    token list per dimension, which is O(dim × tokens) and 6× the work at
    the reference's 384 dims.
    """
    t = df.select(F.col(id_col).alias("_id"), F.explode(tokens(F.col(text_col))).alias("tok"))
    b = t.select("_id", (portable_hash(F.col("tok")) % dim).cast("int").alias("bucket"))
    cnt = b.groupBy("_id", "bucket").agg(F.count(F.lit(1)).alias("c"))
    g = cnt.groupBy("_id").agg(
        F.map_from_entries(F.collect_list(F.struct("bucket", "c"))).alias("bc")
    )
    # try_element_at: plain element_at on a map THROWS on a missing key
    # under ANSI mode (Spark 4 default)
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.try_element_at(F.col("bc"), i), F.lit(0).cast("long")).cast(
            "double"
        ),
    )
    out = g.withColumn("_vec", vec)
    norm = F.sqrt(F.aggregate(F.col("_vec"), F.lit(0.0), lambda acc, x: acc + x * x))
    emb = F.when(
        norm > 0, F.transform(F.col("_vec"), lambda x: x / norm)
    ).otherwise(F.col("_vec"))
    return out.select(F.col("_id").alias(id_col), emb.alias("embedding"))


def embed_entities_deduped(
    node_texts: DataFrame,
    id_col: str = "entity",
    text_col: str = "text",
    dim: int = DEFAULT_DIM,
) -> DataFrame:
    """(entity, embedding): embeds each DISTINCT content hash once and
    joins back — the reference's content-addressed embedder-call dedup
    (G8). With duplicated texts (alias entities, re-crawls) this cuts
    embedder work to the unique-content count; the join back is on the
    tiny hash dim."""
    h = node_texts.select(id_col, F.md5(F.col(text_col)).alias("chash"), text_col)
    uniq = h.select("chash", text_col).dropDuplicates(["chash"])
    emb = embed_texts(uniq, id_col="chash", text_col=text_col, dim=dim)
    return h.join(emb, "chash").select(id_col, "embedding")


def embed_text_py(text: str, dim: int = DEFAULT_DIM) -> list[float]:
    """Driver-side mirror of embed_texts for a single query string —
    identical hash (md5-hex-prefix) and identical fold order, so cosine
    against the distributed embeddings is engine-exact."""
    toks = [t for t in re.split(r"[^a-z0-9_]+", text.lower()) if t]
    vec = [0.0] * dim
    for t in toks:
        vec[int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % dim] += 1.0
    acc = 0.0
    for x in vec:
        acc = acc + x * x
    n = math.sqrt(acc)
    return [x / n for x in vec] if n > 0 else vec
