"""Adaptive single-task solve for the iterative graph operators.

The distributed PageRank/LPA loops pay per-iteration FIXED costs (job
scheduling, shuffle exchange, state checkpoint) that dwarf the actual
arithmetic whenever the projected entity graph is small — exactly the
regime the round-2 perf ledger measured (per-iteration wall ~0.6 s on a
96k-edge graph whose numpy fixed-point step costs ~1 ms). This module
is the threshold dispatch for that case, the same adaptive-execution
shape Spark itself applies to joins (broadcast under
``autoBroadcastJoinThreshold``, shuffle above):

* under ``local_max_edges`` the edge list ships to ONE executor task
  (``applyInPandas`` over a constant group — never the driver) and the
  whole fixed-point loop runs vectorized in numpy inside that task;
* over the threshold the existing distributed join+agg loop runs
  unchanged — that is the 100 TB path.

Both operators were deliberately designed order-free (BIGINT fixed-point
PageRank; min-label majority LPA), so the two paths are BIT-IDENTICAL —
asserted by parity tests on random graphs (``tests/test_local_solve.py``)
and by the unchanged DuckDB gates, which exercise the local path at
sf0.01. Threshold override: ``SPARK_GRAFT_LOCAL_GRAPH_MAX_EDGES``
(0 disables the local path entirely).

Reference semantics anchors: damped iteration
``pkg/graphclustering/pagerank.go:50-219``; LPA vote loop
``pkg/graphclustering/lpa.go:99-233`` (made deterministic per SURVEY
§4.2.4).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_LOCAL_MAX_EDGES = 2_000_000


def local_max_edges(default: int | None = None) -> int:
    env = os.environ.get("SPARK_GRAFT_LOCAL_GRAPH_MAX_EDGES")
    if env is not None:
        return int(env)
    return DEFAULT_LOCAL_MAX_EDGES if default is None else default


def _index_edges(src: np.ndarray, dst: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Map string endpoints to indices into the SORTED unique-entity
    array — so index order == lexicographic order, and min-index ==
    min-label everywhere below."""
    ents = np.unique(np.concatenate([src, dst]))
    return ents, np.searchsorted(ents, src), np.searchsorted(ents, dst)


# ---------------------------------------------------------------- PageRank


def _pagerank_core(
    src_i: np.ndarray,
    dst_i: np.ndarray,
    n: int,
    max_iter: int,
    scale: int,
    damping_num: int,
    damping_den: int,
) -> np.ndarray:
    """Bit-identical replay of pagerank_exact's BIGINT recurrence:
    contribution = rank div deg (edge MULTIset — duplicates contribute
    per occurrence, matching the DataFrame loop), dangling mass folded
    as dmass div n, all ops non-negative int64 so numpy ``//`` ==
    Spark ``div``."""
    deg = np.bincount(src_i, minlength=n)
    dangling = deg == 0
    # int64-exact scatter-add: pre-sorted destination runs + reduceat
    order = np.argsort(dst_i, kind="stable")
    dst_sorted = dst_i[order]
    starts = np.flatnonzero(np.diff(dst_sorted, prepend=-1) != 0)
    dst_uniq = dst_sorted[starts]

    base = ((damping_den - damping_num) * scale) // (damping_den * n)
    rank = np.full(n, scale // n, dtype=np.int64)
    for _ in range(max_iter):
        inflow = np.zeros(n, dtype=np.int64)
        if len(src_i):
            c = rank[src_i] // deg[src_i]
            inflow[dst_uniq] = np.add.reduceat(c[order], starts)
        dmass = int(rank[dangling].sum())
        rank = base + (damping_num * (dmass // n + inflow)) // damping_den
    return rank


def pagerank_local(
    edges: DataFrame,
    max_iter: int,
    scale: int,
    damping_num: int,
    damping_den: int,
) -> DataFrame:
    """Single-task PageRank: all edges to one executor task, loop in
    numpy. Output schema/values identical to the distributed loop."""

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        src = pdf["src"].to_numpy()
        dst = pdf["dst"].to_numpy()
        ents, src_i, dst_i = _index_edges(src, dst)
        rank = _pagerank_core(
            src_i, dst_i, len(ents), max_iter, scale, damping_num, damping_den
        )
        return pd.DataFrame({"entity": ents, "rank": rank})

    return (
        edges.select("src", "dst")
        .withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(solve, "entity string, rank long")
    )


# --------------------------------------------------------------------- LPA


def _lpa_core(src_i: np.ndarray, dst_i: np.ndarray, n: int, max_iter: int) -> np.ndarray:
    """Synchronous min-label majority LPA over the DISTINCT undirected
    edge set + one self-vote per node (mirrors lpa_communities: bidir ∪
    self-loops, distinct). Vote winner per node = max count, tie →
    smallest label (index order == lex order)."""
    # und = distinct((s,d) ∪ (d,s) ∪ (i,i)) via packed-key unique
    all_src = np.concatenate([src_i, dst_i, np.arange(n, dtype=np.int64)])
    all_dst = np.concatenate([dst_i, src_i, np.arange(n, dtype=np.int64)])
    keys = np.unique(all_src.astype(np.int64) * n + all_dst.astype(np.int64))
    u_src = keys // n
    u_dst = keys % n

    label = np.arange(n, dtype=np.int64)
    for _ in range(max_iter):
        lab = label[u_dst]
        # count votes per (src, lab), then per src pick (max n, min lab)
        vkeys = u_src * n + lab
        vkeys.sort()
        starts = np.flatnonzero(np.diff(vkeys, prepend=-1) != 0)
        counts = np.diff(np.append(starts, len(vkeys)))
        v_src = vkeys[starts] // n
        v_lab = vkeys[starts] % n
        order = np.lexsort((v_lab, -counts, v_src))
        first = np.flatnonzero(np.diff(v_src[order], prepend=-1) != 0)
        new_label = label.copy()
        new_label[v_src[order][first]] = v_lab[order][first]
        if np.array_equal(new_label, label):
            break
        label = new_label
    return label


def lpa_local(edges: DataFrame, max_iter: int) -> DataFrame:
    """Single-task LPA: (entity, community) identical to the
    distributed vote loop."""

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        src = pdf["src"].to_numpy()
        dst = pdf["dst"].to_numpy()
        ents, src_i, dst_i = _index_edges(src, dst)
        label = _lpa_core(src_i, dst_i, len(ents), max_iter)
        return pd.DataFrame({"entity": ents, "community": ents[label]})

    return (
        edges.select("src", "dst")
        .withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(solve, "entity string, community string")
    )
