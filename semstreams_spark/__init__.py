"""semstreams_spark — a PySpark-native streaming knowledge-graph engine.

A brand-new engine with the query/data-processing capabilities of the Go
reference (C360Studio/semstreams), re-expressed Spark-first:

- input: tables of multi-turn conversation/agent transcripts
  ``(conv_id string, turn_idx int, role string, text string, tool string,
  ts timestamp)``
- triple extraction (reference: ``message/entity_payload.go:109-163``)
- last-writer-wins entity merge (reference: ``graph/helpers.go:101-134``)
- edge upsert keyed (src, dst, edge_type) (reference:
  ``types/graph/types.go:125-134``)
- tumbling/sliding/session windows, watermarks, stateful joins
- exactly-once foreachBatch sink with per-partition lineage
- CEP rules, bounded traversal, LPA/PageRank, BM25 + semantic search
- training-data ops: dedup (exact/minhash/simhash/jaccard), ANN, text stats

Everything is ``pyspark.sql`` built-ins or vectorized Arrow pandas UDFs;
no per-row Python UDFs anywhere.
"""

__version__ = "0.1.0"
