"""Exactly-once idempotent foreachBatch sink with per-partition lineage.

The reference provides at-most-once NATS delivery with content-hash dedup
(SURVEY W5); the north-rule requires the stronger guarantee: exactly-once
output across failures/restarts. Without an Iceberg runtime in this image
(no jars), the sink emulates transactional MERGE with:

1. batch staging: each micro-batch writes to ``_staging/batch=<id>`` then
   atomically renames into the table directory (POSIX rename; on object
   stores this becomes an Iceberg/Delta commit — the interface is the
   same)
2. a commit **ledger**: ``_ledger/<batchId>.json`` recording row counts,
   per-partition lineage (input partition → row count), min/max event
   time, and wall duration. A batch replayed after a crash-between-
   write-and-checkpoint is detected by its ledger entry and skipped —
   idempotence keyed on batchId.
3. readers see only renamed (committed) batch dirs; stale staging dirs
   from crashed attempts are ignored and garbage-collected on the next
   commit.

Lineage + metrics satisfy the north-rule's "per-partition lineage +
metrics" requirement and feed BENCH reporting.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ExactlyOnceParquetSink:
    def __init__(self, table_dir: str):
        self.table_dir = table_dir
        self.ledger_dir = os.path.join(table_dir, "_ledger")
        self.staging_dir = os.path.join(table_dir, "_staging")
        os.makedirs(self.ledger_dir, exist_ok=True)

    # -- ledger -------------------------------------------------------------
    def _ledger_path(self, batch_id: int) -> str:
        return os.path.join(self.ledger_dir, f"{batch_id}.json")

    def committed(self, batch_id: int) -> bool:
        return os.path.exists(self._ledger_path(batch_id))

    def ledger(self) -> list[dict]:
        out = []
        for f in sorted(os.listdir(self.ledger_dir)):
            if f.endswith(".json"):
                with open(os.path.join(self.ledger_dir, f)) as fh:
                    out.append(json.load(fh))
        return out

    # -- the foreachBatch callable -------------------------------------------
    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if self.committed(batch_id):
            # replay after crash-between-write-and-checkpoint: skip
            return
        t0 = time.monotonic()

        staged = os.path.join(self.staging_dir, f"batch={batch_id}")
        final = os.path.join(self.table_dir, f"batch={batch_id}")
        if os.path.exists(staged):
            shutil.rmtree(staged)  # leftover from a crashed attempt
        if os.path.exists(final):
            shutil.rmtree(final)  # crashed between rename and ledger write

        # one pass: cache, lineage per input partition, stats, write
        batch_df = batch_df.cache()
        try:
            lineage_rows = (
                batch_df.groupBy(F.spark_partition_id().alias("partition_id"))
                .agg(
                    F.count(F.lit(1)).alias("rows"),
                    F.min("ts").alias("min_ts"),
                    F.max("ts").alias("max_ts"),
                )
                .collect()
            )
            n_rows = sum(r["rows"] for r in lineage_rows)
            if n_rows > 0:
                batch_df.write.mode("overwrite").parquet(staged)
                os.replace(staged, final)

            entry = {
                "batch_id": batch_id,
                "rows": n_rows,
                "partitions": [
                    {
                        "partition_id": r["partition_id"],
                        "rows": r["rows"],
                        "min_ts": str(r["min_ts"]),
                        "max_ts": str(r["max_ts"]),
                    }
                    for r in sorted(lineage_rows, key=lambda r: r["partition_id"])
                ],
                "wall_seconds": round(time.monotonic() - t0, 3),
            }
            tmp = self._ledger_path(batch_id) + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(entry, fh)
            os.replace(tmp, self._ledger_path(batch_id))
        finally:
            batch_df.unpersist()

    # -- reader -------------------------------------------------------------
    def read(self, spark) -> DataFrame:
        """Committed rows only (ledger-gated)."""
        dirs = [
            os.path.join(self.table_dir, d)
            for d in os.listdir(self.table_dir)
            if d.startswith("batch=")
            and self.committed(int(d.split("=", 1)[1]))
        ]
        if not dirs:
            raise FileNotFoundError(f"no committed batches in {self.table_dir}")
        return spark.read.parquet(*dirs)
