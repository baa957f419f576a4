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

        # single pass: write staged parquet, then derive per-partition
        # lineage from the parquet footers (one output file per task
        # partition; footer stats give rows + min/max ts with no second
        # Spark job over the data)
        batch_df.write.mode("overwrite").parquet(staged)
        partitions = self._footer_lineage(staged)
        n_rows = sum(p["rows"] for p in partitions)
        if n_rows > 0:
            os.replace(staged, final)
        else:
            shutil.rmtree(staged, ignore_errors=True)

        entry = {
            "batch_id": batch_id,
            "rows": n_rows,
            "partitions": partitions,
            "wall_seconds": round(time.monotonic() - t0, 3),
        }
        tmp = self._ledger_path(batch_id) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(entry, fh)
        os.replace(tmp, self._ledger_path(batch_id))

    @staticmethod
    def _footer_lineage(directory: str) -> list[dict]:
        import pyarrow.parquet as pq

        out = []
        for name in sorted(os.listdir(directory)):
            if not name.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(directory, name)).metadata
            ts_min = ts_max = None
            try:
                ts_idx = md.schema.names.index("ts")
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(ts_idx).statistics
                    if st is not None and st.has_min_max:
                        ts_min = st.min if ts_min is None else min(ts_min, st.min)
                        ts_max = st.max if ts_max is None else max(ts_max, st.max)
            except ValueError:
                pass
            # task partition id is embedded in the part file name
            out.append(
                {
                    "file": name,
                    "partition_id": int(name.split("-")[1]) if "-" in name else -1,
                    "rows": md.num_rows,
                    "min_ts": str(ts_min),
                    "max_ts": str(ts_max),
                }
            )
        return out

    # -- reader -------------------------------------------------------------
    def _committed_dirs(self) -> list[str]:
        return [
            os.path.join(self.table_dir, d)
            for d in os.listdir(self.table_dir)
            if d.startswith("batch=")
            and self.committed(int(d.split("=", 1)[1]))
        ]

    def read(self, spark) -> DataFrame:
        """Committed rows only (ledger-gated)."""
        dirs = self._committed_dirs()
        if not dirs:
            raise FileNotFoundError(f"no committed batches in {self.table_dir}")
        return spark.read.parquet(*dirs)

    def batch_dirs_since(self, cutoff) -> list[str]:
        """Committed batch dirs whose max event time (per-partition ledger
        lineage, derived from parquet footer stats at commit time) is ≥
        `cutoff` (a datetime). Batches without ts statistics are included
        conservatively. This is the ledger-metadata analogue of partition
        pruning: the ledger is consulted, never the data files, so
        selecting the relevant suffix of a long-running stream's history
        costs O(#batches) metadata — not O(rows)."""
        import datetime as _dt

        keep: list[str] = []
        for entry in self.ledger():
            mx: _dt.datetime | None = None
            for p in entry.get("partitions", []):
                raw = p.get("max_ts")
                if raw in (None, "None"):
                    continue
                try:
                    v = _dt.datetime.fromisoformat(raw)
                except ValueError:
                    continue
                mx = v if mx is None else max(mx, v)
            if mx is None or mx >= cutoff:
                d = os.path.join(self.table_dir, f"batch={entry['batch_id']}")
                if os.path.isdir(d):  # empty batches commit a ledger row only
                    keep.append(d)
        return keep
