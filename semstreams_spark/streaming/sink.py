"""Exactly-once idempotent foreachBatch sink with per-partition lineage.

The reference provides at-most-once NATS delivery with content-hash dedup
(SURVEY W5); the north-rule requires the stronger guarantee: exactly-once
output across failures/restarts. Without an Iceberg runtime in this image
(no jars), the sink emulates transactional MERGE with two commit modes:

``commit_mode="rename"`` (POSIX fast path)
1. batch staging: each micro-batch writes to ``_staging/batch=<id>`` then
   atomically renames into the table directory (POSIX rename).
2. readers see only renamed (committed) batch dirs.

``commit_mode="manifest"`` (object-store-safe — no rename anywhere)
1. data files are written once under ``_staging/batch=<id>`` and never
   move (object stores have no atomic rename; a "rename" is copy+delete
   and can be observed half-done).
2. the commit point is a single small ``_manifests/<batchId>.json`` PUT
   naming exactly the data files of the batch — the same shape as an
   Iceberg snapshot manifest / Delta commit json. Readers resolve data
   files through manifests only, never by listing data directories, so
   orphan files from a crashed attempt are invisible.

Both modes share the commit **ledger**: ``_ledger/<batchId>.json``
recording row counts, per-partition lineage (input partition → row count,
min/max event time from parquet footer stats), and wall duration. A batch
replayed after a crash-between-write-and-checkpoint is detected by its
ledger entry and skipped — idempotence keyed on batchId. The ledger is
written after the manifest/rename, so every committed() batch has fully
visible data; a crash in the window between them replays the batch, which
rewrites data + manifest deterministically before the ledger lands.

Lineage + metrics satisfy the north-rule's "per-partition lineage +
metrics" requirement and feed BENCH reporting. The ledger's footer-stat
min/max event times double as pruning metadata
(``batch_dirs_since``) — the streaming rule stage bounds its cooldown
seed reads with them.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame


class ExactlyOnceParquetSink:
    def __init__(self, table_dir: str, commit_mode: str = "rename"):
        if commit_mode not in ("rename", "manifest"):
            raise ValueError(f"unknown commit_mode: {commit_mode!r}")
        self.table_dir = table_dir
        self.commit_mode = commit_mode
        self.ledger_dir = os.path.join(table_dir, "_ledger")
        self.staging_dir = os.path.join(table_dir, "_staging")
        self.manifest_dir = os.path.join(table_dir, "_manifests")
        os.makedirs(self.ledger_dir, exist_ok=True)
        if commit_mode == "manifest":
            os.makedirs(self.manifest_dir, exist_ok=True)

    # -- ledger -------------------------------------------------------------
    def _ledger_path(self, batch_id: int) -> str:
        return os.path.join(self.ledger_dir, f"{batch_id}.json")

    def _manifest_path(self, batch_id: int) -> str:
        return os.path.join(self.manifest_dir, f"{batch_id}.json")

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
        n_rows, partitions = self._write_and_publish(batch_df, batch_id)

        entry = {
            "batch_id": batch_id,
            "rows": n_rows,
            "partitions": partitions,
            "commit_mode": self.commit_mode,
            "wall_seconds": round(time.monotonic() - t0, 3),
        }
        tmp = self._ledger_path(batch_id) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(entry, fh)
        os.replace(tmp, self._ledger_path(batch_id))

    def _write_and_publish(self, batch_df: DataFrame, batch_id: int):
        """Write the batch's data files and make them reader-visible
        (rename: dir move; manifest: manifest PUT). Returns
        (n_rows, partition lineage). Everything here is safely
        re-runnable — the ledger write afterwards is the real commit."""
        staged = os.path.join(self.staging_dir, f"batch={batch_id}")
        if os.path.exists(staged):
            shutil.rmtree(staged)  # leftover from a crashed attempt

        # single pass: write staged parquet, then derive per-partition
        # lineage from the parquet footers (one output file per task
        # partition; footer stats give rows + min/max ts with no second
        # Spark job over the data)
        batch_df.write.mode("overwrite").parquet(staged)
        partitions = self._footer_lineage(staged)
        n_rows = sum(p["rows"] for p in partitions)

        if self.commit_mode == "rename":
            final = os.path.join(self.table_dir, f"batch={batch_id}")
            if os.path.exists(final):
                shutil.rmtree(final)  # crashed between rename and ledger write
            if n_rows > 0:
                os.replace(staged, final)
            else:
                shutil.rmtree(staged, ignore_errors=True)
            return n_rows, partitions

        # manifest mode: files never move; one manifest PUT publishes them
        if n_rows == 0:
            shutil.rmtree(staged, ignore_errors=True)
            files: list[str] = []
        else:
            files = [os.path.join(staged, p["file"]) for p in partitions]
        mtmp = self._manifest_path(batch_id) + ".tmp"
        with open(mtmp, "w") as fh:
            json.dump({"batch_id": batch_id, "files": files}, fh)
        os.replace(mtmp, self._manifest_path(batch_id))
        return n_rows, partitions

    def _simulate_partial_commit(self, batch_df: DataFrame, batch_id: int) -> None:
        """TEST HOOK: perform everything up to but NOT including the
        ledger write — the widest crash window (data visible-if-listed,
        manifest present in manifest mode, batch not committed). The
        exactly-once tests inject a failure right after this."""
        self._write_and_publish(batch_df, batch_id)

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
    def _batch_data_paths(self, batch_id: int) -> list[str]:
        """Reader-visible data for one committed batch: the renamed dir
        (rename mode) or the manifest's file list (manifest mode)."""
        if self.commit_mode == "manifest":
            p = self._manifest_path(batch_id)
            if not os.path.exists(p):
                return []
            with open(p) as fh:
                return json.load(fh)["files"]
        d = os.path.join(self.table_dir, f"batch={batch_id}")
        return [d] if os.path.isdir(d) else []

    def read(self, spark) -> DataFrame:
        """Committed rows only (ledger-gated; manifest-resolved in
        manifest mode — data directories are never listed)."""
        paths: list[str] = []
        for entry in self.ledger():
            paths.extend(self._batch_data_paths(entry["batch_id"]))
        if not paths:
            raise FileNotFoundError(f"no committed batches in {self.table_dir}")
        return spark.read.parquet(*paths)

    def batch_dirs_since(self, cutoff) -> list[str]:
        """Committed batch data paths whose max event time (per-partition
        ledger lineage, derived from parquet footer stats at commit time)
        is ≥ `cutoff` (a datetime). Batches without ts statistics are
        included conservatively. This is the ledger-metadata analogue of
        partition pruning: the ledger is consulted, never the data files,
        so selecting the relevant suffix of a long-running stream's
        history costs O(#batches) metadata — not O(rows)."""
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
                keep.extend(self._batch_data_paths(entry["batch_id"]))
        return keep
