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

Ledger metadata reads are BOUNDED (round-5): every ``compact_every``
commits the sink writes ``_ledger/_checkpoint.json`` holding the
compacted entries (batch_id, rows, max event ts) for the whole prefix —
the Delta ``_last_checkpoint`` shape. Readers load the latest checkpoint
plus the per-batch suffix ONCE and the live sink keeps the compact index
in memory, so per-trigger pruning (``batch_dirs_since``) costs O(1) file
opens in steady state and O(compact_every) after a restart — independent
of total stream age. Full per-partition lineage stays in the per-batch
ledger JSONs for audit (``ledger()``), off the hot path. Reference
anchor: the KV bucket is a point-lookup store
(``processor/graph/datamanager/manager.go:693-743``), never a scan.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame


class ExactlyOnceParquetSink:
    def __init__(self, table_dir: str, commit_mode: str = "rename", compact_every: int = 16):
        if commit_mode not in ("rename", "manifest"):
            raise ValueError(f"unknown commit_mode: {commit_mode!r}")
        self.table_dir = table_dir
        self.commit_mode = commit_mode
        self.compact_every = max(1, compact_every)
        self.ledger_dir = os.path.join(table_dir, "_ledger")
        self.staging_dir = os.path.join(table_dir, "_staging")
        self.manifest_dir = os.path.join(table_dir, "_manifests")
        os.makedirs(self.ledger_dir, exist_ok=True)
        if commit_mode == "manifest":
            os.makedirs(self.manifest_dir, exist_ok=True)
        # compact in-memory ledger index: batch_id -> {batch_id, rows,
        # max_ts}; backed by _checkpoint.json + per-batch suffix. None
        # until first read/commit. ledger_file_reads counts metadata file
        # opens so tests can assert per-trigger reads are bounded.
        self._centries: dict[int, dict] | None = None
        self._ckpt_upto = -1
        self._n_since_ckpt = 0
        self._n_segments = 0
        self._legacy_ckpt = False
        self.ledger_file_reads = 0

    # -- ledger -------------------------------------------------------------
    def _ledger_path(self, batch_id: int) -> str:
        return os.path.join(self.ledger_dir, f"{batch_id}.json")

    def _manifest_path(self, batch_id: int) -> str:
        return os.path.join(self.manifest_dir, f"{batch_id}.json")

    def _ckpt_path(self) -> str:
        return os.path.join(self.ledger_dir, "_checkpoint.json")

    def _ckpt_seg_path(self, i: int) -> str:
        return os.path.join(self.ledger_dir, f"_checkpoint.seg.{i}.json")

    def committed(self, batch_id: int) -> bool:
        return os.path.exists(self._ledger_path(batch_id))

    def ledger(self) -> list[dict]:
        """FULL per-batch entries (per-partition lineage, wall times) —
        the audit path. O(#batches) file reads by design; the per-trigger
        hot path uses the compact index (``_compact_entries``) instead."""
        out = []
        for f in sorted(os.listdir(self.ledger_dir)):
            if f.endswith(".json") and not f.startswith("_"):
                self.ledger_file_reads += 1
                with open(os.path.join(self.ledger_dir, f)) as fh:
                    out.append(json.load(fh))
        out.sort(key=lambda e: e["batch_id"])
        return out

    @staticmethod
    def _compact_entry(entry: dict) -> dict:
        """Reduce a full ledger entry to what pruning/reading needs:
        (batch_id, rows, max event ts). max_ts is None — meaning "always
        include conservatively" — unless every NON-EMPTY partition carries
        a parseable max_ts: any partition holding rows but no usable stat
        could be the true max, so it forces conservative inclusion (not
        just the all-missing case). Empty part files (rows == 0 — routine
        with wide parallelism on small batches) hold no events and never
        force inclusion."""
        import datetime as _dt

        mx: _dt.datetime | None = None
        unknown = False
        for p in entry.get("partitions", []):
            if p.get("rows", 1) == 0:
                continue
            raw = p.get("max_ts")
            v = None
            if raw not in (None, "None"):
                try:
                    v = _dt.datetime.fromisoformat(raw)
                except ValueError:
                    v = None
            if v is None:
                unknown = True
            else:
                mx = v if mx is None else max(mx, v)
        return {
            "batch_id": entry["batch_id"],
            "rows": entry.get("rows", 0),
            "max_ts": None if (unknown or mx is None) else mx.isoformat(),
        }

    def _compact_entries(self) -> dict[int, dict]:
        """The compact ledger index, loaded once per sink object: the
        O(1) checkpoint pointer + its immutable suffix segments (restart
        cost: one file per compact_every committed batches) + the
        per-batch suffix (< compact_every files in steady state), then
        maintained in memory by the committer."""
        if self._centries is not None:
            return self._centries
        entries: dict[int, dict] = {}
        upto = -1
        n_segments = 0
        legacy = False
        if os.path.exists(self._ckpt_path()):
            self.ledger_file_reads += 1
            with open(self._ckpt_path()) as fh:
                ck = json.load(fh)
            upto = ck["upto"]
            if "entries" in ck:  # pre-r6 monolithic checkpoint
                entries = {e["batch_id"]: e for e in ck["entries"]}
                legacy = True
            else:
                n_segments = ck["n_segments"]
                for i in range(n_segments):
                    self.ledger_file_reads += 1
                    with open(self._ckpt_seg_path(i)) as fh:
                        for e in json.load(fh):
                            entries[e["batch_id"]] = e
        n_suffix = 0
        for f in os.listdir(self.ledger_dir):
            if not f.endswith(".json") or f.startswith("_"):
                continue
            bid = int(f[: -len(".json")])
            if bid <= upto:
                continue
            self.ledger_file_reads += 1
            with open(os.path.join(self.ledger_dir, f)) as fh:
                entries[bid] = self._compact_entry(json.load(fh))
            n_suffix += 1
        self._centries = entries
        self._ckpt_upto = upto
        self._n_since_ckpt = n_suffix
        self._n_segments = n_segments
        self._legacy_ckpt = legacy
        return entries

    def _record_commit(self, entry: dict) -> None:
        """Maintain the compact index after a commit; checkpoint every
        compact_every commits. r6 (round-5 verdict item #2): the
        checkpoint is SEGMENTED — each flush writes ONE immutable
        ``_checkpoint.seg.<k>.json`` holding only the entries committed
        since the previous flush, plus an O(1) pointer
        ``{"upto", "n_segments"}`` — so bytes written per commit window
        are independent of total stream age (the old monolith rewrote
        every entry ever, ~260k-entry JSON every ~3 minutes after a month
        at one batch/10 s). A legacy monolithic checkpoint is migrated
        once into segment 0. All writes are atomic tmp+replace; a crash
        between segment and pointer just rewrites the same segment."""
        entries = self._compact_entries()
        entries[entry["batch_id"]] = self._compact_entry(entry)
        self._n_since_ckpt += 1
        if self._n_since_ckpt >= self.compact_every:
            if self._legacy_ckpt:
                # one-time migration: the legacy full list becomes seg 0
                seg = sorted(
                    (e for e in entries.values()), key=lambda e: e["batch_id"]
                )
            else:
                seg = sorted(
                    (e for e in entries.values() if e["batch_id"] > self._ckpt_upto),
                    key=lambda e: e["batch_id"],
                )
            stmp = self._ckpt_seg_path(self._n_segments) + ".tmp"
            with open(stmp, "w") as fh:
                json.dump(seg, fh)
            os.replace(stmp, self._ckpt_seg_path(self._n_segments))
            self._n_segments += 1
            self._legacy_ckpt = False
            upto = max(entries)
            tmp = self._ckpt_path() + ".tmp"
            with open(tmp, "w") as fh:
                json.dump({"upto": upto, "n_segments": self._n_segments}, fh)
            os.replace(tmp, self._ckpt_path())
            self._ckpt_upto = upto
            self._n_since_ckpt = 0

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
        self._record_commit(entry)

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
        manifest mode — data directories are never listed). Uses the
        compact ledger index: no per-batch ledger JSON opens in steady
        state."""
        paths: list[str] = []
        for bid in sorted(self._compact_entries()):
            paths.extend(self._batch_data_paths(bid))
        if not paths:
            raise FileNotFoundError(f"no committed batches in {self.table_dir}")
        return spark.read.parquet(*paths)

    def batch_dirs_since(self, cutoff) -> list[str]:
        """Committed batch data paths whose max event time (per-partition
        ledger lineage, derived from parquet footer stats at commit time)
        is ≥ `cutoff` (a datetime). Batches with ANY partition lacking a
        parseable max_ts are included conservatively — an unparseable stat
        could hold the true max. This is the ledger-metadata analogue of
        partition pruning, served from the compact in-memory index
        (checkpoint + suffix), so per-trigger cost is O(1) file opens in
        steady state — independent of total stream age, never O(rows) or
        O(#batches)."""
        import datetime as _dt

        keep: list[str] = []
        for bid, entry in sorted(self._compact_entries().items()):
            raw = entry.get("max_ts")
            mx = _dt.datetime.fromisoformat(raw) if raw else None
            if mx is None or mx >= cutoff:
                keep.extend(self._batch_data_paths(bid))
        return keep
