#!/usr/bin/env python
"""Benchmark harness.

Runs the headline pipeline at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line:

  {"metric": "headline_suite_wall", "value": <sec>, "unit": "sec",
   "queries": {...per-query MIN over --reps interleaved passes...},
   "queries_median": {...per-query median...}, "reps": R,
   "loadavg_1m": [start, end], "sf": <sf>,
   "turns_per_sec": ..., "batch_p95_ms": ..., "cores": N}

The e2e streaming ingest (read → extract → stateful merge → exactly-once
sink) is measured twice: one-big-batch for throughput (turns/sec) and
20-file micro-batches for per-batch latency (p95 triggerExecution).

Scaling evidence (north_rule): tools/scaling_bench.py runs this file at
two parallelism levels in fresh JVMs and reports efficiency.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _noop_write(df):
    df.write.format("noop").mode("overwrite").save()


def batch_queries(spark, sf_dir, reps: int = 3):
    """Headline batch queries (subset of __spark_entry__ queries that
    dominate the pipeline), each timed `reps` times with the reps
    INTERLEAVED (full suite passes back-to-back) so co-tenant load spikes
    on this shared host hit all queries alike; reports {min, median} per
    query. min is the headline (the protocol of record, BASELINE §C);
    median exposes how loaded the run was."""
    import statistics

    import __spark_entry__ as entry

    qs = entry.queries()
    names = [
        "triples_extract",
        "entity_states",
        "graph_edges",
        "cooccur_5min",
        "sessions",
        "degree_tumbling",
        "rule_events",
        "q1_pricing",
        "bm25_topk",
        "minhash_pairs",
        # round-2 breadth: iterative/graph paths so regressions are visible
        "paths_2hop",
        "lpa_hierarchy",
        "graphrag_global",
        "embedding_neardup_lsh",
        "pagerank_entities",
        "entity_semantic_topk",
        # round-3 additions: trained-centroid IVF + real WAV decode
        "ivf_topk",
        "media_wav_decode",
        # round-4 addition: real stdlib PNG decode
        "media_png_decode",
    ]
    times: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(reps):
        for n in names:
            t0 = time.monotonic()
            _noop_write(qs[n](spark, sf_dir))
            times[n].append(time.monotonic() - t0)
            # drop DataFrame caches pinned by iterative operators so
            # storage doesn't accumulate across reps (GC pressure was
            # inflating whatever query happened to run last); cleanup is
            # outside the timed window — a real deployment runs one query
            # per session/job, not 57 back-to-back in one JVM
            spark.catalog.clearCache()
        gc.collect()
    mins = {n: round(min(ts), 3) for n, ts in times.items()}
    medians = {n: round(statistics.median(ts), 3) for n, ts in times.items()}
    return mins, medians


# Heaviest transcript-derived queries — runnable at ANY scale factor
# because their input is the deterministic generator, not the fixed
# testdata tables. The big-sf section re-times these so fixed-cost
# effects (task scheduling, JVM warmup) visibly amortize as walls grow.
BIG_SF_QUERIES = [
    "entity_states",
    "rule_events",
    "paths_2hop",
    "lpa_hierarchy",
    "graphrag_global",
    "pagerank_entities",
]


def big_sf_queries(spark, big_sf: float, reps: int = 2):
    """Time BIG_SF_QUERIES at a larger scale factor (interleaved reps,
    min/median protocol — same estimator as batch_queries)."""
    import statistics

    import __spark_entry__ as entry

    qs = entry.queries()
    sf_dir = f"sf{big_sf:g}"  # only the sf token matters to these queries
    times: dict[str, list[float]] = {n: [] for n in BIG_SF_QUERIES}
    for _ in range(reps):
        for n in BIG_SF_QUERIES:
            t0 = time.monotonic()
            _noop_write(qs[n](spark, sf_dir))
            times[n].append(time.monotonic() - t0)
            spark.catalog.clearCache()
        gc.collect()
    mins = {n: round(min(ts), 3) for n, ts in times.items()}
    medians = {n: round(statistics.median(ts), 3) for n, ts in times.items()}
    return mins, medians


def stream_ingest(spark, transcripts_file, workdir, n_files, mfpt, watermark="90 days"):
    """Run the e2e ingest over the transcript table split into n_files;
    returns (wall_sec, n_turns, per_batch_ms)."""
    from pyspark.sql import functions as F  # noqa: F401

    from semstreams_spark.streaming import build_ingest_stream, read_transcript_stream

    indir = os.path.join(workdir, f"in_{n_files}")
    if not os.path.exists(indir):
        src = spark.read.parquet(transcripts_file)
        src.repartition(n_files).write.mode("overwrite").parquet(indir)
    n_turns = spark.read.parquet(indir).count()

    outdir = os.path.join(workdir, f"out_{n_files}_{mfpt}")
    ckpt = os.path.join(workdir, f"ckpt_{n_files}_{mfpt}")
    for d in (outdir, ckpt):
        if os.path.exists(d):
            shutil.rmtree(d)

    stream = read_transcript_stream(spark, indir, max_files_per_trigger=mfpt)
    t0 = time.monotonic()
    q, sink = build_ingest_stream(
        stream, outdir, checkpoint_dir=ckpt, watermark=watermark, once=(mfpt >= n_files),
        # A/B the two exactly-once publish paths without code changes
        commit_mode=os.environ.get("SPARK_GRAFT_COMMIT_MODE", "rename"),
    )
    q.awaitTermination()
    wall = time.monotonic() - t0
    per_batch_ms = [
        p["durationMs"].get("triggerExecution", 0)
        for p in (json.loads(j.json) for j in q.recentProgress)
        if p.get("numInputRows", 0) > 0
    ]
    return wall, n_turns, per_batch_ms


def p95(xs):
    if not xs:
        return None
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(round(0.95 * (len(xs) - 1))))]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--stream-only", action="store_true")
    ap.add_argument("--runs", type=int, default=3, help="timed ingest runs (after 1 discarded warmup)")
    ap.add_argument(
        "--reps",
        type=int,
        default=int(os.environ.get("BENCH_REPS", "3")),
        help="interleaved suite passes for per-query min/median",
    )
    ap.add_argument("--workdir", default=None)
    ap.add_argument(
        "--big-sf",
        type=float,
        default=float(os.environ.get("SPARK_GRAFT_BIG_SF", "0.3")),
        help="second scale point for ingest + heavy queries (0 disables)",
    )
    args = ap.parse_args()

    from semstreams_spark.datagen import ensure_transcripts, sf_from_dir, transcripts_path
    from semstreams_spark.session import get_spark

    sf = sf_from_dir(args.sf_dir)
    ensure_transcripts(sf)
    spark = get_spark("bench", cores=args.cores, shuffle_partitions=args.cores)
    workdir = args.workdir or tempfile.mkdtemp(prefix="semspark_bench_")

    # host-load marker: this is a shared gVisor host with 2-4x co-tenant
    # wall-time jitter; the 1-min load average before/after contextualizes
    # the medians (protocol in BASELINE §C)
    load_start = round(os.getloadavg()[0], 2)

    queries: dict[str, float] = {}
    queries_median: dict[str, float] = {}
    total = 0.0

    # e2e throughput: one big batch over cores*2 files; warmup discarded
    # (JIT), median of --runs (BASELINE.md protocol)
    import statistics

    walls = []
    n_turns = 0
    for i in range(args.runs + 1):
        wall, n_turns, _ = stream_ingest(
            spark, transcripts_path(sf), workdir, n_files=args.cores * 2, mfpt=args.cores * 2
        )
        if i > 0:
            walls.append(wall)
    # min-of-runs (same estimator as the per-query section): co-tenant
    # load can inflate a wall, nothing can deflate one below true cost;
    # ingest_walls + queries_median carry the spread
    wall = min(walls)
    queries["ingest_e2e"] = round(wall, 3)
    queries_median["ingest_e2e"] = round(statistics.median(walls), 3)
    total += wall
    turns_per_sec = round(n_turns / wall, 1)
    ingest_walls = [round(w, 3) for w in walls]

    batch_p95_ms = None
    big = None
    if not args.stream_only:
        # per-batch latency: 20 micro-batches
        _, _, per_batch = stream_ingest(
            spark, transcripts_path(sf), workdir, n_files=20, mfpt=1
        )
        batch_p95_ms = p95(per_batch)

        mins, medians = batch_queries(spark, args.sf_dir, reps=args.reps)
        queries.update(mins)
        queries_median.update(medians)
        total += sum(mins.values())

        # second scale point (north-rule scale credibility): ingest + the
        # heaviest transcript-derived queries at big_sf, same min/median
        # protocol — validates the T = F + W/cores model beyond sf0.1,
        # where fixed costs are a large share of short walls
        if args.big_sf and args.big_sf > 0:
            ensure_transcripts(args.big_sf)
            # own workdir: stream_ingest keys its staged input on
            # n_files only, which would silently reuse the sf0.1 split
            big_workdir = os.path.join(workdir, f"big_sf{args.big_sf:g}")
            big_walls = []
            big_turns = 0
            for i in range(3):  # 1 discarded warmup + 2 timed
                w_, big_turns, _ = stream_ingest(
                    spark,
                    transcripts_path(args.big_sf),
                    big_workdir,
                    n_files=args.cores * 2,
                    mfpt=args.cores * 2,
                )
                if i > 0:
                    big_walls.append(w_)
            bmins, bmedians = big_sf_queries(spark, args.big_sf, reps=2)
            big = {
                "sf": args.big_sf,
                "ingest_wall": round(min(big_walls), 3),
                "ingest_walls": [round(w, 3) for w in big_walls],
                "turns_per_sec": round(big_turns / min(big_walls), 1),
                "n_turns": big_turns,
                "queries": bmins,
                "queries_median": bmedians,
            }

    print(
        json.dumps(
            {
                "metric": "headline_suite_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": queries,
                "queries_median": queries_median,
                "reps": args.reps,
                "sf": sf,
                "turns_per_sec": turns_per_sec,
                "n_turns": n_turns,
                "ingest_walls": ingest_walls,
                "batch_p95_ms": batch_p95_ms,
                "big": big,
                "loadavg_1m": [load_start, round(os.getloadavg()[0], 2)],
                "cores": args.cores,
            }
        )
    )


if __name__ == "__main__":
    main()
