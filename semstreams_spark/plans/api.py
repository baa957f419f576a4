"""Point/scan query surface over the published graph tables (SURVEY §2.11).

The reference exposes these over NATS request/reply
(``processor/graph/queries.go:99-396``) and HTTP/GraphQL; here they are
DataFrame functions over the node/edge/triple tables — each one a
Catalyst plan that benefits from partition pruning + predicate pushdown
instead of KV point-gets + hand-built secondary indexes.

Construction: ``GraphQueryAPI(nodes, edges, triples)`` — any DataFrames
with the engine's standard schemas (operators.merge outputs, or the
exactly-once sink's committed tables).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class GraphQueryAPI:
    nodes: DataFrame
    edges: DataFrame
    triples: DataFrame

    # -- point lookups (GetEntity, datamanager/manager.go:805-849) ---------
    def get_entity(self, entity_id: str) -> DataFrame:
        return self.nodes.filter(F.col("id") == entity_id)

    def get_entities_batch(self, ids: list[str]) -> DataFrame:
        """graph/query/client.go:236-253"""
        return self.nodes.filter(F.col("id").isin(ids))

    def exists_entity(self, entity_id: str) -> bool:
        """datamanager/manager.go:851 — semi-join style existence."""
        return not self.nodes.filter(F.col("id") == entity_id).isEmpty()

    # -- scans (client.go:256-277) ------------------------------------------
    def list_entities(self, limit: int | None = None) -> DataFrame:
        out = self.nodes.select("id").orderBy("id")
        return out.limit(limit) if limit else out

    def count_entities(self) -> int:
        return self.nodes.count()

    def query_entities(
        self, entity_type: str | None = None, status: str | None = None
    ) -> DataFrame:
        """Criteria scan (client.go:370-390, matcher :729-765) — Catalyst
        pushes these filters into the parquet scan."""
        out = self.nodes
        if entity_type:
            out = out.filter(F.col("type") == entity_type)
        if status:
            out = out.filter(F.col("status") == status)
        return out

    # -- secondary-index queries (indexmanager) -----------------------------
    def query_by_predicate(self, predicate: str) -> DataFrame:
        """PREDICATE_INDEX (indexmanager/manager.go:1133-1221) → plain
        filter + distinct subjects."""
        return (
            self.triples.filter(F.col("predicate") == predicate)
            .select("subject")
            .distinct()
        )

    def query_temporal(self, start, end) -> DataFrame:
        """TEMPORAL_INDEX hourly-bucket scan (manager.go:1284-1353) →
        range filter; hour partition pruning comes free when the table is
        partitioned by date_trunc('hour', ts)."""
        return self.triples.filter((F.col("ts") >= start) & (F.col("ts") < end))

    # -- relationships (querymanager/query.go:112-170,348-423) --------------
    def relationships_out(self, entity_id: str) -> DataFrame:
        return self.edges.filter(F.col("src") == entity_id)

    def relationships_in(self, entity_id: str) -> DataFrame:
        """INCOMING_INDEX reverse lookup (indexmanager/indexes.go:405-508)
        → filter on dst; at scale, a materialized dst-partitioned copy."""
        return self.edges.filter(F.col("dst") == entity_id)

    def relationships_both(self, entity_id: str) -> DataFrame:
        return self.relationships_out(entity_id).unionByName(
            self.relationships_in(entity_id)
        ).dropDuplicates(["src", "dst", "edge_type"])

    def verify_relationship(self, src: str, dst: str, edge_type: str | None = None) -> bool:
        """graph/query/client.go:344-358"""
        e = self.edges.filter((F.col("src") == src) & (F.col("dst") == dst))
        if edge_type:
            e = e.filter(F.col("edge_type") == edge_type)
        return not e.isEmpty()

    def incoming_grouped(self) -> DataFrame:
        """Materialized reverse-edge aggregation (J5): dst → incoming list."""
        return self.edges.groupBy("dst").agg(
            F.sort_array(F.collect_list(F.struct("src", "edge_type"))).alias("incoming"),
            F.count(F.lit(1)).alias("n_incoming"),
        )

    # -- spatial (indexmanager/manager.go:1223-1281) -------------------------
    def query_spatial(
        self,
        min_lat: float,
        max_lat: float,
        min_lon: float,
        max_lon: float,
        lat_col: str = "lat",
        lon_col: str = "lon",
        bin_col: str | None = None,
        bin_precision: int = 4,
    ) -> DataFrame:
        """QuerySpatial bbox scan: pure range predicates on (lat, lon) —
        pushed into the parquet scan; when the node table carries a
        geo_bin partition column (`bin_col`), the bbox additionally prunes
        partitions via geo_bins_for_bbox (SPATIAL_INDEX parity: the
        reference scans its geo-bin secondary index, we scan geo-bin
        partitions)."""
        out = self.nodes.filter(
            (F.col(lat_col) >= min_lat)
            & (F.col(lat_col) <= max_lat)
            & (F.col(lon_col) >= min_lon)
            & (F.col(lon_col) <= max_lon)
        )
        if bin_col is not None:
            from ..operators.textops import geo_bins_for_bbox

            bins = geo_bins_for_bbox(min_lat, max_lat, min_lon, max_lon, bin_precision)
            out = out.filter(F.col(bin_col).isin(bins))
        return out

    # -- snapshot (querymanager/query.go:276-346) ----------------------------
    def snapshot(
        self,
        start=None,
        end=None,
        entity_types: list[str] | None = None,
        max_entities: int | None = None,
    ) -> tuple[DataFrame, bool]:
        """Bounded graph snapshot: conjunctive bounds, dedup, MaxEntities
        truncation with a truncated flag (query.go:320-327)."""
        out = self.nodes
        if entity_types:
            out = out.filter(F.col("type").isin(entity_types))
        if start is not None:
            out = out.filter(F.col("updated_at") >= start)
        if end is not None:
            out = out.filter(F.col("updated_at") < end)
        out = out.dropDuplicates(["id"])
        truncated = False
        if max_entities is not None:
            # limit(max+1) probe: the scan early-stops after max+1 rows
            # instead of a full count over the node set
            truncated = out.limit(max_entities + 1).count() > max_entities
            out = out.orderBy("id").limit(max_entities)
        return out, truncated
