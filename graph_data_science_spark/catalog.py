"""Named graph catalog — the GraphStoreCatalog analog.

Reference: /root/reference/core/src/main/java/org/neo4j/gds/core/
loading/GraphStoreCatalog.java:40-245 (get/set/exists/remove keyed by
graph name). Here a catalog entry is a pair of DataFrames:

    nodes(id long, **property columns)
    edges(src long, dst long, rel_type string, weight double)

"Views" (label/type/property filtered graphs handed to algorithms,
GraphStore.getGraph, api/GraphStore.java:169-173) are lazy filtered
DataFrames — Catalyst pushes the rel_type/weight predicates into the
scan, so a view costs nothing until an algorithm runs.

"Mutate" mode (GraphStore.addNodeProperty, api/GraphStore.java:91-95)
is a join: the result column is appended to the nodes DF and the
handle re-registered.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graph_data_science_spark import projection


@dataclass
class Graph:
    """A catalog entry: edge DF (+ optional node property DF).

    ``edges`` is the canonical-form edge table AFTER orientation and
    parallel-edge aggregation — the analog of the reference's loaded
    CSR topology. Algorithms receive filtered views via
    :meth:`view`.
    """

    name: str
    edges: DataFrame
    nodes: DataFrame | None = None
    directed: bool = True
    _cached: list[DataFrame] = field(default_factory=list, repr=False)
    _pregel_edges: dict = field(default_factory=dict, repr=False)
    _n_edges: int | None = field(default=None, repr=False)
    _derived: dict = field(default_factory=dict, repr=False)

    def view(
        self,
        rel_types: list[str] | None = None,
        weight_property: bool = False,
        default_weight: float = 1.0,
    ) -> DataFrame:
        """Filtered single-weight edge view (GraphStore.getGraph analog)."""
        e = self.edges
        if rel_types:
            e = e.where(F.col("rel_type").isin(rel_types))
        w = F.coalesce(F.col("weight"), F.lit(default_weight)) if weight_property else F.lit(1.0)
        return e.select("src", "dst", w.alias("weight"))

    def vertices(self) -> DataFrame:
        if self.nodes is not None:
            return self.nodes.select("id")
        return projection.vertices(self.edges)

    def subgraph(
        self,
        node_labels: list[str] | None = None,
        rel_types: list[str] | None = None,
        node_ids: DataFrame | None = None,
    ) -> "Graph":
        """Label/type/id-filtered graph handle — the
        GraphStore.getGraph(nodeLabels, relTypes) analog
        (/root/reference/api/src/main/java/org/neo4j/gds/api/
        GraphStore.java:169-173; per-algorithm ``nodeLabels`` config
        AlgoBaseConfig.java:46-57).

        ``node_labels`` filters against the nodes DF's ``labels``
        (array<string>) or ``label`` (string) column; a node is kept
        when it carries ANY of the requested labels (the reference's
        union-of-labels semantics). ``node_ids`` (DF with an `id`
        column) covers the node-id filtered case. Edges keep only
        rows with BOTH endpoints surviving — two semi-joins Catalyst
        turns into broadcast joins whenever the kept set is small.
        Everything stays lazy: a subgraph costs nothing until an
        algorithm runs on it.
        """
        e = self.edges
        if rel_types:
            e = e.where(F.col("rel_type").isin(rel_types))
        nodes = self.nodes
        keep = node_ids.select("id") if node_ids is not None else None
        if node_labels:
            if nodes is None:
                raise ValueError(
                    "node_labels filter requires a nodes DF with a "
                    "'labels' (array<string>) or 'label' (string) column"
                )
            if "labels" in nodes.columns:
                pred = F.arrays_overlap(
                    F.col("labels"),
                    F.array(*[F.lit(l) for l in node_labels]),
                )
            elif "label" in nodes.columns:
                pred = F.col("label").isin(node_labels)
            else:
                raise ValueError("nodes DF has neither 'labels' nor 'label'")
            labeled = nodes.where(pred).select("id")
            keep = labeled if keep is None else keep.join(labeled, "id", "left_semi")
        if keep is not None:
            e = e.join(
                keep.withColumnRenamed("id", "src"), "src", "left_semi"
            ).join(keep.withColumnRenamed("id", "dst"), "dst", "left_semi")
            nodes = (
                nodes.join(keep, "id", "left_semi") if nodes is not None else keep
            )
        return Graph(
            name=f"{self.name}__sub",
            edges=e.select(*projection.EDGE_COLS)
            if set(projection.EDGE_COLS) <= set(e.columns)
            else e,
            nodes=nodes,
            directed=self.directed,
        )

    def cached(self, key: tuple, build) -> DataFrame:
        """Per-graph persisted-DataFrame cache: derived layouts
        (degree state, vertex set, Pregel edge layout) are paid once
        per graph — the CSR-build analog — and reused by every
        algorithm run until :meth:`unpersist`."""
        if key not in self._pregel_edges:
            df = build().persist()
            self._pregel_edges[key] = df
            self._cached.append(df)
        return self._pregel_edges[key]

    def derived_graph(self, key: tuple, build) -> "Graph":
        """Per-graph memo for derived Graph handles (e.g. WCC's
        undirected doubling): the derived graph's persisted edges,
        memoized |E| and Pregel layouts survive across algorithm
        runs, and :meth:`unpersist` cascades."""
        if key not in self._derived:
            self._derived[key] = build()
        return self._derived[key]

    def pregel_edges(self, n_parts: int) -> DataFrame:
        """The Pregel runner's edge layout — hash-partitioned by src,
        sorted within partitions (sort-merge joins reuse the ordering
        every superstep) and persisted. Cached per partition count so
        back-to-back algorithm runs on the same graph skip the
        superstep-0 repartition+sort."""
        return self.cached(
            ("pregel_edges", n_parts),
            lambda: self.view(weight_property=True)
            .repartition(n_parts, "src")
            .sortWithinPartitions("src"),
        )

    def pregel_layout(
        self, n_parts: int, hub_threshold: int | None = None
    ) -> tuple[DataFrame, DataFrame | None, DataFrame | None]:
        """Degree-split Pregel edge layout — (cold, hot, hub_ids).

        The north-rule's "degree-based edge splitting": a hub src's
        fan-out otherwise lands in the single hash(src) partition and
        its send-join output makes that task the superstep straggler
        (tool vertices here have degree ~|E|/|tools|). Split:

        * ``cold`` — edges whose src out-degree <= threshold, laid out
          like :meth:`pregel_edges` (zero-shuffle co-partitioned send
          join against the id-partitioned state);
        * ``hot`` — the hub srcs' edges, repartitioned by ``dst`` so
          one hub's fan-out spreads across ALL partitions; the runner
          joins them against a broadcast of the hub state;
        * ``hub_ids`` — the hub vertex ids (column ``id``).

        ``hub_threshold`` None = auto: max(3 |E| / n_parts, 256) — a
        src must own ~3 partitions' worth of edges before it splits.
        The multiplier is empirical: the split pays two extra joins +
        a broadcast + a union per superstep, which only wins when the
        avoided straggler dominates. Interleaved sf0.1 WCC A/B: the
        events graph (max degree 1.64x the per-partition share)
        measured split 12.5-20.0 s vs unsplit 6.8-8.7 s — splitting
        LOST 1.8x; the user->tool link graph (each tool 3.2x the
        share) is the documented -31% split win. 3x separates the
        two. With the auto threshold at most ``n_parts / 3`` srcs can
        exceed it (their degrees sum to |E|), so the broadcast hub
        state stays bounded by n_parts rows at ANY graph scale.
        (hot, hub_ids) are (None, None) when no src qualifies.
        """
        key = ("pregel_layout", n_parts, hub_threshold)
        if key in self._pregel_edges:
            return self._pregel_edges[key]
        e = self.view(weight_property=True)
        # ONE pre-pass over the edges: the degree table gives both
        # |E| (sum of degrees — an O(|V|)-row aggregate, not a second
        # full edge scan) and the hub set
        deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("_d")).persist()
        thr = hub_threshold
        if thr is None:
            total = deg.agg(F.sum("_d")).collect()[0][0] or 0
            thr = max(3 * int(total) // n_parts, 256)
        hubs = deg.where(F.col("_d") > thr).select("src").persist()
        n_hubs = hubs.count()
        deg.unpersist()
        if n_hubs == 0:
            hubs.unpersist()
            out = (self.pregel_edges(n_parts), None, None)
        else:
            cold = (
                e.join(F.broadcast(hubs), "src", "left_anti")
                .repartition(n_parts, "src")
                .sortWithinPartitions("src")
                .persist()
            )
            hot = (
                e.join(F.broadcast(hubs), "src", "left_semi")
                .repartition(n_parts, "dst")
                .persist()
            )
            self._cached.extend([cold, hot, hubs])
            out = (cold, hot, hubs.select(F.col("src").alias("id")))
        self._pregel_edges[key] = out
        return out

    def degrees(self) -> DataFrame:
        return projection.degrees(self.edges)

    def node_count(self) -> int:
        return self.vertices().count()

    def edge_count(self) -> int:
        """|E| — memoized on the handle: the Pregel runner sizes its
        partition count from it, so every algorithm run after the
        first reuses the scan-free cached value."""
        if self._n_edges is None:
            self._n_edges = self.edges.count()
        return self._n_edges

    def with_node_property(self, result: DataFrame, how: str = "left") -> "Graph":
        """Mutate mode: append result columns to the node property DF."""
        base = self.nodes if self.nodes is not None else self.vertices()
        return Graph(
            name=self.name,
            edges=self.edges,
            nodes=base.join(result, "id", how),
            directed=self.directed,
        )

    def delete_relationships(self, rel_type: str) -> "Graph":
        """Drop one relationship type from the graph —
        GraphDeleteRelationshipProc (proc/catalog/.../
        GraphDeleteRelationshipProc.java) analog. Returns a new
        handle; the catalog caller re-registers it."""
        if "rel_type" not in self.edges.columns:
            raise ValueError("graph edges carry no rel_type column")
        return Graph(
            name=self.name,
            edges=self.edges.where(F.col("rel_type") != rel_type),
            nodes=self.nodes,
            directed=self.directed,
        )

    def remove_node_properties(self, *properties: str) -> "Graph":
        """GraphRemoveNodePropertiesProc analog — drop node property
        columns (never `id`)."""
        if self.nodes is None:
            raise ValueError("graph has no node properties")
        missing = [p for p in properties if p not in self.nodes.columns]
        if missing:
            raise ValueError(f"unknown node properties: {missing}")
        if "id" in properties:
            raise ValueError("cannot remove the id column")
        return Graph(
            name=self.name,
            edges=self.edges,
            nodes=self.nodes.drop(*properties),
            directed=self.directed,
        )

    def stream_node_properties(self, properties: list[str]) -> DataFrame:
        """(id, **properties) — GraphStreamNodePropertiesProc analog."""
        if self.nodes is None:
            raise ValueError("graph has no node properties")
        return self.nodes.select("id", *properties)

    def stream_relationship_properties(
        self, properties: list[str]
    ) -> DataFrame:
        """(src, dst, rel_type?, **properties) —
        GraphStreamRelationshipPropertiesProc analog."""
        base = [c for c in ("src", "dst", "rel_type") if c in self.edges.columns]
        return self.edges.select(*base, *properties)

    def persist(self, level: StorageLevel = StorageLevel.MEMORY_AND_DISK) -> "Graph":
        """Pin the edge table — iterative algorithms re-scan it every
        superstep, so one materialization amortizes across the run.
        On a cluster the same role is played by writing the canonical
        edge table once (Iceberg/parquet) and reading it back.
        """
        self.edges = self.edges.persist(level)
        self._cached.append(self.edges)
        return self

    def unpersist(self) -> None:
        for df in self._cached:
            df.unpersist()
        self._cached.clear()
        self._pregel_edges.clear()
        for g in self._derived.values():
            g.unpersist()
        self._derived.clear()


class GraphCatalog:
    """Session-scoped named-graph registry (GraphStoreCatalog.java:46-161)."""

    def __init__(self) -> None:
        self._graphs: dict[str, Graph] = {}

    def create(
        self,
        name: str,
        edges: DataFrame,
        nodes: DataFrame | None = None,
        orientation: str = "NATURAL",
        aggregation: str = "NONE",
        persist: bool = False,
    ) -> Graph:
        if name in self._graphs:
            raise ValueError(f"graph '{name}' already exists in the catalog")
        e = projection.orient(edges, orientation)
        e = projection.aggregate_parallel(e, aggregation)
        if "rel_type" not in e.columns:
            e = e.withColumn("rel_type", F.lit("REL"))
        if "weight" not in e.columns:
            e = e.withColumn("weight", F.lit(1.0))
        g = Graph(name=name, edges=e.select(*projection.EDGE_COLS), nodes=nodes,
                  directed=orientation != "UNDIRECTED")
        if persist:
            g.persist()
        self._graphs[name] = g
        return g

    def get(self, name: str) -> Graph:
        if name not in self._graphs:
            raise KeyError(f"graph '{name}' not found; known: {sorted(self._graphs)}")
        return self._graphs[name]

    def exists(self, name: str) -> bool:
        return name in self._graphs

    def list(self) -> list[str]:
        return sorted(self._graphs)

    def drop(self, name: str) -> None:
        g = self._graphs.pop(name, None)
        if g is None:
            raise KeyError(f"graph '{name}' not found")
        g.unpersist()

    def set(self, name: str, graph: Graph) -> None:
        """Replace a handle (mutate-mode re-registration)."""
        self._graphs[name] = graph
