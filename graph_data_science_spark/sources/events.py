"""Event-log source: view an event stream as transcripts, derive the link graph.

The engine's canonical input is a transcript table
``(conv_id, turn_idx, role, text, tool, ts)`` (BASELINE.json
input_hint). An event log ``(event_id, ts, user_id, event_type,
value, props)`` is isomorphic to it: a user's event stream is a
conversation, the per-user event sequence number is the turn index,
and the event type is the invoked tool. This module materializes that
mapping and derives the canonical edge table from it with **oracle-
friendly numeric vertex ids** (closed-form, reproducible in any ANSI
SQL engine — no hash functions), so every algorithm result can be
verified row-for-row against an independent SQL oracle.

Vertex id scheme:
  * turn vertex:  ``user_id * 1_000_000 + turn_idx``  (> 0)
  * tool vertex:  ``-rank(event_type)`` over the sorted distinct
    event types  (< 0, disjoint from turn ids)

Edge rules (the same two rules as projection.transcript_edges,
reference analog: native projection GraphCreateProc.java:70-99):
  * REPLY:   (user, turn i) -> (user, turn i+1)   — a lead() window,
    one skew-free shuffle keyed by user_id.
  * INVOKES: (user, turn i) -> tool(event_type)   — tool vertices are
    the deliberate hub-skew source (zipf-ish popularity).

Scale: at 10^12 events the only shuffle here is the per-user window
(users are high-cardinality, so partitions stay balanced); the tool
dimension is tiny and broadcast by Catalyst/AQE automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graph_data_science_spark.catalog import Graph

#: multiplier giving each user a disjoint turn-vertex id range
TURN_ID_BASE = 1_000_000

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def event_turns(events: DataFrame) -> DataFrame:
    """(user_id, event_id, ts, event_type, turn_idx, vid).

    turn_idx = dense per-user sequence number ordered by (ts,
    event_id) — the stable turn ordering the input_hint mandates;
    event_id breaks timestamp ties deterministically.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = events.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        "value",
        "props",
        (F.row_number().over(w) - 1).alias("turn_idx"),
    )
    # overflow guard: a user with >= TURN_ID_BASE turns would silently
    # collide into the next user's vid range — fail loudly instead
    # (zero extra jobs: the assert is a column evaluated in-flight)
    guard = F.assert_true(
        F.col("turn_idx") < F.lit(TURN_ID_BASE),
        F.concat(
            F.lit(f"turn_idx overflow: user "),
            F.col("user_id").cast("string"),
            F.lit(f" has >= {TURN_ID_BASE} events; raise TURN_ID_BASE"),
        ),
    )
    return t.withColumn(
        "vid",
        F.when(guard.isNull(), F.col("user_id") * F.lit(TURN_ID_BASE) + F.col("turn_idx")),
    )


def events_as_transcripts(events: DataFrame) -> DataFrame:
    """Project the event log onto the canonical transcript schema
    (conv_id string, turn_idx int, role string, text string,
    tool string, ts timestamp) — the BASELINE.json input_hint shape."""
    t = event_turns(events)
    return t.select(
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.when(F.col("turn_idx") % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
        .alias("role"),
        F.col("props").alias("text"),
        F.col("event_type").alias("tool"),
        F.col("ts").alias("ts"),
    )


def tool_vertices(events: DataFrame) -> DataFrame:
    """(event_type, tool_vid) — negative ids by sorted rank.

    The distinct-type dimension is tiny; the global window is
    driver-cheap and the result broadcast-joins everywhere.
    """
    w = Window.orderBy("event_type")
    return (
        events.select("event_type")
        .distinct()
        .withColumn("tool_vid", (-F.row_number().over(w)).cast("long"))
    )


def events_edges(events: DataFrame, include_invokes: bool = True) -> DataFrame:
    """Canonical edge table (src, dst, rel_type, weight) from an event log."""
    t = event_turns(events)
    w = Window.partitionBy("user_id").orderBy("turn_idx")
    reply = (
        t.withColumn("_next", F.lead("vid").over(w))
        .where(F.col("_next").isNotNull())
        .select(
            F.col("vid").alias("src"),
            F.col("_next").alias("dst"),
            F.lit("REPLY").alias("rel_type"),
            F.lit(1.0).alias("weight"),
        )
    )
    if not include_invokes:
        return reply
    invokes = t.join(F.broadcast(tool_vertices(events)), "event_type").select(
        F.col("vid").alias("src"),
        F.col("tool_vid").alias("dst"),
        F.lit("INVOKES").alias("rel_type"),
        F.lit(1.0).alias("weight"),
    )
    return reply.unionByName(invokes)


def event_node_labels(events: DataFrame) -> DataFrame:
    """(id, labels array<string>) — 'Turn' for turn vertices, 'Tool'
    for tool vertices (the nodeLabels dimension of the projected
    graph; reference analog: NodeLabel projections in
    GraphCreateProc.java:70-99 / AlgoBaseConfig.nodeLabels)."""
    t = event_turns(events).select("vid")
    turns = t.select(F.col("vid").alias("id"), F.array(F.lit("Turn")).alias("labels"))
    tools = tool_vertices(events).select(
        F.col("tool_vid").alias("id"), F.array(F.lit("Tool")).alias("labels")
    )
    return turns.unionByName(tools)


def events_graph(
    spark: SparkSession,
    sf_dir: str,
    name: str = "events_graph",
    rel_types: list[str] | None = None,
    orientation: str = "NATURAL",
    persist: bool = True,
    with_labels: bool = False,
) -> Graph:
    """Catalog-style graph handle over the event-derived link graph."""
    from graph_data_science_spark import projection

    ev_df = load_table(spark, sf_dir, "events")
    edges = events_edges(ev_df)
    if rel_types:
        edges = edges.where(F.col("rel_type").isin(rel_types))
    edges = projection.orient(edges, orientation)
    nodes = event_node_labels(ev_df) if with_labels else None
    g = Graph(
        name=name, edges=edges, nodes=nodes, directed=orientation != "UNDIRECTED"
    )
    if persist:
        g.persist()
    return g


def user_tool_edges(events: DataFrame) -> DataFrame:
    """(src=user_id, dst=tool_vid) distinct bipartite edges — the
    substrate for node-similarity (users similar by tool usage)."""
    return (
        events.join(F.broadcast(tool_vertices(events)), "event_type")
        .select(
            F.col("user_id").alias("src"),
            F.col("tool_vid").alias("dst"),
            F.lit("USES").alias("rel_type"),
            F.lit(1.0).alias("weight"),
        )
        .dropDuplicates(["src", "dst"])
    )
