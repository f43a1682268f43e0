"""Transcript-table source with table-format dispatch.

The north-rule input is an Iceberg table of multi-turn transcripts
``(conv_id string, turn_idx int, role string, text string,
tool string, ts timestamp)``. On a real cluster an Iceberg table is
consumed through the session catalog — ``spark.read.table(
"catalog.db.transcripts")`` — and the table format (Iceberg, Delta,
Hive parquet) is owned by the catalog configuration, not the engine:
that is the Spark-native seam, and it is what this module
dispatches on. A filesystem path reads as parquet so the same entry
point serves the sandbox test data and any exported snapshot.

Reference analog: native projection's store scan
(`proc/catalog/src/main/java/org/neo4j/gds/catalog/GraphCreateProc.java:70-99`
reads whatever store the DBMS mounts); here Catalyst owns predicate
pushdown / column pruning / partition pruning into the source —
Iceberg's manifest-level file skipping composes with the same plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from graph_data_science_spark import projection
from graph_data_science_spark.catalog import Graph

#: the input_hint schema, for validation
TRANSCRIPT_COLUMNS = ("conv_id", "turn_idx", "role", "text", "tool", "ts")


def read_transcripts(spark: SparkSession, source: str) -> DataFrame:
    """Load a transcript table from a catalog table identifier
    (Iceberg/Delta/Hive — e.g. ``iceberg_cat.chat.transcripts``) or a
    filesystem path (parquet). Dispatch rule: anything with a path
    separator or a ``.parquet`` suffix is a path; otherwise it is a
    table identifier resolved by the session catalog."""
    if "/" in source or source.endswith(".parquet"):
        df = spark.read.parquet(source)
    else:
        df = spark.read.table(source)
    missing = [c for c in TRANSCRIPT_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(
            f"transcript source `{source}` is missing columns {missing}; "
            f"expected {list(TRANSCRIPT_COLUMNS)}"
        )
    return df


def transcript_graph(
    spark: SparkSession, source: str, name: str = "transcripts"
) -> Graph:
    """Source -> canonical link graph in one call: REPLY edges
    (turn i -> turn i+1 per conversation) + INVOKES edges
    (turn -> tool vertex), via projection.transcript_edges."""
    return Graph(
        name=name,
        edges=projection.transcript_edges(read_transcripts(spark, source)),
        directed=True,
    )

def conversation_dedup(df: DataFrame) -> DataFrame:
    """Exact conversation-level dedup -> (conv_id, group_id,
    is_duplicate): two conversations are duplicates when their full
    turn-text sequences are identical under stable turn ordering
    (the north rule's per-turn text-equality invariant, lifted to a
    whole-conversation fingerprint).

    Fingerprint = md5 of the turn texts joined by the US separator
    (0x1f) in turn_idx order, nulls normalized to ''. group_id is the
    minimum conv_id sharing a fingerprint (same representative rule as
    pipeline.dedup.exact_duplicates). A turn text CONTAINING 0x1f
    could alias a different turn split to the same fingerprint —
    length-prefix the parts if the corpus can carry control bytes.

    100-TB shape: one map-side-combining groupBy keyed by conv_id
    (collect_list partials merge per partition; conversations are
    bounded, so the per-group array is too), then the representative
    is a min-over-window keyed by the 16-byte fingerprint — a single
    pass over the input (a groupBy+self-join here would rescan the
    table to rebuild the fingerprints; the window exchanges only
    (conv_id, hash) rows).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("turn_idx").alias("i"),
                F.coalesce(F.col("text"), F.lit("")).alias("text"),
            )
        )
    )
    per = df.groupBy("conv_id").agg(
        F.md5(
            F.array_join(F.transform(arr, lambda s: s["text"]), "\x1f")
        ).alias("_h")
    )
    return per.select(
        "conv_id",
        F.min("conv_id").over(Window.partitionBy("_h")).alias("group_id"),
    ).select(
        "conv_id",
        "group_id",
        (F.col("conv_id") != F.col("group_id")).alias("is_duplicate"),
    )


def transcript_validate(df: DataFrame) -> DataFrame:
    """Per-conversation data-quality report -> (conv_id, n_turns,
    dense_turns, ts_monotone, n_null_text, role_alternation_frac).

    The ingest-validation pass a transcript pipeline runs before any
    graph is projected: turn indexes must be dense 0..n-1 (dense_turns),
    timestamps must be non-decreasing in turn order (ts_monotone),
    and role_alternation_frac reports how often consecutive turns
    switch speaker (NULL for single-turn conversations).

    100-TB shape: one window keyed by conv_id (lag of ts/role) fused
    with one combining groupBy on the same key — a single shuffle, and
    the window's sort feeds the aggregation without a second exchange.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    t = df.select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        us.alias("_us"),
    ).select(
        "*",
        F.lag("_us").over(w).alias("_prev_us"),
        F.lag("role").over(w).alias("_prev_role"),
    )
    return t.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        (
            (F.min("turn_idx") == F.lit(0))
            & (F.max("turn_idx") == (F.count(F.lit(1)) - 1).cast("int"))
            & (F.count_distinct("turn_idx") == F.count(F.lit(1)))
        ).alias("dense_turns"),
        F.coalesce(
            F.every(
                F.when(
                    F.col("_prev_us").isNotNull(),
                    F.col("_us") >= F.col("_prev_us"),
                )
            ),
            F.lit(True),
        ).alias("ts_monotone"),
        F.sum(F.when(F.col("text").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_null_text"),
        F.round(
            F.avg(
                F.when(
                    F.col("_prev_role").isNotNull(),
                    (F.col("role") != F.col("_prev_role")).cast("double"),
                )
            ),
            6,
        ).alias("role_alternation_frac"),
    )


def turn_latency(df: DataFrame) -> DataFrame:
    """Reply-latency distribution by responding role -> (role, n_gaps,
    avg_gap_us, p50_gap_us, p95_gap_us).

    Gap = the responder's ts minus the previous turn's ts within the
    same conversation (turn_idx order), attributed to the LATER
    turn's role — "how long do users wait for the assistant" and
    vice versa. Percentiles are exact interpolated (percentile_cont
    semantics, value-identical to DuckDB quantile_cont); at 100 TB
    swap F.percentile for F.percentile_approx — same plan shape.

    100-TB shape: one conv-keyed window for the lag, then one
    combining groupBy over a handful of roles.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gaps = (
        df.select("conv_id", "turn_idx", "role", us.alias("_us"))
        .select("role", (F.col("_us") - F.lag("_us").over(w)).alias("gap"))
        .where(F.col("gap").isNotNull())
    )
    return gaps.groupBy("role").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.round(F.avg("gap"), 4).alias("avg_gap_us"),
        F.round(F.percentile("gap", F.lit(0.5)), 4).alias("p50_gap_us"),
        F.round(F.percentile("gap", F.lit(0.95)), 4).alias("p95_gap_us"),
    )


def tool_sequences(df: DataFrame, top_n: int = 30) -> DataFrame:
    """Most frequent consecutive tool pairs across conversations ->
    (rank, tool_1, tool_2, n): which tool follows which — the
    sequence-mining view of agent behavior (tool-call Markov edges).

    Pairs are consecutive turns within a conversation in turn_idx
    order where both turns carry a tool; rank orders by count desc,
    ties by (tool_1, tool_2).

    100-TB shape: one conv-keyed window (lead), one combining groupBy
    on the pair (cardinality = |tools|^2, tiny), then a distributed
    TakeOrdered for the top-N — no global sort materialization.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    pairs = (
        df.select("conv_id", "turn_idx", "tool")
        .select(
            F.col("tool").alias("tool_1"),
            F.lead("tool").over(w).alias("tool_2"),
        )
        .where(F.col("tool_1").isNotNull() & F.col("tool_2").isNotNull())
    )
    counts = pairs.groupBy("tool_1", "tool_2").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    top = counts.orderBy(F.desc("n"), "tool_1", "tool_2").limit(top_n)
    rw = Window.orderBy(F.desc("n"), "tool_1", "tool_2")
    return top.select(
        F.row_number().over(rw).cast("int").alias("rank"),
        "tool_1",
        "tool_2",
        "n",
    )


def render_chat(df: DataFrame) -> DataFrame:
    """Render conversations into training text -> (conv_id, n_turns,
    n_tokens, text): each turn becomes ``<|role|> text`` and turns
    join with newlines in turn_idx order — the chat-template pass
    that turns a transcript table into an SFT corpus (feed the result
    to corpus_filter / pack_sequences / dedup downstream).

    Null turn texts render as empty strings so the template stays
    positional. n_tokens counts whitespace tokens of the rendered
    text (role markers included, matching what a tokenizer sees).

    100-TB shape: one map-side-combining groupBy keyed by conv_id;
    the per-turn render is a JVM string expression inside the scan.
    Conversations are bounded (turn counts, not corpus size), so the
    collected per-group array is too.
    """
    from pyspark.sql import functions as F

    from graph_data_science_spark.pipeline.text import token_count

    line = F.concat(
        F.lit("<|"),
        F.col("role"),
        F.lit("|> "),
        F.coalesce(F.col("text"), F.lit("")),
    )
    arr = F.array_sort(
        F.collect_list(
            F.struct(F.col("turn_idx").alias("i"), line.alias("line"))
        )
    )
    return (
        df.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            F.array_join(
                F.transform(arr, lambda s: s["line"]), "\n"
            ).alias("text"),
        )
        .select(
            "conv_id",
            "n_turns",
            token_count(F.col("text")).cast("long").alias("n_tokens"),
            "text",
        )
    )


def render_chat_masked(
    df: DataFrame, loss_roles: tuple[str, ...] = ("assistant",)
) -> DataFrame:
    """:func:`render_chat` plus **loss-mask spans** -> (conv_id,
    n_turns, text, loss_spans) where ``loss_spans`` is an array of
    ``(start, end)`` 0-based char offsets into ``text`` covering
    exactly the CONTENT of each loss-bearing turn (default: assistant
    turns), excluding its ``<|role|> `` marker — the span layout an
    SFT trainer consumes to mask prompt tokens out of the loss.

    Invariant (pinned by tests and the driver oracle):
    ``text[start:end]`` of every span equals that turn's text
    verbatim, so ``sum(end - start)`` over a conversation equals the
    summed length of its loss-role turn texts.

    100-TB shape: identical to render_chat — ONE map-side-combining
    groupBy keyed by conv_id; the offset fold is a JVM higher-order
    ``aggregate`` over the bounded per-conversation turn array, no
    Python row path.
    """
    from pyspark.sql import functions as F

    line = F.concat(
        F.lit("<|"),
        F.col("role"),
        F.lit("|> "),
        F.coalesce(F.col("text"), F.lit("")),
    )
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("turn_idx").alias("i"),
                F.col("role").alias("role"),
                line.alias("line"),
            )
        )
    )
    grouped = df.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        arr.alias("_turns"),
    )
    # fold turns -> (running char offset, spans); separator is the
    # "\n" array_join inserts between lines (+1 per step)
    is_loss = lambda s: s["role"].isin(*loss_roles)  # noqa: E731
    span = lambda a, s: F.struct(  # noqa: E731
        (a["off"] + F.length(s["role"]) + F.lit(5)).alias("start"),
        (a["off"] + F.length(s["line"])).alias("end"),
    )
    folded = F.aggregate(
        F.col("_turns"),
        F.struct(
            F.lit(0).cast("long").alias("off"),
            F.array().cast("array<struct<start:long,end:long>>").alias("spans"),
        ),
        lambda a, s: F.struct(
            (a["off"] + F.length(s["line"]) + F.lit(1)).alias("off"),
            F.when(is_loss(s), F.concat(a["spans"], F.array(span(a, s))))
            .otherwise(a["spans"])
            .alias("spans"),
        ),
    )
    return grouped.select(
        "conv_id",
        "n_turns",
        F.array_join(
            F.transform(F.col("_turns"), lambda s: s["line"]), "\n"
        ).alias("text"),
        folded["spans"].alias("loss_spans"),
    )


def tool_affinity(df: DataFrame, top_n: int = 50) -> DataFrame:
    """Pointwise mutual information between conversations' users and
    tools -> (rank, conv_id, tool, n_joint, pmi): which tools a
    conversation over/under-uses relative to the corpus —
    ``pmi = ln(c(conv,tool) * N / (c(conv) * c(tool)))`` over turn
    counts. The co-occurrence-mining view of agent behavior; positive
    PMI = affinity, ranks by pmi desc (ties by conv_id, tool).

    100-TB shape: three map-side-combining groupBys (pair, conv,
    tool — each no wider than its key space), one join keyed by
    conv_id (AQE-planned) plus a broadcast of the tiny tool counts
    and the scalar N; top-N is a distributed TakeOrdered.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    t = df.where(F.col("tool").isNotNull()).select("conv_id", "tool")
    c_ut = t.groupBy("conv_id", "tool").agg(
        F.count(F.lit(1)).cast("long").alias("n_joint")
    )
    c_u = t.groupBy("conv_id").agg(F.count(F.lit(1)).alias("_cu"))
    c_t = t.groupBy("tool").agg(F.count(F.lit(1)).alias("_ct"))
    n = t.agg(F.count(F.lit(1)).alias("_n"))
    pmi = F.round(
        F.log(
            (F.col("n_joint") * F.col("_n")).cast("double")
            / (F.col("_cu") * F.col("_ct")).cast("double")
        ),
        6,
    )
    scored = (
        c_ut.join(c_u, "conv_id")
        .join(F.broadcast(c_t), "tool")
        .crossJoin(F.broadcast(n))
        .select("conv_id", "tool", "n_joint", pmi.alias("pmi"))
    )
    top = scored.orderBy(F.desc("pmi"), "conv_id", "tool").limit(top_n)
    rw = Window.orderBy(F.desc("pmi"), "conv_id", "tool")
    return top.select(
        F.row_number().over(rw).cast("int").alias("rank"),
        "conv_id",
        "tool",
        "n_joint",
        "pmi",
    )


def tool_entropy(df: DataFrame) -> DataFrame:
    """Per-conversation Shannon entropy of the tool distribution ->
    (conv_id, n_turns, n_tools, entropy): how diverse a
    conversation's tool usage is (0 = one tool; ln(k) = uniform over
    k). Null-tool turns are excluded from the distribution.

    Determinism: each -p*ln(p) term rounds to 9 dp and sums as
    DECIMAL (order-independent), entropy rounds to 6 dp — value-exact
    in ANSI SQL at any parallelism.

    100-TB shape: two map-side-combining groupBys ((conv, tool) then
    conv); the shuffle carries only partial counts.
    """
    from pyspark.sql import functions as F

    t = df.where(F.col("tool").isNotNull()).select("conv_id", "tool")
    c = t.groupBy("conv_id", "tool").agg(F.count(F.lit(1)).alias("_c"))
    tot = c.groupBy("conv_id").agg(F.sum("_c").alias("_n"))
    p = F.col("_c").cast("double") / F.col("_n").cast("double")
    term = F.round(-p * F.log(p), 9).cast("decimal(18,9)")
    return (
        c.join(tot, "conv_id")
        .select("conv_id", F.col("_n"), term.alias("_h"))
        .groupBy("conv_id")
        .agg(
            F.first("_n").cast("long").alias("n_turns"),
            F.count(F.lit(1)).cast("long").alias("n_tools"),
            F.round(F.sum("_h").cast("double"), 6).alias("entropy"),
        )
    )


def conversation_stats(df: DataFrame) -> DataFrame:
    """Per-conversation rollup over the canonical transcript table ->
    (conv_id, n_turns, n_user_turns, n_assistant_turns, n_tools,
    total_tokens, avg_turn_tokens, duration_us).

    The transcript-side "what's in this corpus" report: turn counts by
    role, distinct tools invoked, whitespace-token mass, and the
    conversation's wall-clock span in epoch microseconds.

    100-TB shape: ONE map-side-combining groupBy keyed by conv_id —
    token counting and role flags are pure JVM column exprs inside the
    scan, so the shuffle carries only partial aggregates. Distinct
    tools use a per-group exact count_distinct (two-phase under AQE);
    at extreme cardinality swap for approx_count_distinct with the
    same plan shape.
    """
    from pyspark.sql import functions as F

    from graph_data_science_spark.pipeline.text import token_count

    n_tok = F.when(
        F.col("text").isNotNull(), token_count(F.col("text"))
    ).otherwise(F.lit(0))
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    return (
        df.select(
            "conv_id",
            F.when(F.col("role") == "user", 1).otherwise(0).alias("_u"),
            F.when(F.col("role") == "assistant", 1).otherwise(0).alias("_a"),
            "tool",
            n_tok.alias("_t"),
            us.alias("_us"),
        )
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            F.sum("_u").cast("long").alias("n_user_turns"),
            F.sum("_a").cast("long").alias("n_assistant_turns"),
            F.count_distinct("tool").cast("long").alias("n_tools"),
            F.sum("_t").cast("long").alias("total_tokens"),
            F.round(
                F.sum("_t").cast("double") / F.count(F.lit(1)).cast("double"), 6
            ).alias("avg_turn_tokens"),
            (F.max("_us") - F.min("_us")).cast("long").alias("duration_us"),
        )
    )
