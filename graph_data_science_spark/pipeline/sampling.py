"""Deterministic weighted corpus sampling for training-data pipelines.

Two operators over a document table:

* :func:`weighted_sample` — sample ``n`` documents WITHOUT replacement
  with probability proportional to a weight column (quality score,
  token count, ...), via A-Res priority sampling (Efraimidis &
  Spirakis 2006): each doc draws u in (0,1] and gets priority key
  ln(u)/w (monotone in u^(1/w)); the n LARGEST keys are the sample.
  The draw is a closed-form two-round LCG of (doc_id, seed) — the
  same integer-exact device as fastrp_exact — so the sample is
  deterministic, partition-independent, and reproducible in ANSI SQL.

* :func:`sample_to_token_budget` — take documents in priority order
  until a global token budget is filled (the "subsample the corpus to
  N training tokens" step). The selection rule is the global
  cumulative token sum over (key desc, doc_id) order; the
  implementation is the 100-TB two-phase shape: bucketize keys,
  aggregate token sums per bucket (one tiny shuffle), pick the
  threshold bucket on the driver, then run the exact cumulative
  window ONLY inside the boundary bucket — the global sort/window
  never materializes.

Weights must be > 0 to participate; rows with weight <= 0 or NULL are
excluded (same convention as GDS weighted degree, which sums only
positive weights).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_M31 = 2**31


def _uniform(id_col: str, seed: int):
    """u in (0, 1]: LCG rounds with one SQUARING round on the id,
    integer-exact in BIGINT arithmetic (every intermediate < 2^62 —
    ids reduced mod 2^31 before multiplying, and a*a < 2^62 — so no
    silent wraparound anywhere). The squaring makes the draw
    NONLINEAR in the seed: a purely affine LCG shifts every doc's u
    by a near-constant when the seed changes, leaving rankings
    almost intact; a*a decorrelates seeds properly."""
    a = F.pmod(
        F.pmod(F.col(id_col), F.lit(_M31)) * F.lit(2654435761)
        + F.lit(seed * 40503 + 12345),
        F.lit(_M31),
    )
    b = F.pmod(a * a, F.lit(_M31))
    c = F.pmod(b * F.lit(1103515245) + a, F.lit(_M31))
    return (c.cast("double") + F.lit(1.0)) / F.lit(float(_M31))


def _keyed(
    df: DataFrame, weight_col: str, id_col: str, seed: int
) -> DataFrame:
    key = F.log(_uniform(id_col, seed)) / F.col(weight_col)
    return df.where(F.col(weight_col) > 0).withColumn("sample_key", key)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    n: int,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """The n input rows with the largest A-Res priority keys, plus the
    ``sample_key`` column. orderBy().limit(n) plans as TakeOrdered —
    per-partition top-n then a single merge of n*parts rows, never a
    global sort — so the operator holds at any corpus size where n
    fits on the driver-adjacent merge (the standard top-k contract).
    """
    return (
        _keyed(df, weight_col, id_col, seed)
        .orderBy(F.desc("sample_key"), F.asc(id_col))
        .limit(n)
    )


def stratified_sample(
    df: DataFrame,
    weight_col: str,
    strata_col: str,
    n_per_stratum: int,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Per-stratum A-Res weighted sample: the ``n_per_stratum`` rows
    with the largest priority keys WITHIN each value of
    ``strata_col`` (the per-language / per-domain quota sampler).
    One shuffle keyed by the stratum; the per-stratum top-n runs as a
    rank window inside each partition — hot strata are bounded by the
    window's streaming top-n, not a sort of the whole corpus."""
    w = Window.partitionBy(strata_col).orderBy(
        F.desc("sample_key"), F.asc(id_col)
    )
    return (
        _keyed(df, weight_col, id_col, seed)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )


def sample_to_token_budget(
    df: DataFrame,
    token_budget: int,
    weight_col: str,
    token_col: str,
    id_col: str = "doc_id",
    seed: int = 42,
    n_buckets: int = 1024,
) -> DataFrame:
    """Documents in priority order (key desc, id asc) whose running
    token total stays within ``token_budget``; the first document is
    always taken even if it alone exceeds the budget (so the result
    is non-empty whenever the input is).

    Selection rule == the naive global cumulative-sum window; plan ==
    two-phase threshold: per-bucket token totals (one |buckets|-row
    aggregate), driver picks the boundary bucket, exact window only
    over that bucket's rows. Keys are ln(u)/w <= 0; bucket =
    floor(-key * n_buckets / span) computed from the observed key
    range so the histogram adapts to the weight scale.
    """
    keyed = _keyed(df, weight_col, id_col, seed).persist()
    try:
        bounds = keyed.agg(
            F.min("sample_key").alias("lo"), F.max("sample_key").alias("hi")
        ).collect()[0]
        if bounds["lo"] is None:
            return keyed.withColumn("cum_tokens", F.col(token_col).cast("long"))
        lo, hi = float(bounds["lo"]), float(bounds["hi"])
        span = (hi - lo) or 1.0
        # bucket 0 = highest keys (sampled first)
        bucket = F.least(
            F.lit(n_buckets - 1),
            F.floor((F.lit(hi) - F.col("sample_key")) / F.lit(span) * n_buckets),
        ).cast("int")
        b = keyed.withColumn("_bkt", bucket)
        per_bucket = (
            b.groupBy("_bkt")
            .agg(F.sum(F.col(token_col).cast("long")).alias("_toks"))
            .orderBy("_bkt")
            .collect()
        )
        run, boundary = 0, None
        for r in per_bucket:
            if run + r["_toks"] > token_budget:
                boundary = r["_bkt"]
                break
            run += r["_toks"]
        if boundary is None:
            # whole corpus fits the budget
            w = Window.orderBy(F.desc("sample_key"), F.asc(id_col)).rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
            return b.select(
                df.columns + [F.col("sample_key")]
            ).withColumn("cum_tokens", F.sum(F.col(token_col).cast("long")).over(w))
        whole = b.where(F.col("_bkt") < boundary)
        # exact pass over the boundary bucket only — its row count is
        # ~|corpus|/n_buckets, the single-partition window is bounded
        w = Window.orderBy(F.desc("sample_key"), F.asc(id_col)).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        edge = (
            b.where(F.col("_bkt") == boundary)
            .withColumn("_cum", F.sum(F.col(token_col).cast("long")).over(w))
            .where(
                (F.col("_cum") + F.lit(run) <= token_budget)
                # first-doc guarantee when even doc #1 busts the budget
                | ((F.lit(run) == 0) & (F.col("_cum") == F.col(token_col).cast("long")))
            )
            .drop("_cum")
        )
        picked = whole.unionByName(edge)
        wofull = Window.orderBy(F.desc("sample_key"), F.asc(id_col)).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return picked.select(df.columns + [F.col("sample_key")]).withColumn(
            "cum_tokens", F.sum(F.col(token_col).cast("long")).over(wofull)
        )
    finally:
        keyed.unpersist()


def mix_corpus(
    df: DataFrame,
    targets: dict[str, float],
    source_col: str = "source",
    weight_col: str | None = None,
    id_col: str = "doc_id",
    seed: int = 11,
) -> DataFrame:
    """Deterministic downsampling to a target source mixture (the
    Pile/DoReMi-style "data mixing" step of a training pipeline).

    ``targets`` maps source -> desired share of the OUTPUT corpus,
    measured in ``weight_col`` mass (tokens, chars, ...) or doc count
    when ``weight_col`` is None; shares are normalized to sum to 1.
    Sources absent from ``targets`` are dropped. No upsampling: the
    output is sized to the binding source — N = min_s T_s / w_s with
    T_s the current mass of source s — giving per-source acceptance
    rate r_s = w_s * N / T_s <= 1 (the binding source keeps
    everything). A document is kept when its deterministic LCG
    uniform u(doc_id) <= r_s, so the EXPECTED output mixture equals
    the target and the sample is reproducible in ANSI SQL,
    partition-order independent.

    Masses are summed in integer arithmetic (exact,
    order-independent) and cast to double once, so the acceptance
    rates are bit-identical across engines and partitionings.

    Scale shape: one |sources|-row aggregate broadcast back onto the
    corpus — no global sort, no driver-side data collection. Rows
    with weight <= 0 or NULL are excluded (GDS positive-weight
    convention).
    """
    if not targets:
        raise ValueError("targets must be non-empty")
    if any(v < 0 for v in targets.values()):
        raise ValueError("target shares must be >= 0")
    total = float(sum(targets.values()))
    if total <= 0:
        raise ValueError("target shares must sum to > 0")
    shares = [(s, v / total) for s, v in sorted(targets.items())]
    spark = df.sparkSession
    tgt = spark.createDataFrame(shares, f"{source_col} string, _share double")

    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    base = df.where(w > 0) if weight_col is not None else df
    totals = base.groupBy(source_col).agg(F.sum(w).alias("_mass_l"))
    j = totals.join(F.broadcast(tgt), source_col).withColumn(
        "_mass", F.col("_mass_l").cast("double")
    )
    n_max = j.select(F.min(F.col("_mass") / F.col("_share")).alias("_n"))
    rates = j.crossJoin(F.broadcast(n_max)).select(
        source_col,
        (F.col("_share") * F.col("_n") / F.col("_mass")).alias("accept_rate"),
    )
    return (
        base.join(F.broadcast(rates), source_col)
        .where(_uniform(id_col, seed) <= F.col("accept_rate"))
        .select(
            *[F.col(c) for c in df.columns],
            F.round("accept_rate", 6).alias("accept_rate"),
        )
    )


def group_split(
    df: DataFrame,
    group_col: str = "conv_id",
    shares: tuple[float, ...] = (0.9, 0.05, 0.05),
    names: tuple[str, ...] = ("train", "val", "test"),
    seed: int = 17,
) -> DataFrame:
    """Leakage-safe train/val/test assignment -> the input plus a
    `split` column, constant within each ``group_col`` value.

    Splitting documents i.i.d. leaks near-duplicate rows of the same
    conversation across the train/eval boundary; the standard fix is
    to hash the GROUP key so every row of a conversation lands in the
    same split (the group-wise analog of the reference's
    splitRelationships holdout, algo/.../SplitRelationships — see
    algorithms/walking.py for the edge-level version).

    The draw is u = int(first 8 hex chars of md5(group || '|' ||
    seed)) / 2^32 — engine-portable (md5 and hex parse identically in
    Spark and ANSI SQL), uniform on [0,1), and independent of row
    order/partitioning. Split k is chosen when u falls in k's
    cumulative-share interval; shares must sum to 1 (+-1e-9).

    100-TB shape: a pure column expression — no shuffle, no join, no
    state; the split column costs one md5 per row inside the scan.
    """
    if len(shares) != len(names) or not names:
        raise ValueError("shares and names must be same nonzero length")
    if any(s < 0 for s in shares):
        raise ValueError("shares must be >= 0")
    if abs(sum(shares) - 1.0) > 1e-9:
        raise ValueError("shares must sum to 1")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.col(group_col).cast("string"), F.lit(str(seed)))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        .cast("double")
        / F.lit(float(2**32))
    )
    cum = 0.0
    branches = []
    for name, s in zip(names[:-1], shares[:-1]):
        cum += s
        branches.append((cum, name))
    expr = F.lit(names[-1])
    for cum, name in reversed(branches):
        expr = F.when(u < F.lit(cum), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def source_caps(
    df: DataFrame,
    cap: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 17,
) -> DataFrame:
    """Hard per-source document cap — the per-domain downsampling
    step of web-corpus pipelines (cap every domain/source at N docs
    so megasites don't dominate the mixture; CCNet/RefinedWeb-style).

    Keeps a deterministic uniform subset: documents rank within
    their source by the seeded LCG draw (ties by id), and rank <= cap
    survives. Returns (id, source, src_rank) for the kept rows.

    Scale shape: a naive ROW_NUMBER over each source funnels a
    billion-row domain through ONE task; instead rank locally per
    (source, input partition) and discard past `cap` FIRST — the
    global ranking then runs over <= cap x n_partitions rows per
    source (exact two-stage top-k, same survivors as the single
    window).
    """
    if cap < 1:
        raise ValueError("cap must be >= 1")
    from pyspark.sql import Window

    u = _uniform(id_col, seed)
    base = df.select(
        F.col(id_col), F.col(source_col), u.alias("_u")
    ).withColumn("_pid", F.spark_partition_id())
    w_local = Window.partitionBy(source_col, "_pid").orderBy("_u", id_col)
    pruned = (
        base.withColumn("_lrn", F.row_number().over(w_local))
        .where(F.col("_lrn") <= cap)
        .drop("_lrn", "_pid")
    )
    w_global = Window.partitionBy(source_col).orderBy("_u", id_col)
    return (
        pruned.withColumn("src_rank", F.row_number().over(w_global))
        .where(F.col("src_rank") <= cap)
        .select(id_col, source_col, "src_rank")
    )


def temperature_mix(
    df: DataFrame,
    temperature: float,
    source_col: str = "source",
    weight_col: str | None = None,
    id_col: str = "doc_id",
    seed: int = 23,
) -> DataFrame:
    """Temperature-scaled source mixing — the multilingual/multi-
    source sampling rule q_s ∝ p_s^(1/T) (multinomial sampling with
    temperature; T=1 keeps natural proportions, T→∞ approaches
    uniform-over-sources). The standard knob for upweighting tail
    sources without explicit per-source targets.

    Output (id, source, accept_rate): kept rows after deterministic
    LCG acceptance at rate r_s = q_s·N/m_s with N sized to the
    binding source (no upsampling — identical contract to
    :func:`mix_corpus`, with targets DERIVED from current masses
    instead of caller-supplied). Rates round to 9 dp so the accept
    decision replays bit-stably in ANSI SQL despite pow().

    Scale shape: one |sources|-row aggregate, a driver-side
    O(|sources|) rate table broadcast back — no global sort.
    """
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    spark = df.sparkSession
    wexpr = (
        F.count(F.lit(1)).cast("long")
        if weight_col is None
        else F.sum(F.col(weight_col).cast("long"))
    )
    masses = {
        r["source"]: int(r["mass"])
        for r in df.groupBy(F.col(source_col).alias("source"))
        .agg(wexpr.alias("mass"))
        .collect()
        if r["mass"] and r["mass"] > 0
    }
    if not masses:
        return spark.createDataFrame(
            [], f"{id_col} long, {source_col} string, accept_rate double"
        )
    total = float(sum(masses.values()))
    q = {s: (m / total) ** (1.0 / temperature) for s, m in masses.items()}
    qsum = sum(q.values())
    q = {s: v / qsum for s, v in q.items()}
    n_out = min(masses[s] / q[s] for s in masses)
    # 9-dp rounding must replay bit-stably against SQL ROUND. DuckDB's
    # ROUND(x, 9) is std::round(x * 1e9) / 1e9 on the binary double —
    # half-AWAY-from-zero on the scaled value — while Python's
    # round(x, 9) is correctly-rounded half-EVEN on the true decimal
    # value; a rate on (or within one ulp of) a 9-dp boundary flips
    # between the two. Replicate the SQL formula exactly: same
    # multiply, exact-fraction half-away compare (math.modf is exact),
    # same divide — IEEE doubles both sides.
    import math

    def _r9(x: float) -> float:
        v = x * 1e9
        frac, whole = math.modf(v)
        return (whole + (1.0 if frac >= 0.5 else 0.0)) / 1e9

    rates = [(s, _r9(q[s] * n_out / masses[s])) for s in sorted(masses)]
    rate_df = spark.createDataFrame(rates, f"{source_col} string, _rate double")
    u = _uniform(id_col, seed)
    return (
        df.select(id_col, source_col)
        .join(F.broadcast(rate_df), source_col)
        .where(u <= F.col("_rate"))
        .select(id_col, source_col, F.col("_rate").alias("accept_rate"))
    )
