"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "pagerank": {supersteps, supersteps_per_sec, edges_per_sec, ...},
   "scaling": {cpus_low, cpus_high, ..., efficiency}}

The "scaling" block is the sandbox evidence for the north_rule's
N→4N-executor criterion: the same fixed-superstep PageRank job runs
at local[N] for N in SPARK_GRAFT_SCALING_LEVELS (default "1,4,16" —
two N→4N pairs), each level gated on a quiet host and launched in a
fresh JVM, on the same on-disk input. efficiency = (T_low / T_high)
/ (cpus_high / cpus_low), reported per pair together with the
machine's own CPU and memory-bandwidth scaling ceilings (see
BENCH.md for why the 4→16 pair is bounded by single-socket DRAM).
Skip with SPARK_GRAFT_SKIP_SCALING=1 when only per-query timings
are needed.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def make_spark(cpus: str, shuffle_partitions: int | None = None) -> SparkSession:
    n = int(cpus) if str(cpus).isdigit() else 32
    return (
        SparkSession.builder.appName("gds-spark-bench")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or max(n, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )


def timed_pagerank(spark: SparkSession, sf_dir: str, iters: int = 10) -> dict:
    """Fixed-superstep PageRank on the event-derived graph; graph
    build (projection + persist) timed separately from compute."""
    import time as _t

    from graph_data_science_spark.sources import events as ev

    t0 = _t.monotonic()
    g = ev.events_graph(spark, sf_dir)
    g.edge_count()  # materialize the persisted edge table
    build_sec = _t.monotonic() - t0
    out = _timed_pagerank_on_graph(spark, g, iters)
    out["build_sec"] = round(build_sec, 3)
    return out


def _timed_pagerank_on_graph(spark: SparkSession, g, iters: int, warmup: int = 0) -> dict:
    from graph_data_science_spark.algorithms.pagerank import PageRankConfig, pagerank

    n_edges = g.edge_count()  # also materializes the persisted edge DF
    if warmup:
        # equalize JVM JIT state across parallelism levels — without
        # this the level measured second inherits a warm JVM and the
        # efficiency ratio is meaningless
        wres = pagerank(
            spark, g, PageRankConfig(tolerance=0.0, max_iterations=warmup + 1)
        )
        # free the warmup run's final state blocks NOW — otherwise the
        # lazy ContextCleaner reclaims them mid-measurement as a
        # multi-second wall spike in a random superstep
        from graph_data_science_spark.pregel import _free_local_checkpoint

        _free_local_checkpoint(wres.state)
    t0 = time.monotonic()
    res = pagerank(
        spark, g, PageRankConfig(tolerance=0.0, max_iterations=iters + 1)
    )
    res.state.count()
    wall = time.monotonic() - t0
    g.unpersist()
    supersteps = len(res.metrics)
    iter_walls = sorted(m["wall_sec"] for m in res.metrics[1:]) or [wall / supersteps]
    steady = iter_walls[len(iter_walls) // 2]  # median, excluding superstep 0
    return {
        "edges": n_edges,
        "supersteps": supersteps,
        "wall_sec": round(wall, 3),
        "supersteps_per_sec": round(supersteps / wall, 4),
        "edges_per_sec": round(n_edges * supersteps / wall, 1),
        "steady_superstep_sec": round(steady, 3),
        "steady_edges_per_sec": round(n_edges / steady, 1),
    }


def scaling_edge_table(path: str, n_conversations: int) -> None:
    """Generate the deterministic synthetic transcript table (the
    north_rule input shape) and persist its derived edge table once,
    so both parallelism levels read the identical input."""
    import shutil

    from graph_data_science_spark import projection
    from graph_data_science_spark.datagen import generate_transcripts

    shutil.rmtree(path, ignore_errors=True)
    spark = make_spark(CPUS)
    tr = generate_transcripts(spark, n_conversations=n_conversations, seed=42)
    projection.transcript_edges(tr).write.mode("overwrite").parquet(path)
    spark.stop()


def timed_pagerank_on_parquet(
    spark: SparkSession, path: str, iters: int = 10, warmup: int = 3
) -> dict:
    from graph_data_science_spark.catalog import Graph

    edges = spark.read.parquet(path)
    g = Graph(name="scaling", edges=edges).persist()
    return _timed_pagerank_on_graph(spark, g, iters, warmup=warmup)


def run_headline(spark: SparkSession, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    headline = [
        "pagerank",
        "wcc_full",
        "label_propagation",
        "triangle_local",
        "degree_centrality",
        "node_similarity",
        "session_stats",
        "text_stats",
        "quality_score",
        "exact_duplicates",
        "minhash_lsh_candidates",
        "ann_lsh_topk",
    ]
    out: dict[str, float] = {}
    for name in headline:
        t0 = time.monotonic()
        df = qs[name](spark, sf_dir)
        df.count()
        out[name] = round(time.monotonic() - t0, 3)
    return out


def run_pipeline_block(spark: SparkSession, sf_dir: str) -> dict[str, float]:
    """Timings for the round-3 training-pipeline operator family —
    reported SEPARATELY from the headline sum so the headline stays
    comparable across rounds (the headline list is frozen at r1's)."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = [
        "dedup_spans",
        "verify_candidates",
        "dedup_clusters",
        "pii_scrub",
        "repetition_stats",
        "doc_chunks",
        "tfidf_keywords",
        "corpus_stats",
        "mix_corpus",
        "quantize_embeddings",
        "decontaminate",
        "semantic_dedup",
        "asof_join",
        "range_join",
        "time_rollup",
        "vocab_coverage",
        "lm_perplexity",
        "bpe_pair_counts",
        "conversation_stats",
        "conversation_dedup",
        "pack_sequences",
        "kmeans_clusters",
        "ccnet_buckets",
        "corpus_filter",
        "render_chat",
        "quality_classifier",
        "dsir_weights",
        "binary_auc",
        "char_entropy",
        "corpus_divergence",
        "categorical_jaccard",
        "hard_negatives",
        "knn_label_agreement",
        "assortativity",
        "reciprocity",
    ]
    out: dict[str, float] = {}
    for name in names:
        t0 = time.monotonic()
        qs[name](spark, sf_dir).count()
        out[name] = round(time.monotonic() - t0, 3)
    return out


def run_loground_block(spark: SparkSession, sf_dir: str) -> dict[str, float]:
    """The O(log n)-round machinery (Euler-tour biconnectivity,
    Steiner backtrack, HashGNN iterations) — constant-heavy by
    construction (each round is several Spark jobs), so regressions
    hide unless timed every round. Reported separately from the
    headline sum (list frozen at r1's). Plan-audit notes in BENCH.md
    ("Log-round block")."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    out: dict[str, float] = {}
    for name in ("bridges", "steiner_tree", "hashgnn"):
        t0 = time.monotonic()
        qs[name](spark, sf_dir).count()
        out[name] = round(time.monotonic() - t0, 3)
    return out


def make_sf10(spark: SparkSession, src_dir: str, dst_dir: str) -> None:
    """Synthesize the 10x (sf~1.0) dataset ONCE from the sf0.1
    tables the headline reads (events / documents / embeddings):
    10 deterministic copies with disjoint id offsets. Entity counts
    scale 10x while the tool/event-type vocabulary stays fixed, so
    hub degrees grow 10x — the skew-handling paths get a genuinely
    harder input, not just more of the same."""
    from pyspark.sql import functions as F

    offsets = {
        "events": {"user_id": 10_000_000, "event_id": 1_000_000_000},
        "documents": {"doc_id": 1_000_000_000},
        "embeddings": {"vec_id": 1_000_000_000},
    }
    # the _DONE marker embeds a fingerprint of the SOURCE tables, so a
    # regenerated sf0.1 invalidates the cached sf10 instead of quietly
    # mixing scales
    fp = "|".join(
        f"{t}:{os.path.getmtime(p):.0f}:{os.path.getsize(p)}"
        for t in sorted(offsets)
        for p in [os.path.join(src_dir, f"{t}.parquet")]
    )
    done = os.path.join(dst_dir, "_DONE")
    if os.path.exists(done):
        with open(done) as fh:
            if fh.read().strip() == fp:
                return
        print("make_sf10: source tables changed — regenerating sf10 data")
    import shutil

    shutil.rmtree(dst_dir, ignore_errors=True)
    os.makedirs(dst_dir, exist_ok=True)
    for table, offs in offsets.items():
        df = spark.read.parquet(os.path.join(src_dir, f"{table}.parquet"))
        # a source id at or above its copy offset would collide across
        # copies and silently merge them, distorting the 10x datapoint
        bounds = df.agg(
            *[F.max(F.col(c)).alias(c) for c in offs]
        ).collect()[0]
        for c, off in offs.items():
            if bounds[c] is not None and int(bounds[c]) >= off:
                raise RuntimeError(
                    f"make_sf10: {table}.{c} max id {bounds[c]} >= copy "
                    f"offset {off} — raise the offset or the copies collide"
                )
        copies = []
        for i in range(10):
            copies.append(
                df.select(
                    *[
                        (F.col(c) + F.lit(i * offs[c])).alias(c)
                        if c in offs
                        else F.col(c)
                        for c in df.columns
                    ]
                )
            )
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(
            os.path.join(dst_dir, f"{table}.parquet")
        )
    with open(done, "w") as fh:
        fh.write(fp + "\n")


def lsh_recall(spark: SparkSession, sf_dir: str) -> dict:
    """Recall@k of the LSH top-k vs the exact brute-force top-k, at
    n_tables=1 and the headline n_tables=2 — the measured recall gain
    that justifies the second table's extra cost (each table is one
    more signature pass + bucket join over the corpus)."""
    import __spark_entry__ as em
    from graph_data_science_spark.pipeline import ann
    from graph_data_science_spark.sources import events as ev

    emb = ev.load_table(spark, sf_dir, "embeddings")
    k = 5
    brute = (
        ann.cosine_topk(emb, emb, k=k)
        .select("query_id", "neighbor_id")
        .persist()
    )
    n_true = brute.count()
    out: dict = {"k": k, "brute_pairs": n_true}
    configs = (
        (1, 0), (em.ANN_LSH_TABLES, 0),
        (em.ANN_LSH_TABLES, 1), (em.ANN_LSH_TABLES, 2),
    )
    for nt, probe in configs:
        t0 = time.monotonic()
        got = ann.lsh_topk(
            emb, emb, dim=em.ANN_DIM, k=k, n_planes=em.ANN_LSH_PLANES,
            n_tables=nt, seed=em.ANN_SEED, probe_hamming=probe,
        ).select("query_id", "neighbor_id")
        hit = brute.join(got, ["query_id", "neighbor_id"], "left_semi").count()
        key = f"tables_{nt}" + (f"_probe_{probe}" if probe else "")
        out[f"recall_{key}"] = round(hit / n_true, 4) if n_true else None
        out[f"sec_{key}"] = round(time.monotonic() - t0, 2)
    brute.unpersist()
    return out


def _burn(dur: float) -> int:
    t0 = time.monotonic()
    x = 0
    while time.monotonic() - t0 < dur:
        x += 1
    return x


def _bw_worker(dur: float) -> int:
    """Stream 64 MB (>> L3) copies; returns bytes moved."""
    import numpy as np

    a = np.empty(64_000_000, dtype=np.uint8)
    b = np.empty_like(a)
    t0 = time.monotonic()
    n = 0
    while time.monotonic() - t0 < dur:
        np.copyto(b, a)
        n += 1
    return n * 2 * a.nbytes


def machine_ceilings(levels: list[int], dur: float = 8.0) -> dict:
    """The MACHINE's own scaling ceilings at each worker count, for
    the two resources a Spark superstep consumes: pure CPU (compute
    kernels) and DRAM bandwidth (shuffle/sort/scan byte movement).
    On one shared-memory box the high-parallelism level competes for
    a single memory subsystem, so a shuffle-heavy job cannot scale
    past the bandwidth ratio no matter how it is written; a real
    N->4N *executor* scale-out multiplies memory buses along with
    cores and has ceiling ~1.0 on both axes. Reporting both
    separates engine scaling from single-socket physics."""
    import multiprocessing as mp

    cpu, bw = {}, {}
    for n in levels:
        cpu[n], bw[n] = 0.0, 0.0
        for _ in range(2):  # best-of-2: a co-tenant burst in one
            # 8-second window would otherwise corrupt the ceiling
            with mp.Pool(n) as p:
                cpu[n] = max(cpu[n], sum(p.map(_burn, [dur] * n)) / dur)
            with mp.Pool(n) as p:
                bw[n] = max(bw[n], sum(p.map(_bw_worker, [dur] * n)) / dur)
    return {
        "cpu_iters_per_sec": {str(n): round(cpu[n], 0) for n in levels},
        "membw_gb_per_sec": {str(n): round(bw[n] / 1e9, 1) for n in levels},
    }


def _busy_cores(interval: float = 1.5) -> float:
    """Cores currently busy on the whole host, from a /proc/stat
    delta — instantaneous, unlike the 1-min load average (which keeps
    'remembering' a finished burst for minutes)."""
    try:
        def snap():
            vals = [int(x) for x in open("/proc/stat").readline().split()[1:]]
            return sum(vals), vals[3] + vals[4]  # total, idle+iowait
        t0, i0 = snap()
        time.sleep(interval)
        t1, i1 = snap()
        total, idle = t1 - t0, i1 - i0
        ncpu = os.cpu_count() or 1
        return ncpu * (1.0 - idle / total) if total else 0.0
    except (OSError, IndexError):  # non-Linux fallback
        return 0.0


def _bw_probe(workers: int = 4, dur: float = 3.0) -> float:
    """Currently-available DRAM bandwidth (GB/s at `workers` streams).
    The box shares a socket with co-tenants INVISIBLE to /proc/stat
    (other VMs): measured 4-stream bandwidth swings 80-102 GB/s and
    16-stream 120-174 GB/s with zero local CPU load, and the
    shuffle-heavy superstep slows in lock-step. Probing bandwidth is
    the only way to see that state."""
    import multiprocessing as mp

    with mp.Pool(workers) as p:
        total = sum(p.map(_bw_worker, [dur] * workers))
    return total / dur / 1e9


def _wait_quiet(deadline: float, threshold: float, bw_floor: float = 0.0) -> tuple:
    """Block until fewer than `threshold` host cores are busy AND (if
    `bw_floor` > 0) the 4-stream DRAM bandwidth probe reads at least
    `bw_floor` GB/s, or until `deadline` (monotonic) passes; returns
    the (busy_cores, bw_gb) observed last. This sandbox is a shared
    box with bursty co-tenant load — some visible in /proc/stat,
    some (other VMs on the socket) visible only as missing memory
    bandwidth; an unlucky burst during the high-parallelism level
    alone halves the measured scaling ratio. Gating all levels on the
    same quiet criterion is the shared-box analog of running on an
    idle cluster; observed conditions are recorded per level so the
    artifact shows them."""
    busy, bw = _busy_cores(), None
    while time.monotonic() < deadline:
        if busy < threshold:
            bw = _bw_probe() if bw_floor > 0 else 0.0
            if bw >= bw_floor:
                return busy, bw
        time.sleep(8)
        busy = _busy_cores()
    if bw is None:
        bw = _bw_probe() if bw_floor > 0 else 0.0
    return busy, bw


def _scaling_worker() -> None:
    """Subprocess entry: one parallelism level in a FRESH JVM.

    Measuring both levels in one long-lived JVM is unreliable — the
    level measured last inherits accumulated session state and can
    read 2x slower than in isolation. A fresh JVM per level plus the
    in-process warmup makes the ratio reproducible.

    Both levels run the IDENTICAL job: same input, same
    spark.sql.shuffle.partitions (a cluster scaling N -> 4N executors
    keeps its partitioning and gains slots — only the core count may
    differ between the two measurements)."""
    cpus = os.environ["SPARK_GRAFT_SCALING_WORKER"]
    path = os.environ["SPARK_GRAFT_SCALING_PATH"]
    # 0 = per-level default (partitions follow core count)
    parts = int(os.environ.get("SPARK_GRAFT_SCALING_PARTS", "32")) or None
    spark = make_spark(cpus, shuffle_partitions=parts)
    print("WORKER_RESULT " + json.dumps(timed_pagerank_on_parquet(spark, path)))
    spark.stop()


def _run_scaling_level(cpus: int, path: str) -> dict:
    import subprocess

    env = dict(os.environ)
    env["SPARK_GRAFT_SCALING_WORKER"] = str(cpus)
    env["SPARK_GRAFT_SCALING_PATH"] = path
    busy0, bw0 = _busy_cores(), _bw_probe()
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("WORKER_RESULT "):
            res = json.loads(line[len("WORKER_RESULT "):])
            res["busy_cores_before"] = round(busy0, 2)
            res["membw_gb_before"] = round(bw0, 1)
            return res
    raise RuntimeError(f"scaling worker failed: {out.stderr[-2000:]}")


def main() -> None:
    if os.environ.get("SPARK_GRAFT_SCALING_WORKER"):
        _scaling_worker()
        return
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # the box shares a socket with co-tenant VMs whose load is visible
    # only as missing DRAM bandwidth; a headline run that lands in a
    # degraded window reads uniformly 2-10x slow (observed: the same
    # query set 55s quiet vs 529s degraded, every query inflated
    # alike). Gate the headline block on the same quiet criterion the
    # scaling block uses, and record the observed conditions either
    # way so the artifact is self-documenting.
    hl_budget = float(os.environ.get("SPARK_GRAFT_HEADLINE_QUIET_SEC", "900"))
    hl_threshold = float(os.environ.get("SPARK_GRAFT_QUIET_LOAD", "2.0"))
    hl_bw_floor = float(os.environ.get("SPARK_GRAFT_QUIET_BW_GB", "88"))
    busy0, bw0 = _wait_quiet(
        time.monotonic() + hl_budget, hl_threshold, hl_bw_floor
    )
    spark = make_spark(CPUS)
    queries = run_headline(spark, SF_DIR)
    # second pass over the same list: the first pass pays the JVM's
    # JIT/codegen warmup in whichever query runs first (measured:
    # pagerank 21.5 s cold vs 6.7 s warm, identical plan) — the warm
    # numbers are the steady-state a long-lived cluster session sees,
    # the cold ones what a fresh spark-submit pays once
    queries_warm = run_headline(spark, SF_DIR)
    pipeline_queries = run_pipeline_block(spark, SF_DIR)
    # warm repeat of the pipeline block too — same rationale as
    # queries_warm: the resident-session number per operator
    pipeline_queries_warm = run_pipeline_block(spark, SF_DIR)
    loground_queries = run_loground_block(spark, SF_DIR)
    pr_stats = timed_pagerank(spark, SF_DIR)
    recall = lsh_recall(spark, SF_DIR)
    # 10x datapoint: the same headline list + fixed-superstep
    # PageRank against a synthesized sf~1.0 dataset — the empirical
    # check that no headline operator hides a super-linear term
    # (runs warm-JVM by design, so compare against queries_warm)
    sf10_block = None
    if os.environ.get("SPARK_GRAFT_SKIP_SF10") != "1":
        sf10_dir = os.path.join(
            os.environ.get("TMPDIR", "/tmp"), "gds_spark_sf10"
        )
        make_sf10(spark, SF_DIR, sf10_dir)
        t_sf10 = time.monotonic()
        sf10_queries = run_headline(spark, sf10_dir)
        sf10_pr = timed_pagerank(spark, sf10_dir)
        # the capped-LSH scale lever, benched per round so the r5
        # "1.37x at 10x data" datapoint can't silently regress:
        # max_bucket_size=64 thins the replication-adversarial hot
        # buckets (uncapped = the ann_lsh_topk row above)
        import __spark_entry__ as em
        from graph_data_science_spark.pipeline import ann as _ann
        from graph_data_science_spark.sources import events as _ev

        capped = {}
        for d, tag in ((SF_DIR, "sf01"), (sf10_dir, "sf10")):
            emb = _ev.load_table(spark, d, "embeddings")
            t0 = time.monotonic()
            capped[f"rows_{tag}"] = _ann.lsh_topk(
                emb, emb, dim=em.ANN_DIM, k=5, n_planes=em.ANN_LSH_PLANES,
                n_tables=em.ANN_LSH_TABLES, seed=em.ANN_SEED,
                max_bucket_size=64,
            ).count()
            capped[f"sec_{tag}"] = round(time.monotonic() - t0, 3)
        capped["scale_factor_10x"] = (
            round(capped["sec_sf10"] / capped["sec_sf01"], 2)
            if capped["sec_sf01"]
            else None
        )
        sf10_block = {
            "sf": "1.0",
            "source": "10 id-offset copies of the sf0.1 tables "
            "(see bench.make_sf10); warm JVM — compare vs queries_warm",
            "queries": sf10_queries,
            "value_sec": round(sum(sf10_queries.values()), 3),
            "pagerank": sf10_pr,
            "ann_lsh_capped64": capped,
            "wall_sec_total": round(time.monotonic() - t_sf10, 3),
        }
    spark.stop()
    busy1, bw1 = _busy_cores(), _bw_probe()

    result = {
        "metric": "headline query wall-clock at sf dir (see queries) + "
        "PageRank supersteps/sec and edges/sec at fixed 10 supersteps",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        # steady-state repeat of the same list in the same session
        # (cross-round comparisons use "queries"; "queries_warm" is
        # what a resident session pays per call)
        "queries_warm": queries_warm,
        "value_warm_sec": round(sum(queries_warm.values()), 3),
        # round-3 pipeline operator family, timed in the same session
        # but NOT in the headline sum (headline list frozen at r1's)
        "pipeline_queries": pipeline_queries,
        "pipeline_total_sec": round(sum(pipeline_queries.values()), 3),
        "pipeline_queries_warm": pipeline_queries_warm,
        "pipeline_total_warm_sec": round(sum(pipeline_queries_warm.values()), 3),
        # O(log n)-round machinery, timed so constant regressions show
        "loground_queries": loground_queries,
        "loground_total_sec": round(sum(loground_queries.values()), 3),
        "sf": sf,
        "pagerank": pr_stats,
        "ann_lsh_recall": recall,
        "sf10": sf10_block,
        # host conditions bracketing the headline block; membw below
        # the quiet floor means a co-tenant burst landed mid-run and
        # absolute timings are inflated accordingly
        "host_conditions": {
            "quiet_membw_floor_gb": hl_bw_floor,
            "busy_cores_before": round(busy0, 2),
            "membw_gb_before": round(bw0, 1),
            "busy_cores_after": round(busy1, 2),
            "membw_gb_after": round(bw1, 1),
            # one-flag summary: True when either bracket probe sat
            # below the quiet floor, i.e. a co-tenant burst owned the
            # DRAM bus and every absolute timing above is inflated —
            # compare against a run where this is False instead
            "degraded": bool(bw0 < hl_bw_floor or bw1 < hl_bw_floor),
        },
    }

    if os.environ.get("SPARK_GRAFT_SKIP_SCALING") != "1":
        # N -> 4N scaling evidence (north_rule): the same
        # fixed-superstep PageRank job, same on-disk input, at
        # local[N] worker counts 4x apart. Default levels 1, 4, 16
        # give two N->4N pairs: 1->4 (the regime where one box still
        # has 4x the resources to hand out — cores AND bandwidth —
        # i.e. the faithful single-box emulation of independent
        # executors) and 4->16 (where the levels share one saturated
        # memory bus; reported with the measured machine ceilings).
        # The input is a synthetic transcript graph big enough that
        # compute dominates scheduling overhead (~7M edges).
        levels = [
            int(x)
            for x in os.environ.get("SPARK_GRAFT_SCALING_LEVELS", "1,4,16").split(",")
        ]
        n_conv = int(os.environ.get("SPARK_GRAFT_SCALING_CONVS", "1000000"))
        path = os.path.join(
            os.environ.get("TMPDIR", "/tmp"), f"gds_spark_scaling_{n_conv}"
        )
        scaling_edge_table(path, n_conv)
        machine = machine_ceilings(levels)
        runs: dict[int, list[dict]] = {c: [] for c in levels}
        repeats = int(os.environ.get("SPARK_GRAFT_SCALING_REPEATS", "2"))
        # shared quiet-wait budget across all level runs: bound the
        # total stall even if the box never goes quiet
        quiet_threshold = float(os.environ.get("SPARK_GRAFT_QUIET_LOAD", "2.0"))
        bw_floor = float(os.environ.get("SPARK_GRAFT_QUIET_BW_GB", "88"))
        quiet_deadline = time.monotonic() + float(
            os.environ.get("SPARK_GRAFT_QUIET_BUDGET_SEC", "900")
        )
        # interleaved reps: co-tenant noise hits all levels alike
        for _ in range(repeats):
            for cpus in levels:
                _wait_quiet(quiet_deadline, quiet_threshold, bw_floor)
                runs[cpus].append(_run_scaling_level(cpus, path))

        best = {c: min(rs, key=lambda r: r["wall_sec"]) for c, rs in runs.items()}

        def pair_stats(lo: int, hi: int) -> dict:
            f = hi / lo
            speedup = best[lo]["wall_sec"] / best[hi]["wall_sec"]
            steady = (
                best[lo]["steady_superstep_sec"] / best[hi]["steady_superstep_sec"]
            )
            cpu = machine["cpu_iters_per_sec"]
            bw = machine["membw_gb_per_sec"]
            cpu_ceiling = (cpu[str(hi)] / cpu[str(lo)]) / f
            bw_ceiling = (bw[str(hi)] / bw[str(lo)]) / f
            return {
                "cpus_low": lo,
                "cpus_high": hi,
                "speedup": round(speedup, 4),
                "efficiency": round(speedup / f, 4),
                "steady_speedup": round(steady, 4),
                "steady_efficiency": round(steady / f, 4),
                "machine_cpu_ceiling": round(cpu_ceiling, 4),
                "machine_membw_ceiling": round(bw_ceiling, 4),
                # engine efficiency with single-socket physics divided
                # out: what the same job would score on hardware whose
                # bandwidth scales with workers (i.e. N->4N executors)
                "efficiency_vs_membw_ceiling": round(
                    (speedup / f) / bw_ceiling, 4
                ),
                "steady_efficiency_vs_membw_ceiling": round(
                    (steady / f) / bw_ceiling, 4
                ),
            }

        pairs = [
            pair_stats(levels[i], levels[i + 1]) for i in range(len(levels) - 1)
        ]
        primary = pairs[0]
        result["scaling"] = {
            "levels": levels,
            "shuffle_partitions": int(os.environ.get("SPARK_GRAFT_SCALING_PARTS", "32")),
            "repeats": repeats,
            "edges": best[levels[0]]["edges"],
            "quiet_busy_cores_threshold": quiet_threshold,
            "per_level": {
                str(c): {
                    "wall_sec": best[c]["wall_sec"],
                    "wall_sec_all": [r["wall_sec"] for r in rs],
                    "steady_superstep_sec": best[c]["steady_superstep_sec"],
                    "edges_per_sec": best[c]["edges_per_sec"],
                    "steady_edges_per_sec": best[c]["steady_edges_per_sec"],
                    "busy_cores_before_all": [r["busy_cores_before"] for r in rs],
                    "membw_gb_before_all": [r["membw_gb_before"] for r in rs],
                }
                for c, rs in runs.items()
            },
            "quiet_membw_floor_gb": bw_floor,
            # True when ANY level run started below the quiet floor —
            # the interleaved-reps design degrades all levels alike,
            # but absolute edges/sec are then co-tenant-inflated and
            # efficiency numbers should be read with the machine
            # ceilings measured alongside
            "degraded": bool(
                any(
                    r["membw_gb_before"] < bw_floor
                    for rs in runs.values()
                    for r in rs
                )
            ),
            "machine": machine,
            "pairs": pairs,
            # headline fields = the primary N->4N pair
            "cpus_low": primary["cpus_low"],
            "cpus_high": primary["cpus_high"],
            "wall_sec_low": best[primary["cpus_low"]]["wall_sec"],
            "wall_sec_high": best[primary["cpus_high"]]["wall_sec"],
            "edges_per_sec_low": best[primary["cpus_low"]]["edges_per_sec"],
            "edges_per_sec_high": best[primary["cpus_high"]]["edges_per_sec"],
            "steady_edges_per_sec_low": best[primary["cpus_low"]]["steady_edges_per_sec"],
            "steady_edges_per_sec_high": best[primary["cpus_high"]]["steady_edges_per_sec"],
            "speedup": primary["speedup"],
            "efficiency": primary["efficiency"],
            "steady_speedup": primary["steady_speedup"],
            "steady_efficiency": primary["steady_efficiency"],
            # the north_rule criterion verbatim: THROUGHPUT (steady
            # edges/sec, excluding per-run setup) scaling efficiency
            # across the primary N->4N pair
            "throughput_scaling_efficiency": primary["steady_efficiency"],
        }

    # Attach the committed quiet-window run of record (provenance
    # inside the file) so a live run that lands in a co-tenant
    # DRAM-throttle window still carries the north-rule scaling
    # evidence in one self-contained artifact. The live measurement
    # above is never replaced — this is an extra, labeled block.
    ror_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_RUN_OF_RECORD.json"
    )
    if os.path.exists(ror_path):
        try:
            with open(ror_path) as fh:
                ror = json.load(fh)
            result["quiet_window_run_of_record"] = {
                "recorded": ror.get("recorded"),
                "source": ror.get("source"),
                "north_rule_pair": ror.get("north_rule_pair"),
                "throughput_scaling_efficiency": ror.get(
                    "throughput_scaling_efficiency"
                ),
                "full_record": "BENCH_RUN_OF_RECORD.json",
            }
        except (OSError, ValueError):
            pass

    # full artifact to a file — the driver's stdout tail capture
    # truncated round 2's single giant line, losing the headline
    # timings; BENCH.json is the self-contained record
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.json")
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
        fh.write("\n")

    # stdout stays ONE JSON line, but compact: drop the verbose
    # per-level/pairs/machine sub-blocks (they live in BENCH.json)
    compact = dict(result)
    if "scaling" in compact:
        sc = {
            k: v
            for k, v in compact["scaling"].items()
            if k not in ("per_level", "pairs", "machine")
        }
        sc["full_artifact"] = "BENCH.json"
        compact["scaling"] = sc
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
