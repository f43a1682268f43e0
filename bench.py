"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "pagerank": {supersteps, supersteps_per_sec, edges_per_sec, ...},
   "scaling": {cpus_low, cpus_high, ..., efficiency}}

The "scaling" block is the sandbox evidence for the north_rule's
N→4N-executor criterion: the same fixed-superstep PageRank job runs
at local[N] and local[4N] on the same on-disk input (defaults N=4 —
set SPARK_GRAFT_SCALING_LO/HI to override; the 4→16 pair is used
because 8→32 saturates single-socket DRAM bandwidth in this sandbox,
see BENCH.md); efficiency = (T_low / T_high) / (cpus_high /
cpus_low). Skip with SPARK_GRAFT_SKIP_SCALING=1 when only per-query
timings are needed.
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
        pagerank(spark, g, PageRankConfig(tolerance=0.0, max_iterations=warmup + 1))
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
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("WORKER_RESULT "):
            return json.loads(line[len("WORKER_RESULT "):])
    raise RuntimeError(f"scaling worker failed: {out.stderr[-2000:]}")


def main() -> None:
    if os.environ.get("SPARK_GRAFT_SCALING_WORKER"):
        _scaling_worker()
        return
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    spark = make_spark(CPUS)
    queries = run_headline(spark, SF_DIR)
    pr_stats = timed_pagerank(spark, SF_DIR)
    spark.stop()

    result = {
        "metric": "headline query wall-clock at sf dir (see queries) + "
        "PageRank supersteps/sec and edges/sec at fixed 10 supersteps",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "pagerank": pr_stats,
    }

    if os.environ.get("SPARK_GRAFT_SKIP_SCALING") != "1":
        # N -> 4N scaling evidence (north_rule): same fixed-superstep
        # PageRank job, same on-disk input, local[lo] vs local[hi].
        # The input is a synthetic transcript graph big enough that
        # compute dominates scheduling overhead (~7M edges).
        lo = int(os.environ.get("SPARK_GRAFT_SCALING_LO", "4"))
        hi = int(os.environ.get("SPARK_GRAFT_SCALING_HI", str(4 * lo)))
        n_conv = int(os.environ.get("SPARK_GRAFT_SCALING_CONVS", "1000000"))
        path = os.path.join(
            os.environ.get("TMPDIR", "/tmp"), f"gds_spark_scaling_{n_conv}"
        )
        scaling_edge_table(path, n_conv)
        runs: dict[int, list[dict]] = {lo: [], hi: []}
        repeats = int(os.environ.get("SPARK_GRAFT_SCALING_REPEATS", "3"))
        # interleaved reps: co-tenant noise hits both levels alike
        for _ in range(repeats):
            for cpus in (lo, hi):
                runs[cpus].append(_run_scaling_level(cpus, path))

        def med(xs):
            s = sorted(xs)
            return s[len(s) // 2]

        scaling = {c: min(rs, key=lambda r: r["wall_sec"]) for c, rs in runs.items()}
        med_wall = {c: med([r["wall_sec"] for r in rs]) for c, rs in runs.items()}
        med_steady = {
            c: med([r["steady_superstep_sec"] for r in rs]) for c, rs in runs.items()
        }
        speedup = scaling[lo]["wall_sec"] / scaling[hi]["wall_sec"]
        steady_speedup = (
            scaling[lo]["steady_superstep_sec"] / scaling[hi]["steady_superstep_sec"]
        )
        result["scaling"] = {
            "cpus_low": lo,
            "cpus_high": hi,
            "shuffle_partitions": int(os.environ.get("SPARK_GRAFT_SCALING_PARTS", "32")),
            "repeats": repeats,
            "edges": scaling[hi]["edges"],
            "wall_sec_low": scaling[lo]["wall_sec"],
            "wall_sec_high": scaling[hi]["wall_sec"],
            "wall_sec_low_all": [r["wall_sec"] for r in runs[lo]],
            "wall_sec_high_all": [r["wall_sec"] for r in runs[hi]],
            "edges_per_sec_low": scaling[lo]["edges_per_sec"],
            "edges_per_sec_high": scaling[hi]["edges_per_sec"],
            "steady_edges_per_sec_low": scaling[lo]["steady_edges_per_sec"],
            "steady_edges_per_sec_high": scaling[hi]["steady_edges_per_sec"],
            "speedup": round(speedup, 4),
            "efficiency": round(speedup / (hi / lo), 4),
            "steady_speedup": round(steady_speedup, 4),
            "steady_efficiency": round(steady_speedup / (hi / lo), 4),
            "median_speedup": round(med_wall[lo] / med_wall[hi], 4),
            "median_efficiency": round((med_wall[lo] / med_wall[hi]) / (hi / lo), 4),
            "median_steady_efficiency": round(
                (med_steady[lo] / med_steady[hi]) / (hi / lo), 4
            ),
        }

    print(json.dumps(result))


if __name__ == "__main__":
    main()
