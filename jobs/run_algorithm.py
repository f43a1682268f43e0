"""spark-submit entry point — run one algorithm over a transcript table.

Cluster usage (north_rule deployment shape):

    zip -r gds_spark.zip graph_data_science_spark
    spark-submit --py-files gds_spark.zip jobs/run_algorithm.py \\
        --algorithm pagerank \\
        --input iceberg_cat.db.transcripts \\   # or a parquet path
        --output /out/pagerank \\
        --checkpoint-dir hdfs:///ckpt/pr_run1 \\
        --config '{"max_iterations": 20, "tolerance": 1e-7}'

The input is the canonical transcript table
(conv_id, turn_idx, role, text, tool, ts); the job derives the link
graph (projection.transcript_edges), runs the algorithm with
per-superstep checkpointing (resumable with --resume after executor/
driver loss), writes the result table, and prints one JSON line of
run metrics (iterations, convergence, wall seconds, rows).

In local mode the same script runs as-is:
    python jobs/run_algorithm.py --algorithm wcc \\
        --input /root/testdata/sf0.001/events.parquet --input-kind events \\
        --output /tmp/wcc_out
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

ALGORITHMS = (
    "pagerank", "article_rank", "eigenvector", "wcc", "label_propagation",
    "triangle_count", "local_clustering_coefficient", "degree_centrality",
    "louvain", "modularity_optimization", "scc", "k1coloring", "hits",
    "closeness_centrality",
    "harmonic_centrality", "node_similarity", "fastrp", "graphsage",
    "betweenness", "sllpa", "all_shortest_paths",
    "neighborhood_function", "effective_diameter",
    "bridges", "articulation_points", "hashgnn",
)


def build_graph(spark: SparkSession, args):
    from graph_data_science_spark import projection
    from graph_data_science_spark.catalog import Graph
    from graph_data_science_spark.sources import events as ev

    if args.input_kind == "edges":
        edges = spark.read.parquet(args.input)
    elif args.input_kind == "events":
        edges = ev.events_edges(spark.read.parquet(args.input))
    else:  # transcripts (parquet path or catalog table identifier)
        from graph_data_science_spark.sources.transcripts import read_transcripts

        edges = projection.transcript_edges(read_transcripts(spark, args.input))
    edges = projection.orient(edges, args.orientation)
    return Graph(
        name="job", edges=edges, directed=args.orientation != "UNDIRECTED"
    ).persist()


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--algorithm", required=True, choices=ALGORITHMS)
    p.add_argument("--input", required=True, help="transcript table/path")
    p.add_argument(
        "--input-kind", default="transcripts", choices=["transcripts", "events", "edges"]
    )
    p.add_argument("--output", required=True)
    p.add_argument("--orientation", default="NATURAL")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--config", default="{}", help="JSON algorithm config")
    p.add_argument("--mode", default="write", choices=["write", "stats"])
    args = p.parse_args()
    cfg = json.loads(args.config)

    spark = SparkSession.builder.appName(
        f"gds-spark-{args.algorithm}"
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from graph_data_science_spark.engine import GdsEngine

    g = build_graph(spark, args)
    t0 = time.monotonic()

    # checkpointable supersteps for the Pregel-family algorithms
    if args.algorithm in ("pagerank", "article_rank", "eigenvector"):
        # importlib: the package re-exports a same-named function,
        # which shadows the submodule attribute for plain `import as`
        import importlib

        pr = importlib.import_module("graph_data_science_spark.algorithms.pagerank")

        fn = getattr(pr, args.algorithm)
        res = fn(
            spark, g, pr.PageRankConfig(**cfg),
            checkpoint_dir=args.checkpoint_dir, resume=args.resume,
        )
        df, meta = res.state, {
            "ran_iterations": res.ran_iterations, "did_converge": res.did_converge,
            "superstep_metrics": res.metrics,
        }
    elif args.algorithm == "wcc":
        from graph_data_science_spark.algorithms.wcc import WccConfig, wcc

        res = wcc(spark, g, WccConfig(**cfg),
                  checkpoint_dir=args.checkpoint_dir, resume=args.resume)
        df, meta = res.state, {
            "ran_iterations": res.ran_iterations, "did_converge": res.did_converge,
        }
    elif args.algorithm == "label_propagation":
        from graph_data_science_spark.algorithms.labelprop import (
            LabelPropagationConfig,
            label_propagation,
        )

        res = label_propagation(spark, g, LabelPropagationConfig(**cfg),
                                checkpoint_dir=args.checkpoint_dir, resume=args.resume)
        df, meta = res.state, {
            "ran_iterations": res.ran_iterations, "did_converge": res.did_converge,
        }
    else:
        proc = getattr(GdsEngine(spark), args.algorithm)(g, **cfg)
        df, meta = proc.stream(), {}

    df.write.mode("overwrite").parquet(args.output)
    wall = time.monotonic() - t0
    n = spark.read.parquet(args.output).count()
    print(json.dumps({
        "algorithm": args.algorithm,
        "rows": n,
        "wall_sec": round(wall, 3),
        "output": args.output,
        **{k: v for k, v in meta.items() if k != "superstep_metrics"},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
