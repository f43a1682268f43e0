"""Checkpoint/resume tests (north_rule hard requirement, FIXTURES.md §F.2):
kill after superstep k, resume, identical final state."""

import json
import os

from graph_data_science_spark.algorithms.pagerank import PageRankConfig, pagerank
from graph_data_science_spark.algorithms.wcc import WccConfig, wcc
from graph_data_science_spark.pregel import PregelRunner
from tests.conftest import PAGERANK_EDGES, WCC_EDGES, WCC_EXPECTED, edge_df


def test_pagerank_checkpoint_resume_identical(spark, catalog, tmp_path):
    ckpt = str(tmp_path / "pr_ckpt")
    g = catalog.create("ckg", edge_df(spark, PAGERANK_EDGES), persist=True)

    # full run, checkpointing every superstep
    full = pagerank(
        spark, g, PageRankConfig(max_iterations=11, tolerance=0.0), checkpoint_dir=ckpt
    )
    expected = {r["id"]: r["score"] for r in full.state.collect()}

    # simulate a crash: delete the snapshots after superstep 4
    # (the dir also holds metrics.jsonl — only superstep=* entries count)
    for name in sorted(os.listdir(ckpt)):
        if not name.startswith("superstep="):
            continue
        k = int(name.split("=")[1])
        if k > 4:
            import shutil

            shutil.rmtree(os.path.join(ckpt, name))
    runner = PregelRunner(spark=spark, max_iterations=10, checkpoint_dir=ckpt)
    assert runner.latest_checkpoint() == 4

    # resume mid-algorithm and finish
    resumed = pagerank(
        spark,
        g,
        PageRankConfig(max_iterations=11, tolerance=0.0),
        checkpoint_dir=ckpt,
        resume=True,
    )
    got = {r["id"]: r["score"] for r in resumed.state.collect()}
    assert got == expected  # bit-identical: same floats, same supersteps


def test_checkpoint_manifest_lineage(spark, catalog, tmp_path):
    ckpt = str(tmp_path / "wcc_ckpt")
    g = catalog.create("ckw", edge_df(spark, WCC_EDGES))
    res = wcc(spark, g, WccConfig(max_iterations=10), checkpoint_dir=ckpt)
    assert {r["id"]: r["component"] for r in res.state.collect()} == WCC_EXPECTED
    # every superstep sealed with a lineage manifest:
    # per-partition row counts + iteration number
    snaps = sorted(n for n in os.listdir(ckpt) if n.startswith("superstep="))
    assert len(snaps) == len(res.metrics)
    # the run log carries one metrics line per superstep
    with open(os.path.join(ckpt, "metrics.jsonl")) as f:
        assert len(f.readlines()) == len(res.metrics)
    for name in snaps:
        with open(os.path.join(ckpt, name, "manifest.json")) as f:
            m = json.load(f)
        assert m["rows"] == 12
        assert m["superstep"] == int(name.split("=")[1])
        assert sum(p["rows"] for p in m["partitions"]) == m["rows"]
