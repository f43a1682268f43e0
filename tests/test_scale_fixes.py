"""Scale-path regression tests (VERDICT r1 "What's wrong" 2-5):
global_rank replaces single-task global windows, the n-gram shingle
join gets a hot-key cap, and shortest_path backtracks without an
O(|V|) collect."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from graph_data_science_spark.pipeline.dedup import ngram_jaccard_pairs
from graph_data_science_spark.util import global_rank


def test_global_rank_matches_global_window(spark):
    df = spark.range(0, 997).select(
        F.col("id"), F.xxhash64("id").alias("h")
    )
    got = {
        r["id"]: r["_rank"]
        for r in global_rank(df, ["h"], rank_col="_rank", n_parts=7).collect()
    }
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy("h"))
        ).collect()
    }
    assert got == want


def test_global_rank_is_contiguous_on_ties(spark):
    df = spark.range(0, 500).select((F.col("id") % 5).alias("k"), "id")
    ranks = sorted(
        r["_rank"] for r in global_rank(df, ["k", "id"], n_parts=4).collect()
    )
    assert ranks == list(range(1, 501))


def test_ngram_hot_shingle_cap(spark):
    # 6 docs sharing one stopword-like trigram + 2 genuinely similar
    # docs; with the cap at 5 the hot shingle is dropped from the
    # join, so only the genuinely-similar pair survives
    hot = "the quick fox "
    docs = [(i, hot + f"unique tokens here number {i} pad pad") for i in range(6)]
    docs += [(10, "alpha beta gamma delta epsilon zeta"),
             (11, "alpha beta gamma delta epsilon eta")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    uncapped = ngram_jaccard_pairs(
        df, threshold=0.01, max_shingle_doc_freq=None
    ).count()
    capped = ngram_jaccard_pairs(df, threshold=0.01, max_shingle_doc_freq=5)
    rows = capped.collect()
    assert uncapped > len(rows)
    assert {(r["doc_a"], r["doc_b"]) for r in rows} == {(10, 11)}


def test_shortest_path_backtrack(spark, catalog):
    from graph_data_science_spark.algorithms.paths import shortest_path
    from tests.conftest import edge_df

    edges = edge_df(
        spark,
        [(0, 1), (1, 2), (2, 3), (0, 3)],
        weights=[1.0, 1.0, 1.0, 10.0],
    )
    g = catalog.create("sp_scale", edges)
    cost, path = shortest_path(spark, g, source=0, target=3)
    assert cost == 3.0
    assert path == [0, 1, 2, 3]
    cost_u, path_u = shortest_path(spark, g, source=3, target=0)
    assert cost_u is None and path_u == []
