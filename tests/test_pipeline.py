"""Training-data pipeline operator tests: dedup, text, ANN, multimodal."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.functions.scalers import scale_property
from graph_data_science_spark.pipeline import ann, dedup, multimodal, text


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat"),  # near dup
        (4, "completely different text about spark engines"),
        (5, "der hund ist nicht die katze und der fuchs"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(spark, docs):
    got = {r["doc_id"]: (r["group_id"], r["is_duplicate"])
           for r in dedup.exact_duplicates(docs).collect()}
    assert got[1] == (1, False)
    assert got[2] == (1, True)
    assert got[3][1] is False


def test_ngram_jaccard_pairs(spark, docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.3).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and 0.3 <= pairs[(1, 3)] < 1.0
    assert (1, 4) not in pairs


def test_minhash_lsh_candidates(spark, docs):
    cands = {
        (r["doc_a"], r["doc_b"]): r["n_bands"]
        for r in dedup.minhash_lsh_candidates(docs, num_hashes=16, bands=4).collect()
    }
    assert cands[(1, 2)] == 4  # identical docs collide in every band
    assert (1, 4) not in cands


def test_simhash_near_duplicates(spark, docs):
    sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    assert sh[1] == sh[2]
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dedup.simhash_near_duplicates(docs, max_hamming=16).collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 5) not in pairs or pairs[(1, 5)] > 0


def test_token_stats_and_quality(spark, docs):
    stats = {r["doc_id"]: r["n_tokens"] for r in text.add_token_stats(docs).collect()}
    assert stats[1] == 9
    q = {r["doc_id"]: r for r in text.quality_score(docs).collect()}
    assert q[1]["stopword_ratio"] > 0
    assert 0 <= q[4]["quality_score"] <= 1


def test_language_id(spark, docs):
    got = {r["doc_id"]: r["lang_pred"] for r in text.language_id(docs).collect()}
    assert got[1] == "en"
    assert got[5] == "de"


def test_fingerprint_stability(spark, docs):
    fp = {r["doc_id"]: r["fingerprint"] for r in text.fingerprint(docs).collect()}
    assert fp[1] == fp[2]
    assert fp[1] != fp[4]


def test_cosine_topk_exact(spark):
    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = ann.cosine_topk(df, df.where(F.col("vec_id") == 0), k=2).collect()
    order = [(r["neighbor_id"], r["rank"]) for r in got]
    assert order == [(1, 1), (2, 2)]
    assert got[0]["cosine"] == pytest.approx(0.9 / np.sqrt(0.82), abs=1e-5)


def test_lsh_topk_recall_on_clusters(spark):
    rng = np.random.default_rng(7)
    base = rng.standard_normal((10, 16))
    rows = []
    for i in range(100):
        c = i % 10
        v = base[c] + rng.standard_normal(16) * 0.05
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = df.where(F.col("vec_id") < 10)
    exact = ann.cosine_topk(df, queries, k=3)
    approx = ann.lsh_topk(df, queries, dim=16, k=3, n_planes=4)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.6  # same-cluster vectors share buckets w.h.p.


def test_lsh_multiprobe_dominates_single_bucket(spark):
    """probe_hamming=1 probes every Hamming-1 bucket of the query
    signature: the candidate set is a superset of the plain run's, so
    recall can only rise, and returned cosines stay exact."""
    rng = np.random.default_rng(11)
    rows = [
        (i, [float(x) for x in rng.standard_normal(16)]) for i in range(80)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = ann.cosine_topk(df, df, k=3)
    plain = ann.lsh_topk(df, df, dim=16, k=3, n_planes=6)
    probed = ann.lsh_topk(df, df, dim=16, k=3, n_planes=6, probe_hamming=1)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    p0 = {(r["query_id"], r["neighbor_id"]) for r in plain.collect()}
    p1 = {(r["query_id"], r["neighbor_id"]) for r in probed.collect()}
    assert len(p1 & e) >= len(p0 & e)
    # cosine values are the exact per-pair values (spot check vs exact)
    ex = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact.collect()}
    for r in probed.collect():
        key = (r["query_id"], r["neighbor_id"])
        if key in ex:
            assert abs(r["cosine"] - ex[key]) < 1e-6


def test_ivf_topk_recall_on_clusters(spark):
    """IVF with k-means coarse quantizer: on well-separated clusters
    the nearest-centroid lists contain the true neighbors, so recall
    with n_probe=2 of 10 lists should be near-perfect — far above
    the 0.2 random-list baseline."""
    rng = np.random.default_rng(7)
    base = rng.standard_normal((10, 16))
    rows = []
    for i in range(100):
        c = i % 10
        v = base[c] + rng.standard_normal(16) * 0.05
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = df.where(F.col("vec_id") < 10)
    exact = ann.cosine_topk(df, queries, k=3)
    approx = ann.ivf_topk(df, queries, k=3, n_centroids=10, n_probe=2, seed=5)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    assert len(a & e) / len(e) >= 0.8
    # every query fills its k slots and never returns itself
    per = {}
    for q, n in a:
        assert q != n
        per[q] = per.get(q, 0) + 1
    assert all(v == 3 for v in per.values())


def test_multimodal_plumbing(spark):
    rows = [
        (1, "image", bytearray(b"imgbytes1"), ("image/png", 64, 64, None)),
        (2, "video", bytearray(b"vidbytes"), ("video/mp4", 640, 480, 3500)),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    feats = multimodal.fake_feature_extract(df).collect()
    assert {r["media_id"] for r in feats} == {1, 2}
    assert all(len(r["features"]) == 8 for r in feats)
    # deterministic: same payload -> same features
    feats2 = multimodal.fake_feature_extract(df).collect()
    assert sorted(map(str, feats)) == sorted(map(str, feats2))
    plan = multimodal.frame_sample_plan(df, every_ms=1000).collect()
    assert [r["frame_ts_ms"] for r in plan] == [0, 1000, 2000, 3000]
    if multimodal._PILImage is None:
        with pytest.raises(NotImplementedError):
            multimodal.decode_image(b"x")
        with pytest.raises(ImportError):
            multimodal.decode_image_batch(df)


def test_multimodal_real_decode_with_pillow(spark):
    """Runs only when Pillow is installed (skips, not fails, in this
    container): a real PNG round-trips through the decode stage."""
    PIL = pytest.importorskip("PIL.Image")
    import io

    import numpy as np

    im = PIL.new("RGB", (4, 3), color=(10, 20, 30))
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    rows = [(1, "image", bytearray(buf.getvalue()), ("image/png", 4, 3, None))]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = multimodal.decode_image_batch(df).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["height"], r["width"], r["channels"]) == (3, 4, 3)
    assert r["pixels"][:3] == [10, 20, 30]
    arr = multimodal.decode_image(buf.getvalue())
    assert arr.shape == (3, 4, 3) and int(np.max(arr)) == 30


def test_scalers(spark):
    df = spark.createDataFrame([(i, float(i)) for i in range(5)], "id long, x double")
    mm = {r["id"]: r["x_scaled"] for r in scale_property(df, "x", "MINMAX").collect()}
    assert mm[0] == 0.0 and mm[4] == 1.0 and mm[2] == 0.5
    l2 = {r["id"]: r["x_scaled"] for r in scale_property(df, "x", "L2NORM").collect()}
    assert sum(v * v for v in l2.values()) == pytest.approx(1.0)
    std = {r["id"]: r["x_scaled"] for r in scale_property(df, "x", "STDSCORE").collect()}
    assert abs(sum(std.values())) < 1e-12


def test_node_similarity(spark, catalog):
    from graph_data_science_spark.algorithms.similarity import (
        NodeSimilarityConfig,
        node_similarity,
    )
    from tests.conftest import edge_df

    # 0 and 1 share both targets {10, 11}; 2 shares one
    g = catalog.create(
        "nsim", edge_df(spark, [(0, 10), (0, 11), (1, 10), (1, 11), (2, 10), (2, 12)])
    )
    got = {
        (r["node1"], r["node2"]): r["similarity"]
        for r in node_similarity(spark, g, NodeSimilarityConfig(top_k=5)).collect()
    }
    assert got[(0, 1)] == 1.0
    assert got[(0, 2)] == pytest.approx(1 / 3, abs=1e-6)


def test_node_similarity_weighted_jaccard_overlap(spark, catalog):
    """weightedJaccard parity (NodeSimilarity.java:324-363):
    1 -> {10: 2, 11: 1} (tot 3), 2 -> {10: 1, 11: 3, 12: 1} (tot 5):
    sum(min) = 1 + 1 = 2, jaccard = 2/(3+5-2) = 1/3,
    overlap = 2/min(3,5) = 2/3. Parallel edges aggregate by sum."""
    from graph_data_science_spark.algorithms.similarity import (
        NodeSimilarityConfig,
        node_similarity,
    )
    from tests.conftest import edge_df

    pairs = [(1, 10), (1, 10), (1, 11), (2, 10), (2, 11), (2, 12)]
    weights = [1.0, 1.0, 1.0, 1.0, 3.0, 1.0]
    g = catalog.create("nsim_w", edge_df(spark, pairs, weights))
    jac = {
        (r["node1"], r["node2"]): r["similarity"]
        for r in node_similarity(
            spark, g, NodeSimilarityConfig(weighted=True)
        ).collect()
    }
    assert jac[(1, 2)] == pytest.approx(1 / 3, abs=1e-6)
    assert jac[(2, 1)] == pytest.approx(1 / 3, abs=1e-6)
    ovl = {
        (r["node1"], r["node2"]): r["similarity"]
        for r in node_similarity(
            spark, g, NodeSimilarityConfig(weighted=True, metric="OVERLAP")
        ).collect()
    }
    assert ovl[(1, 2)] == pytest.approx(2 / 3, abs=1e-6)


def test_node_similarity_hub_salting_exact(spark, catalog):
    """The 2-D salted hub path must produce exactly the plain join's
    results — hub_threshold=0 (plain) vs threshold=1 + small salt
    (every shared dst routed through the salt grid)."""
    from graph_data_science_spark.algorithms.similarity import (
        NodeSimilarityConfig,
        node_similarity,
    )
    from tests.conftest import edge_df

    # hub dst 99 shared by 12 sources, plus side structure
    pairs = [(i, 99) for i in range(12)] + [(0, 10), (1, 10), (2, 11), (3, 11)]
    g = catalog.create("nsim_hub", edge_df(spark, pairs))
    plain = node_similarity(
        spark, g, NodeSimilarityConfig(top_k=20, hub_threshold=0)
    )
    salted = node_similarity(
        spark, g, NodeSimilarityConfig(top_k=20, hub_threshold=1, hub_salt=3)
    )
    key = lambda r: (r["node1"], r["node2"])  # noqa: E731
    p = {key(r): (r["similarity"], r["rank"]) for r in plain.collect()}
    s = {key(r): (r["similarity"], r["rank"]) for r in salted.collect()}
    assert p == s and len(p) > 0


def test_node_similarity_weighted_hub_salting_exact(spark, catalog):
    """Weights must survive the 2-D salted hub path unchanged."""
    from graph_data_science_spark.algorithms.similarity import (
        NodeSimilarityConfig,
        node_similarity,
    )
    from tests.conftest import edge_df

    pairs = [(i, 99) for i in range(12)] + [(0, 10), (1, 10), (2, 11), (3, 11)]
    weights = [float(1 + (i % 3)) for i in range(12)] + [2.0, 1.0, 3.0, 1.0]
    g = catalog.create("nsim_whub", edge_df(spark, pairs, weights))
    plain = node_similarity(
        spark, g, NodeSimilarityConfig(top_k=20, hub_threshold=0, weighted=True)
    )
    salted = node_similarity(
        spark,
        g,
        NodeSimilarityConfig(top_k=20, hub_threshold=1, hub_salt=3, weighted=True),
    )
    key = lambda r: (r["node1"], r["node2"])  # noqa: E731
    p = {key(r): (r["similarity"], r["rank"]) for r in plain.collect()}
    s = {key(r): (r["similarity"], r["rank"]) for r in salted.collect()}
    assert p == s and len(p) > 0


def test_dedup_clusters(spark):
    from graph_data_science_spark.pipeline.dedup import dedup_clusters

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),                      # exact dup of 1
            (3, base + " tail"),            # near dup (shares most shingles)
            (10, "completely different content about spark partitions"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"], r["is_representative"])
        for r in dedup_clusters(docs).collect()
    }
    assert got[1] == (1, 3, True)
    assert got[2] == (1, 3, False)
    assert got[3] == (1, 3, False)
    assert got[10] == (10, 1, True)


def test_semantic_dedup(spark):
    """SemDeDup contract: cosine-near-dup components share a cluster,
    min id is the kept representative, isolated vectors are singleton
    representatives. Vectors 1/2 are identical, 3 is a scaled copy
    (cosine 1.0 with both), 10 is orthogonal."""
    from graph_data_science_spark.pipeline.ann import semantic_dedup

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 1.0, 0.0]),
            (2, [1.0, 0.0, 1.0, 0.0]),
            (3, [2.0, 0.0, 2.0, 0.0]),
            (10, [0.0, 1.0, 0.0, -1.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["vec_id"]: (r["cluster_id"], r["cluster_size"], r["is_representative"])
        for r in semantic_dedup(
            emb, dim=4, threshold=0.95, n_planes=4, n_tables=2
        ).collect()
    }
    assert got[1] == (1, 3, True)
    assert got[2] == (1, 3, False)
    assert got[3] == (1, 3, False)
    assert got[10] == (10, 1, True)
    # keep-set = representatives only: exactly one survivor per cluster
    keep = [k for k, v in got.items() if v[2]]
    assert sorted(keep) == [1, 10]


def test_vocab_coverage(spark):
    from graph_data_science_spark.pipeline.text import vocab_coverage

    docs = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a b  c")],  # a:4 b:3 c:2, 9 tokens
        "doc_id long, text string",
    )
    rows = vocab_coverage(docs, top_n=2).collect()
    assert [(r["rank"], r["token"], r["n"]) for r in rows] == [(1, "a", 4), (2, "b", 3)]
    assert rows[0]["share"] == round(4 / 9, 6)
    assert rows[1]["cum_share"] == round(7 / 9, 6)
    # deterministic tie-break: equal counts order by token ascending
    ties = vocab_coverage(
        spark.createDataFrame([(1, "z y z y")], "doc_id long, text string"),
        top_n=2,
    ).collect()
    assert [r["token"] for r in ties] == ["y", "z"]


def test_bpe_token_count(spark):
    from graph_data_science_spark.pipeline.text import bpe_token_count, token_count
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("Hello, world! It's 2026 isn't it?",), ("",), ("   ",)],
        "text string",
    )
    got = df.select(
        token_count(F.col("text")).alias("ws"),
        bpe_token_count(F.col("text")).alias("bpe"),
    ).collect()
    # "Hello", ",", " world", "!", " It", "'s", " 2026", " isn", "'t",
    # " it", "?" -> 11 BPE-ish pieces vs 6 whitespace tokens
    assert (got[0]["ws"], got[0]["bpe"]) == (6, 11)
    assert (got[1]["ws"], got[1]["bpe"]) == (0, 0)
    assert got[2]["bpe"] >= 0  # whitespace-only: no letter/digit/punct runs


def test_node_similarity_bottomk_topn(spark, catalog):
    """bottomK / topN / bottomN (NodeSimilarityBaseConfig): bottomK
    ranks each node's LEAST similar neighbors; topN/bottomN cap the
    global result; conflicting combinations raise."""
    from graph_data_science_spark.algorithms.similarity import (
        NodeSimilarityConfig,
        node_similarity,
    )
    from tests.conftest import edge_df

    g = catalog.create(
        "nsim_bk",
        edge_df(spark, [(0, 10), (0, 11), (1, 10), (1, 11), (2, 10), (2, 12)]),
    )
    bottom = {
        (r["node1"], r["node2"]): r["rank"]
        for r in node_similarity(
            spark, g, NodeSimilarityConfig(bottom_k=1)
        ).collect()
    }
    # node 0's LEAST similar peer is 2 (1/3 < 1.0 vs node 1)
    assert (0, 2) in bottom and (0, 1) not in bottom

    topn = node_similarity(spark, g, NodeSimilarityConfig(top_n=2)).collect()
    assert len(topn) == 2 and all(r["similarity"] == 1.0 for r in topn)

    botn = node_similarity(spark, g, NodeSimilarityConfig(bottom_n=2)).collect()
    assert len(botn) == 2 and all(
        r["similarity"] == pytest.approx(1 / 3, abs=1e-6) for r in botn
    )

    with pytest.raises(ValueError, match="topK and bottomK"):
        node_similarity(spark, g, NodeSimilarityConfig(top_k=3, bottom_k=2)).collect()
    with pytest.raises(ValueError, match="topN and bottomN"):
        node_similarity(spark, g, NodeSimilarityConfig(top_n=1, bottom_n=1)).collect()


def test_decontaminate(spark, docs):
    # benchmark = doc 1 ("the quick brown fox jumps over the lazy dog").
    # doc 2 is an exact dup -> contamination 1.0; doc 3 shares all but
    # the final-token shingles; docs 4/5 share nothing.
    bench = docs.where(F.col("doc_id") == 1)
    corpus = docs.where(F.col("doc_id") > 1)
    got = {r["doc_id"]: r for r in dedup.decontaminate(
        corpus, bench, n=3).collect()}
    assert set(got) == {2, 3, 4, 5}
    assert got[2]["contamination"] == pytest.approx(1.0)
    assert got[2]["is_contaminated"] is True
    # doc 3: 9 tokens -> 7 distinct 3-gram shingles, 6 shared (only
    # "the lazy cat" differs)
    assert got[3]["doc_ngrams"] == 7
    assert got[3]["matched_ngrams"] == 6
    assert got[4]["matched_ngrams"] == 0 and got[4]["is_contaminated"] is False
    assert got[5]["matched_ngrams"] == 0
    # min_matched_ngrams raises the flag threshold
    strict = {r["doc_id"]: r["is_contaminated"] for r in dedup.decontaminate(
        corpus, bench, n=3, min_matched_ngrams=7).collect()}
    assert strict[2] is True and strict[3] is False
    # short docs (< n tokens) only match on exact text
    short_bench = spark.createDataFrame([(100, "tiny doc")], "doc_id long, text string")
    short_corpus = spark.createDataFrame(
        [(101, "tiny doc"), (102, "tiny dog")], "doc_id long, text string")
    s = {r["doc_id"]: r["is_contaminated"] for r in dedup.decontaminate(
        short_corpus, short_bench, n=13).collect()}
    assert s[101] is True and s[102] is False


def test_pii_scrub(spark):
    rows = [
        (1, "mail bob.smith@corp.example.com or call 555-867-5309 today"),
        (2, "ssn 123-45-6789 leaked from host 192.168.1.100 twice: 10.0.3.7"),
        (3, "clean text with no pii at all"),
        (4, "intl +1 (212) 555-0199 and a@b.io"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in text.pii_scrub(df).collect()}
    assert got[1]["n_email"] == 1 and got[1]["n_phone"] == 1
    assert got[1]["redacted"] == "mail <EMAIL> or call <PHONE> today"
    assert got[2]["n_ssn"] == 1 and got[2]["n_ipv4"] == 2
    assert got[2]["redacted"] == "ssn <SSN> leaked from host <IP> twice: <IP>"
    assert got[3]["redacted"] == got[3]["text"]
    assert all(got[3][c] == 0 for c in ("n_email", "n_ssn", "n_phone", "n_ipv4"))
    assert got[4]["n_phone"] == 1 and got[4]["n_email"] == 1
    assert got[4]["redacted"] == "intl <PHONE> and <EMAIL>"


def test_repetition_stats(spark):
    rows = [
        (1, "spam spam spam spam"),          # 1 distinct word, 1 distinct bigram
        (2, "a b a b a"),                    # top word a:3/5, top bigram "a b":2/4
        (3, "all words here are distinct"),  # no repetition
        (4, ""),                             # zero tokens
        (5, "solo"),                         # one token -> no bigrams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in text.repetition_stats(df).collect()}
    assert got[1]["n_words"] == 4
    assert got[1]["distinct_word_ratio"] == 0.25
    assert got[1]["top_word_frac"] == 1.0
    assert got[1]["top_bigram_frac"] == 1.0
    assert got[2]["top_word_frac"] == 0.6
    assert got[2]["top_bigram_frac"] == 0.5
    assert got[3]["distinct_word_ratio"] == 1.0
    assert got[3]["top_bigram_frac"] == 0.25  # every bigram unique: 1/4
    assert got[4]["n_words"] == 0 and got[4]["top_word_frac"] == 0.0
    assert got[5]["n_words"] == 1 and got[5]["top_bigram_frac"] == 0.0


def test_chunk_documents(spark):
    words = " ".join(f"w{i}" for i in range(1, 11))  # 10 tokens
    df = spark.createDataFrame(
        [(1, words), (2, "short doc"), (3, "")], "doc_id long, text string"
    )
    out = text.chunk_documents(df, max_tokens=4, overlap=1)  # stride 3
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], {})[r["chunk_idx"]] = r
    # doc 1: 10 tokens, chunks start at 1,4,7 -> [w1..w4][w4..w7][w7..w10]
    assert sorted(got[1]) == [0, 1, 2]
    assert got[1][0]["chunk_text"] == "w1 w2 w3 w4"
    assert got[1][1]["chunk_text"] == "w4 w5 w6 w7"
    assert got[1][2]["chunk_text"] == "w7 w8 w9 w10"
    assert got[1][2]["n_chunk_tokens"] == 4
    # consecutive chunks share exactly `overlap` tokens
    assert got[1][0]["chunk_text"].split()[-1] == got[1][1]["chunk_text"].split()[0]
    # doc 2 fits one window; doc 3 has zero tokens -> zero chunks
    assert sorted(got[2]) == [0] and got[2][0]["chunk_text"] == "short doc"
    assert 3 not in got
    # 11 tokens / stride 3: last window [10..13] clipped to 2 tokens
    df11 = spark.createDataFrame(
        [(9, " ".join(f"t{i}" for i in range(11)))], "doc_id long, text string"
    )
    rows = {r["chunk_idx"]: r for r in
            text.chunk_documents(df11, max_tokens=4, overlap=1).collect()}
    assert sorted(rows) == [0, 1, 2, 3]
    assert rows[3]["n_chunk_tokens"] == 2 and rows[3]["chunk_text"] == "t9 t10"
    with pytest.raises(ValueError):
        text.chunk_documents(df, max_tokens=4, overlap=4)


def test_quantize_embeddings(spark):
    rows = [
        (1, [1.0, -2.0, 0.5, 2.0]),   # max_abs 2.0 -> scale 2/127
        (2, [0.0, 0.0, 0.0, 0.0]),    # zero vector -> scale 1.0, zeros
        (3, [-127.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: r for r in ann.quantize_embeddings(df).collect()}
    assert got[1]["q_csv"] == "64,-127,32,127"  # round(1/(2/127)) = 64
    assert got[1]["scale"] == round(2.0 / 127, 8)
    assert got[2]["q_csv"] == "0,0,0,0" and got[2]["scale"] == 1.0
    assert got[2]["mse"] == 0.0
    assert got[3]["q_csv"] == "-127"
    assert got[3]["mse"] == 0.0  # exactly representable
    assert got[1]["mse"] > 0
    import pytest as _pytest
    with _pytest.raises(ValueError):
        ann.quantize_embeddings(df, bits=1)


def test_tfidf_keywords(spark):
    rows = [
        (1, "apple apple banana common"),
        (2, "banana cherry common"),
        (3, "common common dates"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = text.tfidf_keywords(df, k=2).collect()
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], []).append((r["rank"], r["keyword"], r["tf"]))
    for v in got.values():
        v.sort()
    # doc 1: apple tf=2 df=1 -> highest; 'common' df=3 has lowest idf
    assert got[1][0] == (1, "apple", 2)
    assert got[1][1][1] == "banana"
    # doc 3: 'common' tf=2 beats 'dates' tf=1 despite lower idf?
    # common: 2*(ln(4/4)+1)=2.0 ; dates: 1*(ln(4/2)+1)=1.693 -> yes
    assert got[3][0][1] == "common"
    assert got[3][1][1] == "dates"
    assert all(len(v) <= 2 for v in got.values())
    # doc 2: cherry (df=1) outranks banana (df=2) at equal tf
    assert got[2][0][1] == "cherry" and got[2][1][1] == "banana"
    # true tie (same tf, same df) breaks on the smaller word
    tie = spark.createDataFrame([(9, "zeta alpha")], "doc_id long, text string")
    t = [(r["rank"], r["keyword"]) for r in text.tfidf_keywords(tie, k=2).collect()]
    assert sorted(t) == [(1, "alpha"), (2, "zeta")]


def test_corpus_stats(spark):
    rows = [
        (1, "en", "a b c"),
        (2, "en", "a b c d e"),
        (3, "de", "x"),
        (4, "de", ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {r["lang"]: r for r in text.corpus_stats(df).collect()}
    assert got["en"]["n_docs"] == 2 and got["en"]["total_tokens"] == 8
    assert got["en"]["avg_tokens"] == 4.0
    assert got["en"]["p50_tokens"] == 4.0  # interpolated between 3 and 5
    assert got["de"]["total_tokens"] == 1
    assert got["de"]["p90_tokens"] == 0.9  # cont. interpolation of [0, 1]


def test_verify_candidates(spark, docs):
    cands = dedup.minhash_lsh_candidates(docs, num_hashes=16, bands=4)
    got = {
        (r["doc_a"], r["doc_b"]): r
        for r in dedup.verify_candidates(docs, cands, threshold=0.5).collect()
    }
    assert got[(1, 2)]["jaccard"] == 1.0 and got[(1, 2)]["is_duplicate"] is True
    # exact jaccard matches the all-pairs operator on shared pairs
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.0).collect()
    }
    for k, r in got.items():
        assert r["jaccard"] == exact.get(k, 0.0)
    # one output row per input candidate pair, even non-overlapping ones
    assert len(got) == cands.count()
    # a fabricated pair with zero overlap verifies at 0.0 / False
    fake = spark.createDataFrame([(1, 4)], "doc_a long, doc_b long")
    fr = dedup.verify_candidates(docs, fake).collect()
    assert len(fr) == 1 and fr[0]["jaccard"] == 0.0 and fr[0]["is_duplicate"] is False


def test_dedup_spans(spark):
    # spans of 3 tokens; doc 2 repeats doc 1's first span, doc 3 is
    # unique, doc 4 repeats a span of itself
    rows = [
        (1, "a b c d e f"),          # spans: "a b c", "d e f"
        (2, "a b c x y z"),          # "a b c" dups doc 1's span
        (3, "p q r"),
        (4, "m n o m n o"),          # second span dups the first
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in dedup.dedup_spans(df, span_tokens=3).collect()}
    assert got[1]["n_spans"] == 2 and got[1]["n_spans_kept"] == 2
    assert got[1]["deduped_text"] == "a b c d e f"
    assert got[2]["n_spans"] == 2 and got[2]["n_spans_kept"] == 1
    assert got[2]["deduped_text"] == "x y z"
    assert got[3]["deduped_text"] == "p q r"
    assert got[4]["n_spans_kept"] == 1 and got[4]["deduped_text"] == "m n o"
    assert got[5]["n_spans"] == 0 and got[5]["deduped_text"] == ""


def test_node_similarity_upper_degree_cutoff(spark, catalog):
    """GDS 2.3 upperDegreeCutoff: sources with more neighbors than
    the cutoff are excluded from comparison entirely — the
    reference's guard against quadratic hub sources."""
    from graph_data_science_spark.algorithms.similarity import (
        NodeSimilarityConfig,
        node_similarity,
    )
    from tests.conftest import edge_df

    # node 9 is a 4-neighbor hub; 0/1 have 2 neighbors each
    edges = [(0, 10), (0, 11), (1, 10), (1, 11)] + [
        (9, t) for t in (10, 11, 12, 13)
    ]
    g = catalog.create("nsim_udc", edge_df(spark, edges))
    got = node_similarity(
        spark, g, NodeSimilarityConfig(top_k=5, upper_degree_cutoff=2)
    ).collect()
    nodes_seen = {r["node1"] for r in got} | {r["node2"] for r in got}
    assert 9 not in nodes_seen
    pairs = {(r["node1"], r["node2"]): r["similarity"] for r in got}
    assert pairs[(0, 1)] == 1.0


def test_lsh_topk_max_bucket_size_thins_hot_bucket(spark, capsys):
    """An adversarial corpus (every vector identical direction ->
    perfect LSH collisions, the r4 sf1.0 blowup shape) lands in one
    bucket per table; max_bucket_size thins the corpus list to ~cap
    with a LOGGED count, results keep the schema/top-k contract, and
    queries still receive candidates (thinning, not bucket-drop)."""
    rng = np.random.default_rng(3)
    base = rng.standard_normal(16)
    rows = [
        (i, [float(x) for x in base + rng.standard_normal(16) * 1e-3])
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    capped = ann.lsh_topk(df, df, dim=16, k=3, n_planes=4, max_bucket_size=20)
    got = capped.collect()
    out = capsys.readouterr().out
    assert "lsh_topk: thinning" in out and "max_bucket_size=20" in out
    # every query keeps candidates and the per-query k bound holds
    assert {r["query_id"] for r in got} == set(range(200))
    per_q = {}
    for r in got:
        per_q.setdefault(r["query_id"], []).append(r)
    assert all(len(v) <= 3 for v in per_q.values())
    # the candidate universe actually shrank: an uncapped run pairs
    # every query with all 199 others; the capped corpus list holds
    # ~20 rows, so no query can have seen more than the thinned list
    uncapped = ann.lsh_topk(df, df, dim=16, k=3, n_planes=4)
    assert uncapped.count() == got.__len__() == 200 * 3


def test_lsh_topk_cap_noop_on_benign_corpus(spark, capsys):
    """Below the cap nothing is thinned, nothing is logged, and the
    result is IDENTICAL to the uncapped run."""
    rng = np.random.default_rng(9)
    rows = [(i, [float(x) for x in rng.standard_normal(16)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    plain = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in ann.lsh_topk(df, df, dim=16, k=3, n_planes=4).collect()
    }
    capped = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in ann.lsh_topk(
            df, df, dim=16, k=3, n_planes=4, max_bucket_size=1000
        ).collect()
    }
    assert "thinning" not in capsys.readouterr().out
    assert plain == capped


def test_ivf_topk_max_bucket_size_thins_degenerate_list(spark, capsys):
    """k-means on a point-mass corpus leaves one degenerate inverted
    list; the cap thins it with a logged count and every query still
    gets its k candidates."""
    rng = np.random.default_rng(5)
    base = rng.standard_normal(8)
    rows = [
        (i, [float(x) for x in base + rng.standard_normal(8) * 1e-3])
        for i in range(150)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = ann.ivf_topk(
        df, df, k=3, n_centroids=4, n_probe=1, seed=5, max_bucket_size=25
    ).collect()
    out = capsys.readouterr().out
    assert "ivf_topk: thinning" in out
    assert {r["query_id"] for r in got} == set(range(150))
    per_q = {}
    for r in got:
        per_q.setdefault(r["query_id"], []).append(r)
    assert all(len(v) <= 3 for v in per_q.values())


def test_thin_hash_matches_python_replica(spark):
    """thin_hash must equal the documented closed form exactly —
    DuckDB replays the same arithmetic (ann_lsh_capped oracle), so
    any drift breaks the value-exact capped-search gate. Checks
    extreme ids (64-bit-safety: (2^31-1)*2654435761 < 2^63) and
    negative ids (pmod semantics both sides)."""
    from graph_data_science_spark.pipeline.ann import thin_hash

    rows = [
        (0, 0, 0),
        (1, 1, 255),
        (2**31 - 1, 1, 255),
        (2**62, 0, 17),
        (-5, 1, 3),
        (123456789012345, 0, 200),
    ]
    df = spark.createDataFrame(rows, "vec_id long, table int, bucket int")
    got = {
        r["vec_id"]: r["h"]
        for r in df.select(
            "vec_id", thin_hash("vec_id", ["table", "bucket"]).alias("h")
        ).collect()
    }
    for vid, t, b in rows:
        expect = ((vid % 2**31) * 2654435761 + t * 69069 + b * 40503 + 12345) % 2**31
        assert got[vid] == expect, (vid, t, b)


def test_thin_hash_rejects_too_many_bucket_cols(spark):
    from graph_data_science_spark.pipeline.ann import thin_hash

    with pytest.raises(ValueError, match="bucket"):
        thin_hash("vec_id", ["a", "b", "c", "d"])
