"""spark-submit entry point — run one training-data pipeline operator
over a document (or embedding) table.

Cluster usage (same deployment shape as jobs/run_algorithm.py):

    zip -r gds_spark.zip graph_data_science_spark
    spark-submit --py-files gds_spark.zip jobs/run_pipeline.py \\
        --operator minhash_lsh \\
        --input iceberg_cat.db.documents \\   # or a parquet path
        --output /out/candidates \\
        --config '{"num_hashes": 16, "bands": 4}'

The input is a document table (doc_id, text, ...) for the text/dedup
operators or an embedding table (vec_id, embedding) for the vector
operators; the job runs the operator, writes the result as parquet,
and prints one JSON line of run metrics (rows, wall seconds).

Local smoke:
    python jobs/run_pipeline.py --operator exact_dedup \\
        --input /root/testdata/sf0.001/documents.parquet --output /tmp/dups
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def _read(spark: SparkSession, path_or_table: str):
    if os.path.exists(path_or_table) or path_or_table.startswith(
        ("/", "file:", "hdfs:", "s3:", "s3a:", "gs:", "abfs:")
    ):
        return spark.read.parquet(path_or_table)
    return spark.read.table(path_or_table)


def _op_exact_dedup(spark, df, cfg):
    from graph_data_science_spark.pipeline import dedup

    return dedup.exact_duplicates(df, **cfg)


def _op_minhash_lsh(spark, df, cfg):
    from graph_data_science_spark.pipeline import dedup

    return dedup.minhash_lsh_candidates(df, **cfg)


def _op_dedup_clusters(spark, df, cfg):
    from graph_data_science_spark.pipeline import dedup

    return dedup.dedup_clusters(df, **cfg)


def _op_simhash(spark, df, cfg):
    from graph_data_science_spark.pipeline import dedup

    return dedup.simhash_near_duplicates(df, **cfg)


def _op_dedup_spans(spark, df, cfg):
    from graph_data_science_spark.pipeline import dedup

    return dedup.dedup_spans(df, **cfg)


def _op_verify_candidates(spark, df, cfg):
    from graph_data_science_spark.pipeline import dedup

    pairs_path = cfg.pop("pairs_input", None)
    pairs = (
        _read(spark, pairs_path)
        if pairs_path
        else dedup.minhash_lsh_candidates(df)
    )
    return dedup.verify_candidates(df, pairs, **cfg)


def _op_decontaminate(spark, df, cfg):
    from graph_data_science_spark.pipeline import dedup

    bench_path = cfg.pop("benchmark_input")
    return dedup.decontaminate(df, _read(spark, bench_path), **cfg)


def _op_pii_scrub(spark, df, cfg):
    from graph_data_science_spark.pipeline import text

    return text.pii_scrub(df, **cfg)


def _op_repetition_stats(spark, df, cfg):
    from graph_data_science_spark.pipeline import text

    return text.repetition_stats(df, **cfg)


def _op_doc_chunks(spark, df, cfg):
    from graph_data_science_spark.pipeline import text

    return text.chunk_documents(df, **cfg)


def _op_tfidf_keywords(spark, df, cfg):
    from graph_data_science_spark.pipeline import text

    return text.tfidf_keywords(df, **cfg)


def _op_corpus_stats(spark, df, cfg):
    from graph_data_science_spark.pipeline import text

    return text.corpus_stats(df, **cfg)


def _op_quality(spark, df, cfg):
    from graph_data_science_spark.pipeline import text

    return text.quality_score(df, **cfg)


def _op_language_id(spark, df, cfg):
    from graph_data_science_spark.pipeline import text

    return text.language_id(df, **cfg)


def _op_token_stats(spark, df, cfg):
    from graph_data_science_spark.pipeline import text

    return text.add_token_stats(df, **cfg)


def _op_mix_corpus(spark, df, cfg):
    from graph_data_science_spark.pipeline import sampling

    targets = cfg.pop("targets")
    return sampling.mix_corpus(df, targets, **cfg)


def _op_source_caps(spark, df, cfg):
    from graph_data_science_spark.pipeline import sampling

    return sampling.source_caps(df, **cfg)


def _op_temperature_mix(spark, df, cfg):
    from graph_data_science_spark.pipeline import sampling

    return sampling.temperature_mix(df, **cfg)


def _op_weighted_sample(spark, df, cfg):
    from graph_data_science_spark.pipeline import sampling

    weight_col = cfg.pop("weight_col")
    return sampling.weighted_sample(df, weight_col, **cfg)


def _op_quantize(spark, df, cfg):
    from graph_data_science_spark.pipeline import ann

    return ann.quantize_embeddings(df, **cfg)


def _op_jl_project(spark, df, cfg):
    from graph_data_science_spark.pipeline import ann

    cfg.setdefault("in_dim", len(df.select("embedding").first()[0]))
    return ann.jl_project(df, **cfg)


def _op_pca_project(spark, df, cfg):
    from graph_data_science_spark.pipeline import linalg

    cfg.setdefault("in_dim", len(df.select("embedding").first()[0]))
    out, _model = linalg.pca_embeddings(df, **cfg)
    return out


def _op_group_split(spark, df, cfg):
    from graph_data_science_spark.pipeline import sampling

    return sampling.group_split(df, **cfg)


def _op_ann_topk(spark, df, cfg):
    from graph_data_science_spark.pipeline import ann

    return ann.similarity_topk(df, df, **cfg)


def _op_semantic_dedup(spark, df, cfg):
    from graph_data_science_spark.pipeline import ann

    cfg.setdefault("dim", len(df.select("embedding").first()[0]))
    return ann.semantic_dedup(df, **cfg)


def _op_vocab_coverage(spark, df, cfg):
    from graph_data_science_spark.pipeline import text

    return text.vocab_coverage(df, **cfg)


def _op_time_rollup(spark, df, cfg):
    from graph_data_science_spark.pipeline import temporal

    return temporal.time_rollup(df, **cfg)


def _op_corpus_filter(spark, df, cfg):
    from graph_data_science_spark.pipeline import text

    if "mean_word_len_range" in cfg:
        cfg["mean_word_len_range"] = tuple(cfg["mean_word_len_range"])
    return text.corpus_filter(df, **cfg)


def _op_pack_sequences(spark, df, cfg):
    from graph_data_science_spark.pipeline import text

    return text.pack_sequences(df, **cfg)


def _op_ccnet_buckets(spark, df, cfg):
    from graph_data_science_spark.pipeline import text

    return text.ccnet_buckets(df, **cfg)


def _op_kmeans(spark, df, cfg):
    from graph_data_science_spark.pipeline import ann

    return ann.kmeans_lloyd(df, **cfg)


def _op_render_chat(spark, df, cfg):
    from graph_data_science_spark.sources import transcripts

    return transcripts.render_chat(df)


def _op_conversation_dedup(spark, df, cfg):
    from graph_data_science_spark.sources import transcripts

    return transcripts.conversation_dedup(df)


def _op_incremental_dedup(spark, df, cfg):
    from graph_data_science_spark.pipeline import dedup

    seen_path = cfg.pop("seen_input")
    return dedup.incremental_dedup(df, _read(spark, seen_path), **cfg)


def _op_table_profile(spark, df, cfg):
    from graph_data_science_spark.pipeline import profile

    return profile.profile_table(df, **cfg)


def _op_nb_classifier(spark, df, cfg):
    from graph_data_science_spark.pipeline import classify

    return classify.nb_classifier(df, **cfg)


def _op_dsir_weights(spark, df, cfg):
    from graph_data_science_spark.pipeline import classify

    # target rows selected by a SQL predicate over the same input,
    # e.g. {"target_where": "lang = 'en'"}
    where = cfg.pop("target_where", "1=1")
    return classify.dsir_weights(df, df.where(where), **cfg)


def _op_binary_auc(spark, df, cfg):
    from graph_data_science_spark.pipeline import evaluate

    return evaluate.binary_auc(df, **cfg)


def _op_classification_report(spark, df, cfg):
    from graph_data_science_spark.pipeline import evaluate

    return evaluate.classification_report(df, **cfg)


def _op_char_entropy(spark, df, cfg):
    from graph_data_science_spark.pipeline import text

    return text.char_entropy(df, **cfg)


def _op_corpus_divergence(spark, df, cfg):
    from graph_data_science_spark.pipeline import text

    # split one input into the two corpora by a predicate, e.g.
    # {"a_where": "lang = 'en'", "b_where": "lang <> 'en'"}
    a_where = cfg.pop("a_where", "1=1")
    b_where = cfg.pop("b_where", "1=1")
    return text.corpus_divergence(df.where(a_where), df.where(b_where), **cfg)


def _op_hard_negatives(spark, df, cfg):
    from graph_data_science_spark.pipeline import ann

    return ann.hard_negatives(df, **cfg)


def _op_knn_label_agreement(spark, df, cfg):
    from graph_data_science_spark.pipeline import ann

    return ann.knn_label_agreement(df, **cfg)


def _op_categorical_similarity(spark, df, cfg):
    from graph_data_science_spark.algorithms.similarity import (
        CategoricalSimilarityConfig,
        categorical_similarity,
    )

    item_col = cfg.pop("item_col", "item")
    category_col = cfg.pop("category_col", "category")
    return categorical_similarity(
        df, CategoricalSimilarityConfig(**cfg), item_col, category_col
    )


def _op_bpe_train(spark, df, cfg):
    from graph_data_science_spark.pipeline.text import bpe_train

    return bpe_train(df, **cfg).merge_table


def _op_bpe_encode(spark, df, cfg):
    from graph_data_science_spark.pipeline.text import bpe_encode, bpe_train

    n_merges = cfg.pop("n_merges", 8)
    trained = bpe_train(df, n_merges=n_merges, **{
        k: v for k, v in cfg.items() if k in ("text_col", "min_pair_count")
    })
    return bpe_encode(
        df, trained,
        text_col=cfg.get("text_col", "text"),
        id_col=cfg.get("id_col", "doc_id"),
    )


def _op_hdbscan(spark, df, cfg):
    from graph_data_science_spark.algorithms.hdbscan import hdbscan

    cfg.setdefault("id_col", "vec_id")
    return hdbscan(spark, df, **cfg).clusters


def _op_kge_score(spark, df, cfg):
    """df = node embeddings; cfg['edges'] = parquet path/table of
    (src, dst) pairs to score."""
    from graph_data_science_spark.pipeline.kge import kge_score

    edges = _read(spark, cfg.pop("edges"))
    cfg.setdefault("id_col", "vec_id")
    return kge_score(df, edges, **cfg)


OPERATORS = {
    "exact_dedup": _op_exact_dedup,
    "minhash_lsh": _op_minhash_lsh,
    "dedup_clusters": _op_dedup_clusters,
    "dedup_spans": _op_dedup_spans,
    "verify_candidates": _op_verify_candidates,
    "simhash_near_duplicates": _op_simhash,
    "decontaminate": _op_decontaminate,
    "pii_scrub": _op_pii_scrub,
    "repetition_stats": _op_repetition_stats,
    "doc_chunks": _op_doc_chunks,
    "tfidf_keywords": _op_tfidf_keywords,
    "corpus_stats": _op_corpus_stats,
    "quality_score": _op_quality,
    "language_id": _op_language_id,
    "token_stats": _op_token_stats,
    "mix_corpus": _op_mix_corpus,
    "source_caps": _op_source_caps,
    "temperature_mix": _op_temperature_mix,
    "weighted_sample": _op_weighted_sample,
    "quantize_embeddings": _op_quantize,
    "ann_topk": _op_ann_topk,
    "semantic_dedup": _op_semantic_dedup,
    "vocab_coverage": _op_vocab_coverage,
    "time_rollup": _op_time_rollup,
    "corpus_filter": _op_corpus_filter,
    "pack_sequences": _op_pack_sequences,
    "ccnet_buckets": _op_ccnet_buckets,
    "kmeans": _op_kmeans,
    "render_chat": _op_render_chat,
    "conversation_dedup": _op_conversation_dedup,
    "incremental_dedup": _op_incremental_dedup,
    "table_profile": _op_table_profile,
    "jl_project": _op_jl_project,
    "pca_project": _op_pca_project,
    "group_split": _op_group_split,
    "nb_classifier": _op_nb_classifier,
    "dsir_weights": _op_dsir_weights,
    "binary_auc": _op_binary_auc,
    "classification_report": _op_classification_report,
    "char_entropy": _op_char_entropy,
    "corpus_divergence": _op_corpus_divergence,
    "hard_negatives": _op_hard_negatives,
    "knn_label_agreement": _op_knn_label_agreement,
    "categorical_similarity": _op_categorical_similarity,
    "bpe_train": _op_bpe_train,
    "bpe_encode": _op_bpe_encode,
    "hdbscan": _op_hdbscan,
    "kge_score": _op_kge_score,
}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--operator", required=True, choices=sorted(OPERATORS))
    p.add_argument("--input", required=True, help="document/embedding table or path")
    p.add_argument("--output", required=True)
    p.add_argument("--config", default="{}", help="JSON operator config")
    args = p.parse_args()
    cfg = json.loads(args.config)

    spark = SparkSession.builder.appName(f"gds-pipeline-{args.operator}").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    df = _read(spark, args.input)
    t0 = time.monotonic()
    out = OPERATORS[args.operator](spark, df, cfg)
    out.write.mode("overwrite").parquet(args.output)
    rows = spark.read.parquet(args.output).count()
    print(
        json.dumps(
            {
                "operator": args.operator,
                "rows": rows,
                "wall_sec": round(time.monotonic() - t0, 3),
                "output": args.output,
            }
        )
    )


if __name__ == "__main__":
    main()
