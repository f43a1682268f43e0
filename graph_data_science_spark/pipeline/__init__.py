"""Large-scale training-data pipeline operators.

Beyond the reference's graph suite: deduplication (exact, n-gram
Jaccard, MinHash+LSH, SimHash, embedding cosine), similarity search
(brute-force + LSH-bucketed ANN), text analysis (language id,
quality scoring, token counting, fingerprinting) and multimodal
column plumbing. All hot paths are JVM-side column expressions or
Arrow-batched pandas UDFs — never per-row Python.

Cross-engine determinism: content hashing uses md5 (bit-identical in
Spark and DuckDB/ANSI engines), so every dedup decision is
reproducible and oracle-checkable.
"""
