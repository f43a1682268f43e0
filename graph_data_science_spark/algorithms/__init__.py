"""Algorithm suite — the payload operators of the engine.

Tier-1 (parity-gated per BASELINE.json): pagerank / article_rank /
eigenvector, wcc, label_propagation, triangle_count, local
clustering coefficient. Plus degree centrality (a dependency) and
the shared scaler kernels.
"""

from graph_data_science_spark.algorithms.degree import degree_centrality
from graph_data_science_spark.algorithms.labelprop import label_propagation
from graph_data_science_spark.algorithms.pagerank import (
    article_rank,
    eigenvector,
    pagerank,
)
from graph_data_science_spark.algorithms.triangle import (
    local_clustering_coefficient,
    triangle_count,
)
from graph_data_science_spark.algorithms.wcc import wcc

__all__ = [
    "article_rank",
    "degree_centrality",
    "eigenvector",
    "label_propagation",
    "local_clustering_coefficient",
    "pagerank",
    "triangle_count",
    "wcc",
]
