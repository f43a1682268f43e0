"""graph_data_science_spark — a PySpark-native link-graph analytics engine.

A from-scratch reimplementation of the query and data-processing
capabilities of Neo4j Graph Data Science (reference at
/root/reference, chozo99/graph-data-science) on idiomatic Spark:
DataFrame/SQL plans optimized by Catalyst, vectorized pandas/Arrow
UDFs for the few kernels SQL cannot express, and a driver-side
superstep loop (the Pregel analog) with parquet checkpoint/resume.

Public surface:
    from graph_data_science_spark import GraphCatalog, Graph
    from graph_data_science_spark.algorithms import pagerank, wcc, ...
"""

from graph_data_science_spark.catalog import Graph, GraphCatalog
from graph_data_science_spark.session import get_spark

__all__ = ["Graph", "GraphCatalog", "get_spark"]

__version__ = "0.1.0"
