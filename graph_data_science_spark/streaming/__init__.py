from graph_data_science_spark.streaming.streams import (  # noqa: F401
    streaming_edge_counts,
    streaming_exact_dedup,
    streaming_session_stats,
    streaming_turn_counter,
)
