from graph_data_science_spark.sources import events

__all__ = ["events"]
