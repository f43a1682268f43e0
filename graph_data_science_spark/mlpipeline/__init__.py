from graph_data_science_spark.mlpipeline.pipelines import (  # noqa: F401
    LinkPredictionPipeline,
    NodeClassificationPipeline,
)
