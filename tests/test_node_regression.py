"""Node regression pipeline (gds.alpha.pipeline.nodeRegression
analog): CV selection, exact linear recovery, RF grid entry."""

from pyspark.sql import functions as F

from graph_data_science_spark.catalog import Graph
from graph_data_science_spark.mlpipeline.pipelines import NodeRegressionPipeline
from tests.conftest import edge_df


def _graph(spark, catalog, name, n=40):
    pairs = [(i, (i + 1) % n) for i in range(n)] + [(i, (i + 7) % n) for i in range(n)]
    g = catalog.create(name, edge_df(spark, pairs))
    nodes = spark.range(n).select(
        F.col("id"),
        (F.col("id") % 5).cast("double").alias("f1"),
        (F.col("id") % 3).cast("double").alias("f2"),
    )
    nodes = nodes.withColumn(
        "y", 2.0 * F.col("f1") - 4.0 * F.col("f2") + 1.5
    )
    return Graph(name=name + "_n", edges=g.edges, nodes=nodes, directed=False)


def test_recovers_exact_linear_target(spark, catalog):
    g = _graph(spark, catalog, "nr1")
    pipe = NodeRegressionPipeline()
    pipe.select_features(["f1", "f2"])
    model = pipe.train(spark, g, target_property="y", validation_folds=2, seed=3)
    assert model.metrics["test"]["RMSE"] < 1e-4
    assert model.metrics["test"]["R2"] > 0.9999
    pred = model.predict(spark, g)
    assert pred.count() == 40
    # spot value: id 7 -> f1=2, f2=1 -> y = 4 - 4 + 1.5 = 1.5
    got = pred.where(F.col("id") == 7).collect()[0]["prediction"]
    assert abs(got - 1.5) < 1e-3


def test_param_grid_prefers_unregularized_on_exact_data(spark, catalog):
    g = _graph(spark, catalog, "nr2")
    pipe = NodeRegressionPipeline()
    pipe.select_features(["f1", "f2"])
    pipe.set_params([{"penalty": 10.0}, {"penalty": 0.0}])
    model = pipe.train(spark, g, target_property="y", validation_folds=2, seed=3)
    # heavy L2 can't hit zero RMSE on exact-linear data; CV must pick 0.0
    assert model.best_params == {"penalty": 0.0}


def test_random_forest_trainer_runs(spark, catalog):
    g = _graph(spark, catalog, "nr3")
    pipe = NodeRegressionPipeline()
    pipe.select_features(["f1", "f2"])
    pipe.set_params([{"trainer": "rf", "num_trees": 10, "max_depth": 4}])
    model = pipe.train(spark, g, target_property="y", validation_folds=2, seed=3)
    # 15 distinct (f1, f2) cells -> a depth-4 forest fits well
    assert model.metrics["test"]["R2"] > 0.8
    assert model.predict(spark, g).count() == 40


def test_rf_classifier_trainer(spark, catalog):
    """GDS addRandomForest analog on the classification pipeline."""
    from graph_data_science_spark.mlpipeline import NodeClassificationPipeline

    g = _graph(spark, catalog, "nrc")
    nodes = g.nodes.withColumn(
        "cls", F.when(F.col("f1") >= 2.5, F.lit("hi")).otherwise(F.lit("lo"))
    )
    cg = Graph(name="nrc_cls", edges=g.edges, nodes=nodes, directed=False)
    pipe = NodeClassificationPipeline()
    pipe.select_features(["f1", "f2"])
    pipe.set_params([{"trainer": "rf", "num_trees": 10, "max_depth": 4}])
    model = pipe.train(
        spark, cg, target_property="cls", validation_folds=2, seed=5
    )
    assert model.metrics["test"]["ACCURACY"] > 0.9
