"""ML pipelines — node classification and link prediction.

Reference semantics (re-expressed Spark-first, not ported):

* Node classification — /root/reference/alpha/alpha-algo/src/main/
  java/org/neo4j/gds/ml/nodemodels/NodeClassificationTrain.java:
  node-property feature steps, an outer holdout split, stratified
  k-fold validation over a grid of logistic-regression candidate
  configs, model selection by a classification metric (F1_WEIGHTED /
  F1_MACRO / ACCURACY, metrics/*.java), winner retrained on the full
  outer train set and scored on the holdout.
* Link prediction — /root/reference/alpha/alpha-algo/src/main/java/
  org/neo4j/gds/ml/linkmodels/pipeline/: node-property steps, link
  feature steps combining endpoint vectors (HadamardFeatureStep,
  CosineFeatureStep, L2FeatureStep under linkFeatures/linkfunctions/),
  logistic regression on positive edges vs sampled non-edges
  (EdgeSplitter), evaluated by AUCPR.

Spark-first design decisions:
* Training is Spark ML ``LogisticRegression`` (distributed LBFGS,
  JVM-side) — the reference hand-rolls batched LBFGS on HugeArrays
  (ml-core); Spark already ships the distributed equivalent.
* Splits and folds are DETERMINISTIC xxhash64 buckets, never
  ``randomSplit`` — reproducible at any partitioning/parallelism.
  Stratification comes for free: a uniform hash assigns each class's
  rows proportionally across folds (law of large numbers at web
  scale, where per-class counts are huge).
* Feature assembly stays in DataFrame land (``array_to_vector`` /
  ``VectorAssembler``); metrics are one groupBy over the confusion
  pairs — no per-row Python anywhere.
* The k-fold × grid search is a driver LOOP over Spark fits (the
  reference's BatchQueue parallelism analog is Spark's own data
  parallelism inside each fit); fits at 100 TB run sequentially but
  each is cluster-wide.
"""

from __future__ import annotations

import os

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark.catalog import Graph

_BUCKETS = 1_000_000



def _retry_py4j(fn, attempts: int = 3):
    """Retry a JVM-side ML call on the py4j object-GC race.

    Fitting many short-lived models (CV folds x param grid) races
    Python finalizers detaching JVM objects against new wrapper
    construction on the shared gateway; the symptom is a spurious
    "Target Object ID does not exist" Py4JError. The operation is
    idempotent (pure fit/transform), so retrying after a collect is
    safe and cheap."""
    import gc

    from py4j.protocol import Py4JError

    last = None
    for _ in range(attempts):
        try:
            return fn()
        except Py4JError as exc:  # pragma: no cover - timing-dependent
            # only the object-GC race is retryable; a deterministic
            # trainer failure (Py4JJavaError with a real Java stack)
            # must surface immediately, not rerun the fit 3x
            if "Target Object ID does not exist" not in str(exc):
                raise
            last = exc
            gc.collect()
    raise last


def _assemble_features(df: DataFrame, feature_cols: list[str], out: str = "features") -> DataFrame:
    """Concatenate scalar and array<numeric> columns into one ML vector."""
    from pyspark.ml.functions import array_to_vector

    parts = []
    for c in feature_cols:
        dt = dict(df.dtypes)[c]
        if dt.startswith("array"):
            parts.append(F.transform(c, lambda x: x.cast("double")))
        else:
            parts.append(F.array(F.col(c).cast("double")))
    return df.withColumn(out, array_to_vector(F.flatten(F.array(*parts))))


def _drop_training_summary(model):
    """Strip the MLlib training summary right after fit; RETURNS the
    model to keep using (possibly a reloaded replacement).

    LogisticRegressionModel.trainingSummary holds the fitting
    SparkSession; in Spark 4.1 the session's lazily-initialized
    `observationManager` is NOT serializable, so once ANY Observation
    has run in the session (the Pregel runner's per-superstep counters
    do), every task that serializes the model's transform closure dies
    with NotSerializableException: ObservationManager. The summary is
    never used here. setSummary is private[ml] in Scala — public in
    bytecode — with a save/load fallback (summaries are not persisted)
    for model classes without it (e.g. RandomForest).

    The fallback must return the LOADED wrapper itself, never graft
    its `_java_obj` onto the old wrapper: py4j detaches a JVM object
    from the gateway when its Python wrapper is garbage-collected, so
    a stolen reference dies at the temporary's first GC — the symptom
    is a later "Target Object ID does not exist" on transform.
    """
    try:
        from pyspark import SparkContext

        jvm = SparkContext._active_spark_context._jvm
        none_opt = getattr(getattr(jvm.scala, "None$"), "MODULE$")
        model._java_obj.setSummary(none_opt)
        return model
    except Exception:  # fallback for models without setSummary
        import shutil
        import tempfile
        import uuid

        path = os.path.join(
            tempfile.gettempdir(), f"gds_lrm_{uuid.uuid4().hex}"
        )
        try:
            model.write().overwrite().save(path)
            loaded = type(model).load(path)
            return loaded
        except Exception:  # pragma: no cover - API drift double-fault
            return model
        finally:
            shutil.rmtree(path, ignore_errors=True)


def _confusion(pred: DataFrame, label_col: str = "label") -> list[tuple[float, float, int]]:
    rows = (
        pred.groupBy(label_col, "prediction")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    return [(r[label_col], r["prediction"], r["n"]) for r in rows]


def _classification_metrics(conf: list[tuple[float, float, int]]) -> dict[str, float]:
    """ACCURACY / F1_WEIGHTED / F1_MACRO from confusion counts
    (reference metric definitions: nodemodels/metrics/F1Score.java,
    F1Weighted.java, AccuracyMetric.java)."""
    classes = sorted({c for c, _, _ in conf} | {p for _, p, _ in conf})
    total = sum(n for _, _, n in conf)
    correct = sum(n for c, p, n in conf if c == p)
    f1s, weights = [], []
    for k in classes:
        tp = sum(n for c, p, n in conf if c == k and p == k)
        fp = sum(n for c, p, n in conf if c != k and p == k)
        fn = sum(n for c, p, n in conf if c == k and p != k)
        prec = tp / (tp + fp) if tp + fp else 0.0
        rec = tp / (tp + fn) if tp + fn else 0.0
        f1s.append(2 * prec * rec / (prec + rec) if prec + rec else 0.0)
        weights.append(tp + fn)
    wsum = sum(weights) or 1
    return {
        "ACCURACY": correct / total if total else 0.0,
        "F1_MACRO": sum(f1s) / len(f1s) if f1s else 0.0,
        "F1_WEIGHTED": sum(f * w for f, w in zip(f1s, weights)) / wsum,
    }


@dataclass
class NodePropertyStep:
    """A `gds.<proc>` invocation mutating the graph with a new node
    property (reference pipeline/NodePropertyStep.java)."""

    proc: str
    mutate_property: str
    config: dict[str, Any] = field(default_factory=dict)

    def run(self, spark: SparkSession, graph: Graph) -> Graph:
        from graph_data_science_spark.engine import GdsEngine

        engine = GdsEngine(spark)
        proc = getattr(engine, self.proc)
        return proc(graph, **self.config).mutate(self.mutate_property)


@dataclass
class NodeClassificationModel:
    """Trained winner + metadata (reference Model<...> analog)."""

    lr_model: Any
    feature_cols: list[str]
    classes: list[Any]
    best_params: dict[str, Any]
    metrics: dict[str, dict[str, float]]
    steps: list[NodePropertyStep]

    def predict(self, spark: SparkSession, graph: Graph) -> DataFrame:
        """(id, predicted_class, probability array<double>) for every
        node — NodeClassificationPredict.java analog."""
        g = graph
        for step in self.steps:
            g = step.run(spark, g)
        from pyspark.ml.functions import vector_to_array

        feats = _assemble_features(g.nodes, self.feature_cols)
        pred = self.lr_model.transform(feats)
        classes = F.array(*[F.lit(c) for c in self.classes])
        return pred.select(
            "id",
            classes[F.col("prediction").cast("int")].alias("predicted_class"),
            vector_to_array("probability").alias("probability"),
        )


class NodeClassificationPipeline:
    """gds.beta.pipeline.nodeClassification analog.

    >>> pipe = NodeClassificationPipeline()
    >>> pipe.add_node_property("degree_centrality", "deg")
    >>> pipe.select_features(["deg"])
    >>> model = pipe.train(spark, graph, target_property="cls")
    >>> model.predict(spark, graph)
    """

    def __init__(self) -> None:
        self.steps: list[NodePropertyStep] = []
        self.feature_cols: list[str] = []
        self.param_grid: list[dict[str, Any]] = [{}]

    def add_node_property(self, proc: str, mutate_property: str, **config) -> None:
        self.steps.append(NodePropertyStep(proc, mutate_property, config))

    def select_features(self, cols: list[str]) -> None:
        self.feature_cols = list(cols)

    def set_params(self, grid: list[dict[str, Any]]) -> None:
        """Candidate trainer configs; keys: penalty (L2 regParam
        analog), max_iterations, tolerance
        (NodeLogisticRegressionTrainConfig), or trainer='rf' with
        num_trees/max_depth (GDS's RandomForestClassifier trainer,
        addRandomForest)."""
        self.param_grid = [dict(g) for g in grid] or [{}]

    def _fit(self, train: DataFrame, params: dict[str, Any]):
        if params.get("trainer", "lr") == "rf":
            from pyspark.ml.classification import RandomForestClassifier

            m = RandomForestClassifier(
                featuresCol="features",
                labelCol="label",
                numTrees=int(params.get("num_trees", 20)),
                maxDepth=int(params.get("max_depth", 5)),
                seed=int(params.get("seed", 42)),
            ).fit(train)
            return _drop_training_summary(m)
        from pyspark.ml.classification import LogisticRegression

        m = LogisticRegression(
            featuresCol="features",
            labelCol="label",
            regParam=float(params.get("penalty", 0.0)),
            maxIter=int(params.get("max_iterations", 100)),
            tol=float(params.get("tolerance", 1e-6)),
            family="multinomial",
            standardization=True,
        ).fit(train)
        return _drop_training_summary(m)

    def train(
        self,
        spark: SparkSession,
        graph: Graph,
        target_property: str,
        holdout_fraction: float = 0.3,
        validation_folds: int = 5,
        metric: str = "F1_WEIGHTED",
        seed: int = 42,
    ) -> NodeClassificationModel:
        g = graph
        for step in self.steps:
            g = step.run(spark, g)
        if g.nodes is None:
            raise ValueError("node classification needs a nodes DF with properties")

        classes = [
            r[0]
            for r in g.nodes.select(target_property).distinct().orderBy(target_property).collect()
        ]
        idx = F.array(*[F.lit(c) for c in classes])
        labeled = g.nodes.where(F.col(target_property).isNotNull())
        data = _assemble_features(labeled, self.feature_cols).withColumn(
            "label",
            F.array_position(idx, F.col(target_property)).cast("double") - 1,
        )
        # truncate the feature lineage (GraphSAGE/FastRP steps chain
        # hundreds of plan nodes): MLlib's RDD-based optimizers
        # serialize the task binary RECURSIVELY over the dependency
        # chain, and a deep chain overflows the serializer stack in
        # long-lived sessions
        data = data.localCheckpoint(eager=True)
        bucket = F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(_BUCKETS))
        test = data.where(bucket < int(holdout_fraction * _BUCKETS))
        trainval = data.where(bucket >= int(holdout_fraction * _BUCKETS)).withColumn(
            "fold", F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(validation_folds))
        )
        trainval.persist()
        try:
            scores: list[tuple[float, int]] = []
            for pi, params in enumerate(self.param_grid):
                vals = []
                for fold in range(validation_folds):
                    m = _retry_py4j(
                        lambda: self._fit(trainval.where(F.col("fold") != fold), params)
                    )
                    conf = _confusion(m.transform(trainval.where(F.col("fold") == fold)))
                    vals.append(_classification_metrics(conf)[metric])
                scores.append((sum(vals) / len(vals), pi))
            # deterministic tie-break: earlier grid entry wins
            best_pi = max(scores, key=lambda s: (s[0], -s[1]))[1]
            best_params = self.param_grid[best_pi]
            winner = _retry_py4j(lambda: self._fit(trainval, best_params))
            out_metrics = {
                "validation": {metric: max(scores)[0]},
                "train": _classification_metrics(_confusion(winner.transform(trainval))),
                "test": _classification_metrics(_confusion(winner.transform(test))),
            }
        finally:
            trainval.unpersist()
            from graph_data_science_spark.pregel import _free_local_checkpoint

            _free_local_checkpoint(data)
        return NodeClassificationModel(
            lr_model=winner,
            feature_cols=self.feature_cols,
            classes=classes,
            best_params=best_params,
            metrics=out_metrics,
            steps=self.steps,
        )


# -- link prediction --------------------------------------------------------


def _link_features(
    pairs: DataFrame, nodes: DataFrame, feature_cols: list[str], combiners: list[str]
) -> DataFrame:
    """Endpoint-feature combination (linkFeatures/linkfunctions/*):
    hadamard = elementwise product, l2 = squared difference, cosine =
    one scalar similarity — all JVM-side higher-order functions."""
    feat = _assemble_features(nodes, feature_cols, out="_fv").select(
        "id", F.col("_fv").alias("_v")
    )
    from pyspark.ml.functions import vector_to_array

    feat = feat.select("id", vector_to_array("_v").alias("_a"))
    j = (
        pairs.join(feat.withColumnRenamed("id", "src").withColumnRenamed("_a", "_sa"), "src")
        .join(feat.withColumnRenamed("id", "dst").withColumnRenamed("_a", "_da"), "dst")
    )
    parts = []
    for c in combiners:
        if c == "hadamard":
            parts.append(F.zip_with("_sa", "_da", lambda a, b: a * b))
        elif c == "l2":
            parts.append(F.zip_with("_sa", "_da", lambda a, b: (a - b) * (a - b)))
        elif c == "cosine":
            dot = F.aggregate(
                F.zip_with("_sa", "_da", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
            )
            na = F.sqrt(F.aggregate("_sa", F.lit(0.0), lambda acc, x: acc + x * x))
            nb = F.sqrt(F.aggregate("_da", F.lit(0.0), lambda acc, x: acc + x * x))
            parts.append(F.array(dot / F.when(na * nb > 0, na * nb).otherwise(F.lit(1.0))))
        else:
            raise ValueError(f"unknown link feature combiner: {c}")
    from pyspark.ml.functions import array_to_vector

    return j.withColumn("features", array_to_vector(F.flatten(F.array(*parts)))).drop(
        "_sa", "_da"
    )


@dataclass
class LinkPredictionModel:
    lr_model: Any
    feature_cols: list[str]
    combiners: list[str]
    metrics: dict[str, float]
    steps: list[NodePropertyStep]

    def predict_topn(
        self,
        spark: SparkSession,
        graph: Graph,
        top_n: int = 100,
        candidates: str = "twohop",
        max_degree: int = 1000,
    ) -> DataFrame:
        """Score candidate non-edges, return the global top-N by
        probability (LinkPrediction predict with topN bound).

        ``candidates='twohop'`` (default, the scale path) scores only
        pairs sharing a neighbor — the all-pairs candidate space of
        the reference is quadratic and is gated behind
        ``candidates='all_pairs'``. ``max_degree`` caps the wedge
        join's hub fan-out (degree-capped, non-silent: capped hubs
        still appear through their first `max_degree` edges by hash
        rank)."""
        g = graph
        for step in self.steps:
            g = step.run(spark, g)
        und = g.edges.select("src", "dst").union(
            g.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).dropDuplicates(["src", "dst"])
        if candidates == "twohop":
            from pyspark.sql.window import Window

            w = Window.partitionBy("src").orderBy(F.xxhash64("src", "dst"))
            capped = und.withColumn("_r", F.row_number().over(w)).where(
                F.col("_r") <= max_degree
            ).drop("_r")
            cand = (
                capped.select(F.col("src").alias("a"), F.col("dst").alias("mid"))
                .join(
                    capped.select(F.col("src").alias("mid"), F.col("dst").alias("b")),
                    "mid",
                )
                .select(F.col("a").alias("src"), F.col("b").alias("dst"))
                .where(F.col("src") < F.col("dst"))
                .dropDuplicates(["src", "dst"])
                .join(und, ["src", "dst"], "left_anti")
            )
        elif candidates == "all_pairs":
            v = g.vertices()
            cand = (
                v.select(F.col("id").alias("src"))
                .crossJoin(v.select(F.col("id").alias("dst")))
                .where(F.col("src") < F.col("dst"))
                .join(und, ["src", "dst"], "left_anti")
            )
        else:
            raise ValueError(f"unknown candidate strategy: {candidates}")
        feats = _link_features(cand, g.nodes, self.feature_cols, self.combiners)
        from pyspark.ml.functions import vector_to_array

        scored = self.lr_model.transform(feats).select(
            "src", "dst", vector_to_array("probability")[1].alias("probability")
        )
        return scored.orderBy(F.desc("probability"), "src", "dst").limit(top_n)


class LinkPredictionPipeline:
    """gds.beta.pipeline.linkPrediction analog."""

    def __init__(self) -> None:
        self.steps: list[NodePropertyStep] = []
        self.feature_cols: list[str] = []
        self.combiners: list[str] = []

    def add_node_property(self, proc: str, mutate_property: str, **config) -> None:
        self.steps.append(NodePropertyStep(proc, mutate_property, config))

    def add_feature(self, combiner: str, cols: list[str]) -> None:
        """Append a link-feature step (HadamardFeatureStep /
        L2FeatureStep / CosineFeatureStep analog). All steps share one
        endpoint feature-column list — the union of `cols` across
        calls."""
        if combiner not in ("hadamard", "l2", "cosine"):
            raise ValueError(f"unknown link feature combiner: {combiner}")
        for c in cols:
            if c not in self.feature_cols:
                self.feature_cols.append(c)
        self.combiners.append(combiner)

    def train(
        self,
        spark: SparkSession,
        graph: Graph,
        test_fraction: float = 0.3,
        negative_sampling_ratio: float = 1.0,
        penalty: float = 0.0,
        max_iterations: int = 100,
        seed: int = 42,
    ) -> LinkPredictionModel:
        from pyspark.ml.classification import LogisticRegression

        from graph_data_science_spark.algorithms.walking import split_relationships

        g = graph
        for step in self.steps:
            g = step.run(spark, g)
        if g.nodes is None:
            raise ValueError("link prediction needs node features")

        split = split_relationships(
            spark, g, holdout_fraction=test_fraction,
            negative_sampling_ratio=negative_sampling_ratio, seed=seed,
        )
        train_g = Graph(name=g.name + "__lptrain", edges=split["train"], nodes=g.nodes)
        neg_train = split_relationships(
            spark, train_g, holdout_fraction=1.0,
            negative_sampling_ratio=negative_sampling_ratio, seed=seed + 7,
        )["test_negative"].join(
            # anti-join against the FULL edge set, not just the train
            # split — a "negative" that is a held-out test edge would
            # leak the test set into training as a mislabeled row
            g.edges.select("src", "dst"), ["src", "dst"], "left_anti"
        )
        if not self.combiners:
            self.combiners = ["hadamard"]

        def with_label(df: DataFrame, y: int) -> DataFrame:
            return df.select("src", "dst").withColumn("label", F.lit(float(y)))

        train_pairs = with_label(split["train"], 1).unionByName(with_label(neg_train, 0))
        test_pairs = with_label(split["test"], 1).unionByName(
            with_label(split["test_negative"], 0)
        )
        # truncate the feature lineage before MLlib's RDD-based fit /
        # evaluator — they serialize the task binary recursively over
        # the dependency chain, and the GraphSAGE/FastRP feature plans
        # are deep enough to overflow the serializer stack in
        # long-lived sessions
        tr = _link_features(
            train_pairs, g.nodes, self.feature_cols, self.combiners
        ).localCheckpoint(eager=True)
        te = _link_features(
            test_pairs, g.nodes, self.feature_cols, self.combiners
        ).localCheckpoint(eager=True)
        try:
            lr = LogisticRegression(
                featuresCol="features", labelCol="label",
                regParam=penalty, maxIter=max_iterations, standardization=True,
            ).fit(tr)
            lr = _drop_training_summary(lr)

            from pyspark.ml.evaluation import BinaryClassificationEvaluator

            ev = BinaryClassificationEvaluator(
                labelCol="label", rawPredictionCol="rawPrediction", metricName="areaUnderPR"
            )
            pred = lr.transform(te)
            metrics = {
                "AUCPR": ev.evaluate(pred),
                "test_positive": test_pairs.where("label = 1").count(),
                "test_negative": test_pairs.where("label = 0").count(),
            }
        finally:
            from graph_data_science_spark.pregel import _free_local_checkpoint

            _free_local_checkpoint(tr)
            _free_local_checkpoint(te)
        return LinkPredictionModel(
            lr_model=lr,
            feature_cols=self.feature_cols,
            combiners=self.combiners,
            metrics=metrics,
            steps=self.steps,
        )


# -- node regression --------------------------------------------------------


def _regression_metrics(pred: DataFrame, label_col: str = "label") -> dict[str, float]:
    """MSE / RMSE / MAE / R2 from one aggregate pass (the metric set
    of gds.alpha.pipeline.nodeRegression; GDS 2.2+)."""
    row = pred.agg(
        F.avg((F.col("prediction") - F.col(label_col)) ** 2).alias("mse"),
        F.avg(F.abs(F.col("prediction") - F.col(label_col))).alias("mae"),
        F.var_pop(F.col(label_col)).alias("var"),
    ).collect()[0]
    mse = float(row["mse"] or 0.0)
    var = float(row["var"] or 0.0)
    return {
        "MSE": mse,
        "RMSE": mse ** 0.5,
        "MAE": float(row["mae"] or 0.0),
        "R2": 1.0 - mse / var if var > 0 else 0.0,
    }


@dataclass
class NodeRegressionModel:
    lr_model: Any
    feature_cols: list[str]
    best_params: dict[str, Any]
    metrics: dict[str, Any]
    steps: list[NodePropertyStep]

    def predict(self, spark: SparkSession, graph: Graph) -> DataFrame:
        """(id, prediction) for every node carrying the features."""
        g = graph
        for step in self.steps:
            g = step.run(spark, g)
        data = _assemble_features(g.nodes, self.feature_cols)
        return self.lr_model.transform(data).select("id", "prediction")


class NodeRegressionPipeline:
    """gds.alpha.pipeline.nodeRegression analog (GDS 2.2; the 2.0-era
    reference ships only the classification/link-prediction
    pipelines, proc/.../MLTrainProc lineage). Same shape as
    NodeClassificationPipeline: node-property mutate steps produce
    features, deterministic hash buckets give the holdout and k-fold
    splits, the param grid is cross-validated, and the winner
    refits on train+validation.

    The trainer is Spark ML LinearRegression (normal/huber losses —
    GDS's LinearRegression analog; RandomForest is a grid entry away
    via ``trainer='rf'``)."""

    def __init__(self) -> None:
        self.steps: list[NodePropertyStep] = []
        self.feature_cols: list[str] = []
        self.param_grid: list[dict[str, Any]] = [{}]

    def add_node_property(self, proc: str, mutate_property: str, **config) -> None:
        self.steps.append(NodePropertyStep(proc, mutate_property, config))

    def select_features(self, cols: list[str]) -> None:
        self.feature_cols = list(cols)

    def set_params(self, grid: list[dict[str, Any]]) -> None:
        """Keys: penalty (regParam), max_iterations, tolerance,
        trainer ('lr' | 'rf'), rf params (num_trees, max_depth)."""
        self.param_grid = [dict(g) for g in grid] or [{}]

    def _fit(self, train: DataFrame, params: dict[str, Any]):
        if params.get("trainer", "lr") == "rf":
            from pyspark.ml.regression import RandomForestRegressor

            m = RandomForestRegressor(
                featuresCol="features",
                labelCol="label",
                numTrees=int(params.get("num_trees", 20)),
                maxDepth=int(params.get("max_depth", 5)),
                seed=int(params.get("seed", 42)),
            ).fit(train)
        else:
            from pyspark.ml.regression import LinearRegression

            m = LinearRegression(
                featuresCol="features",
                labelCol="label",
                regParam=float(params.get("penalty", 0.0)),
                maxIter=int(params.get("max_iterations", 100)),
                tol=float(params.get("tolerance", 1e-6)),
                standardization=True,
            ).fit(train)
        return _drop_training_summary(m)

    def train(
        self,
        spark: SparkSession,
        graph: Graph,
        target_property: str,
        holdout_fraction: float = 0.3,
        validation_folds: int = 5,
        metric: str = "RMSE",
        seed: int = 42,
    ) -> NodeRegressionModel:
        g = graph
        for step in self.steps:
            g = step.run(spark, g)
        if g.nodes is None:
            raise ValueError("node regression needs a nodes DF with properties")
        labeled = g.nodes.where(F.col(target_property).isNotNull())
        data = _assemble_features(labeled, self.feature_cols).withColumn(
            "label", F.col(target_property).cast("double")
        )
        data = data.localCheckpoint(eager=True)
        bucket = F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(_BUCKETS))
        test = data.where(bucket < int(holdout_fraction * _BUCKETS))
        trainval = data.where(bucket >= int(holdout_fraction * _BUCKETS)).withColumn(
            "fold", F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(validation_folds))
        )
        trainval.persist()
        try:
            # lower-is-better metrics flip the selection sign
            sign = -1.0 if metric in ("MSE", "RMSE", "MAE") else 1.0
            scores: list[tuple[float, int]] = []
            for pi, params in enumerate(self.param_grid):
                vals = []
                for fold in range(validation_folds):
                    m = _retry_py4j(
                        lambda: self._fit(trainval.where(F.col("fold") != fold), params)
                    )
                    vals.append(
                        _regression_metrics(
                            m.transform(trainval.where(F.col("fold") == fold))
                        )[metric]
                    )
                scores.append((sign * sum(vals) / len(vals), pi))
            best_pi = max(scores, key=lambda s: (s[0], -s[1]))[1]
            best_params = self.param_grid[best_pi]
            winner = _retry_py4j(lambda: self._fit(trainval, best_params))
            out_metrics = {
                "validation": {metric: sign * max(scores)[0]},
                "train": _regression_metrics(winner.transform(trainval)),
                "test": _regression_metrics(winner.transform(test)),
            }
        finally:
            trainval.unpersist()
            from graph_data_science_spark.pregel import _free_local_checkpoint

            _free_local_checkpoint(data)
        return NodeRegressionModel(
            lr_model=winner,
            feature_cols=self.feature_cols,
            best_params=best_params,
            metrics=out_metrics,
            steps=self.steps,
        )
