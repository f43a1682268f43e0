"""GraphSAGE — inductive node embeddings (mean aggregator).

Reference semantics (re-expressed Spark-first, not ported):
* Mean aggregator — /root/reference/algo/src/main/java/org/neo4j/gds/
  embeddings/graphsage/MeanAggregator.java:33-35:
  ``h_v^k = act(W_k · MEAN({h_v^(k-1)} ∪ {h_u^(k-1), u ∈ N(v)}))``
  (self row INCLUDED in the mean, ONE weight matrix per layer).
* Unsupervised loss — GraphSageLoss.java:92-105:
  ``-log σ(z_u·z_pos) - Q·log σ(-z_u·z_neg)`` with walk-sampled
  positives and random negatives (Q = negativeSampleWeight).
* Training loop — GraphSageModelTrainer.java:112-182: epochs of
  Adam updates on batch-averaged gradients, relative-loss tolerance
  early stop; final embeddings row-L2-normalized
  (GraphSageHelper.java:180 "normalizeRows").

Spark-first split of work:
* TRAINING fits the (tiny) layer weights on a BOUNDED, deterministic
  sample of the graph collected to the driver — numpy forward/backward
  with Adam. The parameter count is a few thousand floats; the sample
  is capped (`sample_nodes` × `fanout` per hop), so driver memory is
  bounded regardless of graph size. This mirrors the reference, whose
  training also only ever sees sampled neighborhoods of batched nodes.
* INFERENCE (the 100-TB path) is fully distributed: each layer is one
  hub-capped neighbor join + posexplode/avg gather (JVM-side), then a
  single Arrow-batched ``mapInPandas`` matmul+activation with the
  broadcast weights — no per-row Python, no driver data.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark.catalog import Graph


@dataclass
class GraphSageConfig:
    embedding_dim: int = 64
    sample_sizes: list[int] = field(default_factory=lambda: [25, 10])
    activation: str = "sigmoid"  # reference default (GraphSageTrainConfig)
    epochs: int = 5
    max_iterations: int = 20
    learning_rate: float = 0.01
    tolerance: float = 1e-4
    negative_sample_weight: int = 20
    batch_size: int = 256
    sample_nodes: int = 256  # driver-side training sample cap (roots)
    feature_properties: list[str] | None = None
    #: True aggregates the relationship-weighted neighbor mean
    #: (MeanAggregator.java:35 weighted formula; the self row keeps
    #: weight 1). Training stays unweighted — the reference's weight
    #: factor only scales the LOSS term (GraphSageLoss.java:110-117),
    #: not the sampled-gradient geometry this driver-side fit uses.
    relationship_weight: bool = False
    seed: int = 42


def _activation(name: str):
    if name == "sigmoid":
        return (lambda x: 1.0 / (1.0 + np.exp(-x))), (lambda y: y * (1.0 - y))
    if name == "relu":
        return (lambda x: np.maximum(x, 0.0)), (lambda y: (y > 0).astype(y.dtype))
    raise ValueError(f"unknown activation: {name}")


def _node_features(g: Graph, cfg: GraphSageConfig) -> DataFrame:
    """(id, feat array<double>) — configured property columns, or
    log1p(degree) when none given (the reference's degree-as-property
    fallback)."""
    if cfg.feature_properties and g.nodes is not None:
        parts = []
        dts = dict(g.nodes.dtypes)
        for c in cfg.feature_properties:
            if dts[c].startswith("array"):
                parts.append(F.transform(c, lambda x: x.cast("double")))
            else:
                parts.append(F.array(F.col(c).cast("double")))
        return g.nodes.select("id", F.flatten(F.array(*parts)).alias("feat"))
    deg = (
        g.edges.select(F.col("src").alias("id"))
        .unionAll(g.edges.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("_d"))
    )
    return g.vertices().join(deg, "id", "left").select(
        "id", F.array(F.log1p(F.coalesce("_d", F.lit(0)))).alias("feat")
    )


def _neighbors(g: Graph, weighted: bool = False) -> DataFrame:
    """Symmetric (v, nbr, w) pairs — GraphSAGE aggregates over the
    undirected neighborhood of the projected graph. ``w`` is the
    relationship weight when ``weighted`` (parallel duplicates keep
    their max), else 1.0."""
    wcol = (
        F.coalesce(F.col("weight"), F.lit(1.0)).cast("double")
        if weighted and "weight" in g.edges.columns
        else F.lit(1.0)
    )
    e = g.edges.select("src", "dst", wcol.alias("w"))
    return (
        e.unionAll(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
        )
        .where(F.col("src") != F.col("dst"))
        .groupBy(F.col("src").alias("v"), F.col("dst").alias("nbr"))
        .agg(F.max("w").alias("w"))
    )


def _mean_with_self(h: DataFrame, nbrs: DataFrame, fanout: int) -> DataFrame:
    """(id, vec) -> (id, vec) where vec = weighted mean of own
    (weight 1) + up-to-`fanout` neighbor vectors (MeanAggregator
    weighted formula; plain mean when all weights are 1). Hub cap via
    per-v hash rank (partitioned window, never global); the gather is
    posexplode + sum(w·x)/sum(w), all JVM-side."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("v").orderBy(F.xxhash64("v", "nbr"))
    capped = (
        nbrs.withColumn("_r", F.row_number().over(w)).where(F.col("_r") <= fanout).drop("_r")
    )
    contrib = capped.join(
        h.withColumnRenamed("id", "nbr"), "nbr"
    ).select(F.col("v").alias("id"), "vec", "w").unionAll(
        h.select("id", "vec", F.lit(1.0).alias("w"))
    )
    return (
        contrib.select("id", "w", F.posexplode("vec").alias("pos", "x"))
        .groupBy("id", "pos")
        .agg((F.sum(F.col("w") * F.col("x")) / F.sum("w")).alias("m"))
        .groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("_s"))
        .select("id", F.transform("_s", lambda s: s["m"]).alias("vec"))
    )


def _apply_layer(spark: SparkSession, df: DataFrame, W: np.ndarray, act_name: str,
                 normalize: bool) -> DataFrame:
    """vec -> act(W @ vec) via one Arrow-batched matmul per batch."""
    import pandas as pd

    bW = spark.sparkContext.broadcast(W)
    act, _ = _activation(act_name)
    out_dim = W.shape[0]

    def part(batches):
        for pdf in batches:
            M = np.array(pdf["vec"].tolist(), dtype=np.float64)
            Z = act(M @ bW.value.T)
            if normalize:
                n = np.linalg.norm(Z, axis=1, keepdims=True)
                Z = Z / np.where(n > 0, n, 1.0)
            yield pd.DataFrame({"id": pdf["id"], "vec": list(Z)})

    return df.mapInPandas(part, "id long, vec array<double>")


def _sample_subgraph(g: Graph, cfg: GraphSageConfig, feats: DataFrame):
    """Deterministic bounded sample for driver-side weight fitting:
    `sample_nodes` hash-chosen roots, their capped neighbor lists, and
    features for the closed set. Returns (ids, feat_matrix, adj dict)."""
    from pyspark.sql.window import Window

    roots = (
        g.vertices()
        .orderBy(F.pmod(F.xxhash64("id", F.lit(cfg.seed)), F.lit(1_000_000)), "id")
        .limit(cfg.sample_nodes)
    )
    nbrs = _neighbors(g)
    fan = max(cfg.sample_sizes) if cfg.sample_sizes else 10
    w = Window.partitionBy("v").orderBy(F.xxhash64("v", "nbr", F.lit(cfg.seed)))
    capped = nbrs.withColumn("_r", F.row_number().over(w)).where(F.col("_r") <= fan)
    frontier = roots.select(F.col("id").alias("v"))
    closure = frontier
    # hop h expands by at most sample_sizes[h] neighbors per node, so
    # |closure| ≤ sample_nodes · Π sample_sizes — a driver-safe bound
    for hop_fan in cfg.sample_sizes:
        frontier = (
            capped.where(F.col("_r") <= hop_fan)
            .join(frontier, "v", "left_semi")
            .select(F.col("nbr").alias("v"))
            .distinct()
        )
        closure = closure.unionAll(frontier).distinct()
    sub_edges = (
        capped.join(closure, "v", "left_semi")
        .join(closure.withColumnRenamed("v", "nbr"), "nbr", "left_semi")
        .select("v", "nbr")
    )
    rows = closure.join(feats, closure["v"] == feats["id"]).select("id", "feat").collect()
    ids = [r["id"] for r in rows]
    X = np.array([r["feat"] for r in rows], dtype=np.float64)
    pos = {v: i for i, v in enumerate(ids)}
    erows = [
        (pos[r["v"]], pos[r["nbr"]])
        for r in sub_edges.collect()
        if r["v"] in pos and r["nbr"] in pos
    ]
    ei = np.array([a for a, _ in erows], dtype=np.int64)
    ej = np.array([b for _, b in erows], dtype=np.int64)
    return ids, X, (ei, ej)


def _forward(X, edges, Ws, act):
    """Numpy mirror of the distributed layer: mean(self ∪ nbrs) then
    act(W@·) — used only for driver-side training. The gather is one
    vectorized scatter-add over the (ei, ej) edge index arrays."""
    ei, ej = edges
    n = X.shape[0]
    cnt = np.ones(n)
    np.add.at(cnt, ei, 1.0)
    H = X
    outs = []
    for W in Ws:
        M = H.copy()
        if len(ei):
            np.add.at(M, ei, H[ej])
        M /= cnt[:, None]
        H = act(M @ W.T)
        outs.append((M, H))
    return outs


def _train_weights(X, edges, cfg: GraphSageConfig) -> list[np.ndarray]:
    """Adam on the unsupervised sigmoid-affinity loss
    (GraphSageLoss.java:92-105). Gradients via finite-layer backprop
    on the small sample; deterministic rng(seed)."""
    ei, ej = edges
    rng = np.random.default_rng(cfg.seed)
    act, dact = _activation(cfg.activation)
    dims = [X.shape[1]] + [cfg.embedding_dim] * len(cfg.sample_sizes)
    Ws = [
        rng.standard_normal((dims[k + 1], dims[k])) / np.sqrt(max(dims[k], 1))
        for k in range(len(cfg.sample_sizes))
    ]
    n = X.shape[0]
    if not len(ei):
        return Ws
    cnt = np.ones(n)
    np.add.at(cnt, ei, 1.0)
    # positive sample per node: its hash-first neighbor (walk depth 1)
    first_nbr = np.full(n, -1, dtype=np.int64)
    for a, b in zip(ei[::-1], ej[::-1]):  # reversed so the FIRST edge wins
        first_nbr[a] = b
    with_nbrs = np.where(first_nbr >= 0)[0]
    mom = [np.zeros_like(W) for W in Ws]
    vel = [np.zeros_like(W) for W in Ws]
    b1, b2, eps, t = 0.9, 0.999, 1e-8, 0
    prev_loss = np.inf
    Q = cfg.negative_sample_weight
    for _ in range(cfg.epochs * cfg.max_iterations):
        batch = rng.choice(with_nbrs, size=min(cfg.batch_size, len(with_nbrs)), replace=False)
        pos = first_nbr[batch]
        neg = rng.integers(0, n, size=len(batch))
        outs = _forward(X, edges, Ws, act)
        Z = outs[-1][1]
        zu, zp, zn = Z[batch], Z[pos], Z[neg]
        ap = np.einsum("ij,ij->i", zu, zp)
        an = np.einsum("ij,ij->i", zu, zn)
        sp, sn = 1 / (1 + np.exp(-ap)), 1 / (1 + np.exp(an))
        loss = float(np.mean(-np.log(sp + 1e-12) - Q * np.log(sn + 1e-12)))
        # dL/dZ rows (only batch/pos/neg rows are nonzero)
        dZ = np.zeros_like(Z)
        gp = -(1 - sp)  # d/dap of -log σ(ap)
        gn = Q * (1 - sn)  # d/dan of -Q log σ(-an)
        np.add.at(dZ, batch, gp[:, None] * zp + gn[:, None] * zn)
        np.add.at(dZ, pos, gp[:, None] * zu)
        np.add.at(dZ, neg, gn[:, None] * zu)
        dZ /= len(batch)
        # backprop through layers (mean-gather is a fixed linear op:
        # transpose scatter shares dM/cnt back to self and neighbors)
        grads = []
        dH = dZ
        for k in range(len(Ws) - 1, -1, -1):
            M, H = outs[k]
            dA = dH * dact(H)
            grads.append(dA.T @ M)
            if k > 0:
                dM = dA @ Ws[k]
                dMc = dM / cnt[:, None]
                dH = dMc.copy()
                np.add.at(dH, ej, dMc[ei])
        grads.reverse()
        t += 1
        for k, gW in enumerate(grads):
            mom[k] = b1 * mom[k] + (1 - b1) * gW
            vel[k] = b2 * vel[k] + (1 - b2) * gW * gW
            mhat = mom[k] / (1 - b1**t)
            vhat = vel[k] / (1 - b2**t)
            Ws[k] -= cfg.learning_rate * mhat / (np.sqrt(vhat) + eps)
        if prev_loss != np.inf and abs((loss - prev_loss) / prev_loss) < cfg.tolerance:
            break
        prev_loss = loss
    return Ws


@dataclass
class GraphSageModel:
    config: GraphSageConfig
    weights: list[np.ndarray]

    def predict(self, spark: SparkSession, g: Graph) -> DataFrame:
        """(id, embedding array<double>) for EVERY node — distributed
        layer rollout (GraphSageEmbeddingsGenerator analog)."""
        from graph_data_science_spark.pregel import _free_local_checkpoint

        cfg = self.config
        feats = _node_features(g, cfg)
        nbrs = _neighbors(g, cfg.relationship_weight).persist()
        h = feats.select("id", F.col("feat").alias("vec"))
        prev = None
        n_layers = len(self.weights)
        for k, W in enumerate(self.weights):
            fan = cfg.sample_sizes[k] if k < len(cfg.sample_sizes) else 10
            gathered = _mean_with_self(h, nbrs, fanout=fan)
            # materialize each layer: the gather references h TWICE
            # (self branch + neighbor branch) and Spark does not share
            # common subtrees across a union — without truncation
            # layer k would recompute layer k-1 twice (2^L blowup)
            h = _apply_layer(
                spark, gathered, W, cfg.activation, normalize=(k == n_layers - 1)
            ).localCheckpoint(eager=True)
            if prev is not None:
                _free_local_checkpoint(prev)
            prev = h
        nbrs.unpersist()
        return h.select("id", F.col("vec").alias("embedding"))


def graphsage_train(
    spark: SparkSession,
    g: Graph,
    model_name: str | None = None,
    model_catalog=None,
    username: str = "",
    **kwargs,
) -> GraphSageModel:
    """Train; with ``model_name`` the result also registers in the
    model catalog under algo type "graphSage" (GraphSageTrainProc
    stores to ModelCatalog — GraphSageTrainProc.java + Model.java)."""
    cfg = GraphSageConfig(**kwargs)
    feats = _node_features(g, cfg)
    _, X, edge_idx = _sample_subgraph(g, cfg, feats)
    Ws = _train_weights(X, edge_idx, cfg)
    model = GraphSageModel(config=cfg, weights=Ws)
    if model_name is not None:
        from dataclasses import asdict

        from graph_data_science_spark.models import MODEL_CATALOG, Model

        catalog = model_catalog if model_catalog is not None else MODEL_CATALOG
        catalog.set(
            Model(
                creator=username,
                name=model_name,
                algo_type="graphSage",
                data={"weights": Ws},
                train_config={
                    k: v for k, v in asdict(cfg).items()
                    if isinstance(v, (int, float, str, bool, list, type(None)))
                },
                custom_info={"n_layers": len(Ws)},
            )
        )
    return model


def graphsage(spark: SparkSession, g: Graph, **kwargs) -> DataFrame:
    """Train + predict in one call (gds.beta.graphSage.stream analog)."""
    model = graphsage_train(spark, g, **kwargs)
    return model.predict(spark, g)
