"""Model catalog (models.py) vs reference semantics:
ModelCatalog.java:29-61, OpenModelCatalog.java:44-160,
OpenUserCatalog.java:37,118-176, Model.java:44-96, and the
gds.alpha.model.store round-trip (ModelStoreProc analog)."""

import numpy as np
import pytest

from graph_data_science_spark.catalog import Graph
from graph_data_science_spark.models import (
    ALL_USERS,
    ALLOWED_MODELS_COUNT,
    Model,
    ModelCatalog,
    load_model,
)
from tests.conftest import edge_df


def _m(name, creator="alice", algo="graphSage", **kw):
    return Model(creator=creator, name=name, algo_type=algo, **kw)


def test_set_get_exists_list_drop():
    cat = ModelCatalog()
    cat.set(_m("m1", train_config={"dim": 8}))
    assert cat.exists("alice", "m1")
    assert not cat.exists("bob", "m1")
    got = cat.get("alice", "m1")
    assert got.algo_type == "graphSage"
    rows = cat.list("alice")
    assert len(rows) == 1 and rows[0]["modelName"] == "m1"
    assert rows[0]["trainConfig"] == {"dim": 8}
    dropped = cat.drop("alice", "m1")
    assert dropped.name == "m1" and cat.is_empty()


def test_duplicate_name_rejected():
    cat = ModelCatalog()
    cat.set(_m("m1"))
    with pytest.raises(ValueError, match="already exists"):
        cat.set(_m("m1"))


def test_missing_model_raises_with_suggestions():
    cat = ModelCatalog()
    cat.set(_m("present"))
    with pytest.raises(KeyError, match="does not exist"):
        cat.get("alice", "absent")
    with pytest.raises(KeyError):
        cat.drop("alice", "absent")
    assert cat.drop("alice", "absent", fail_on_missing=False) is None


def test_type_mismatch_raises():
    cat = ModelCatalog()
    cat.set(_m("m1", algo="graphSage"))
    with pytest.raises(TypeError, match="expected"):
        cat.get("alice", "m1", algo_type="node2vec")


def test_allowed_models_limit_per_type():
    cat = ModelCatalog()  # openGDS cap = 3 per type
    for i in range(ALLOWED_MODELS_COUNT):
        cat.set(_m(f"m{i}"))
    with pytest.raises(ValueError, match="openGDS"):
        cat.set(_m("overflow"))
    # a different algo type is its own budget
    cat.set(_m("other", algo="node2vec"))
    # EE mode lifts the cap
    unlimited = ModelCatalog(allowed_models=None)
    for i in range(ALLOWED_MODELS_COUNT + 2):
        unlimited.set(_m(f"m{i}"))


def test_publish_shares_with_all_users():
    cat = ModelCatalog()
    cat.set(_m("m1"))
    pub = cat.publish("alice", "m1")
    assert pub.name == "m1_public" and pub.shared_with == [ALL_USERS]
    # the original stays private; the published copy is visible to bob
    assert not cat.exists("bob", "m1")
    assert cat.exists("bob", "m1_public")
    assert cat.get("bob", "m1_public").algo_type == "graphSage"
    # publishing twice is a no-op on the already-public name
    assert cat.publish("alice", "m1_public").name == "m1_public"


def test_save_load_roundtrip(spark, tmp_path):
    df = edge_df(spark, [(0, 1), (1, 2)])
    model = _m(
        "rt",
        data={
            "edges": df,
            "weights": [np.arange(6, dtype=np.float64).reshape(2, 3)],
            "bias": np.ones(3),
            "meta": {"k": 2},
        },
        train_config={"dim": 3},
    )
    path = str(tmp_path / "model")
    manifest = model.save(path)
    assert model.stored and manifest["parts"]["edges"] == "dataframe"

    back = load_model(spark, path)
    assert back.name == "rt" and back.stored and back.loaded
    assert back.train_config == {"dim": 3}
    assert back.data["meta"] == {"k": 2}
    np.testing.assert_array_equal(back.data["bias"], np.ones(3))
    np.testing.assert_array_equal(
        back.data["weights"][0], np.arange(6, dtype=np.float64).reshape(2, 3)
    )
    assert sorted(
        (r["src"], r["dst"]) for r in back.data["edges"].collect()
    ) == [(0, 1), (1, 2)]


def test_graphsage_train_registers_and_reloads(spark, tmp_path):
    from graph_data_science_spark.algorithms.graphsage import (
        GraphSageModel,
        graphsage_train,
    )

    g = Graph(
        name="gs", edges=edge_df(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    ).persist()
    cat = ModelCatalog()
    model = graphsage_train(
        spark,
        g,
        model_name="gs-model",
        model_catalog=cat,
        embedding_dim=4,
        sample_sizes=[2],
        epochs=1,
        seed=7,
    )
    assert cat.exists("", "gs-model")
    entry = cat.get("", "gs-model", algo_type="graphSage")
    assert entry.custom_info["n_layers"] == len(model.weights)

    # store -> load -> predict parity: the reloaded weights drive the
    # same distributed rollout to the same embeddings
    path = str(tmp_path / "gs")
    entry.save(path)
    back = load_model(spark, path)
    rebuilt = GraphSageModel(config=model.config, weights=back.data["weights"])
    a = {r["id"]: r["embedding"] for r in model.predict(spark, g).collect()}
    b = {r["id"]: r["embedding"] for r in rebuilt.predict(spark, g).collect()}
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-12)
    g.unpersist()
