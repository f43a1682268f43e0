"""Model catalog — named storage for trained models (GraphSAGE,
Node2Vec, ML pipelines) with per-user scoping, publish, and disk
persistence.

Reference semantics:
`model-catalog-api/src/main/java/org/neo4j/gds/core/model/ModelCatalog.java:29-61`
(set/get/exists/list/drop/publish/verifyModelCanBeStored),
`open-model-catalog/.../OpenModelCatalog.java:44-160` (per-user
catalogs, missing-model NoSuchElement, drop failOnMissing),
`OpenUserCatalog.java:37,118-176` (unique-name verify + stored-model
limit, openGDS ALLOWED_MODELS_COUNT = 3),
`Model.java:44-53` (creator/name/algoType, `_public` suffix, "*"
share-with-all-users marker), and the proc facade
`proc/catalog/src/main/java/org/neo4j/gds/model/catalog/ModelCatalogProc.java`
(gds.beta.model.list/exists/drop columns).

Spark realization: the catalog itself is driver-side bookkeeping —
model *metadata* is O(models), never O(|V|) — while model *data*
stays distributed: DataFrame-valued payloads (e.g. Node2Vec/Word2Vec
embedding tables) are persisted/written as parquet, and small dense
payloads (GraphSAGE layer weights) are numpy arrays serialized to
.npz. ``save``/``load_model`` give the `gds.alpha.model.store`
round-trip (`ModelStoreProc` analog) so a trained model survives the
session and ships to executors via ordinary file I/O, not pickled
closures.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any

import numpy as np
from pyspark.sql import DataFrame, SparkSession

#: reference `Model.ALL_USERS` — a model shared with "*" is visible
#: to every username (Model.java:44)
ALL_USERS = "*"
#: reference `Model.PUBLIC_MODEL_SUFFIX` (Model.java:45)
PUBLIC_MODEL_SUFFIX = "_public"
#: openGDS per-user stored-model limit (OpenUserCatalog.java:37);
#: pass ``allowed_models=None`` for unlimited
ALLOWED_MODELS_COUNT = 3


@dataclass
class Model:
    """A named trained model: metadata + opaque data payload.

    ``data`` maps part-name -> payload; DataFrame and np.ndarray
    parts round-trip through :meth:`save` / :func:`load_model`,
    JSON-serializable parts ride in the manifest.
    """

    creator: str
    name: str
    algo_type: str
    data: dict[str, Any] = field(default_factory=dict)
    train_config: dict[str, Any] = field(default_factory=dict)
    custom_info: dict[str, Any] = field(default_factory=dict)
    shared_with: list[str] = field(default_factory=list)
    creation_time: float = field(default_factory=time.time)
    loaded: bool = True
    stored: bool = False

    def to_map(self) -> dict[str, Any]:
        """ModelCatalogProc result row (ModelCatalogResult.java)."""
        return {
            "modelName": self.name,
            "modelType": self.algo_type,
            "creator": self.creator,
            "shared": bool(self.shared_with),
            "loaded": self.loaded,
            "stored": self.stored,
            "trainConfig": dict(self.train_config),
            "creationTime": self.creation_time,
        }

    def publish(self) -> "Model":
        """EE `model.publish`: re-register under ``name_public``
        shared with every user (Model.java:89-96). Returns the
        published copy; the original is untouched."""
        if self.name.endswith(PUBLIC_MODEL_SUFFIX):
            return self
        return Model(
            creator=self.creator,
            name=self.name + PUBLIC_MODEL_SUFFIX,
            algo_type=self.algo_type,
            data=self.data,
            train_config=dict(self.train_config),
            custom_info=dict(self.custom_info),
            shared_with=[ALL_USERS],
            creation_time=self.creation_time,
            loaded=self.loaded,
            stored=self.stored,
        )

    def save(self, path: str) -> dict[str, Any]:
        """Persist to ``path`` (gds.alpha.model.store analog):
        manifest.json + one parquet dir per DataFrame part + one .npz
        for all ndarray parts. DataFrames write distributed."""
        os.makedirs(path, exist_ok=True)
        parts: dict[str, str] = {}
        arrays: dict[str, np.ndarray] = {}
        inline: dict[str, Any] = {}
        for key, value in self.data.items():
            if isinstance(value, DataFrame):
                value.write.mode("overwrite").parquet(os.path.join(path, f"part_{key}"))
                parts[key] = "dataframe"
            elif isinstance(value, np.ndarray):
                arrays[key] = value
                parts[key] = "ndarray"
            elif isinstance(value, (list, tuple)) and all(
                isinstance(v, np.ndarray) for v in value
            ):
                for i, v in enumerate(value):
                    arrays[f"{key}__{i}"] = v
                parts[key] = f"ndarray_list:{len(value)}"
            else:
                inline[key] = value
                parts[key] = "inline"
        if arrays:
            np.savez(os.path.join(path, "arrays.npz"), **arrays)
        manifest = {
            "creator": self.creator,
            "name": self.name,
            "algo_type": self.algo_type,
            "train_config": self.train_config,
            "custom_info": self.custom_info,
            "shared_with": self.shared_with,
            "creation_time": self.creation_time,
            "parts": parts,
            "inline": inline,
        }
        with open(os.path.join(path, "manifest.json"), "w") as fh:
            json.dump(manifest, fh, indent=1)
        self.stored = True
        return manifest


def load_model(spark: SparkSession, path: str) -> Model:
    """Load a :meth:`Model.save` directory (gds.alpha.model.load)."""
    with open(os.path.join(path, "manifest.json")) as fh:
        manifest = json.load(fh)
    arrays = None
    data: dict[str, Any] = {}
    for key, kind in manifest["parts"].items():
        if kind == "dataframe":
            data[key] = spark.read.parquet(os.path.join(path, f"part_{key}"))
        elif kind == "inline":
            data[key] = manifest["inline"][key]
        else:
            if arrays is None:
                arrays = np.load(os.path.join(path, "arrays.npz"))
            if kind == "ndarray":
                data[key] = arrays[key]
            else:  # ndarray_list:N
                n = int(kind.split(":", 1)[1])
                data[key] = [arrays[f"{key}__{i}"] for i in range(n)]
    return Model(
        creator=manifest["creator"],
        name=manifest["name"],
        algo_type=manifest["algo_type"],
        data=data,
        train_config=manifest["train_config"],
        custom_info=manifest["custom_info"],
        shared_with=manifest["shared_with"],
        creation_time=manifest["creation_time"],
        loaded=True,
        stored=True,
    )


class ModelCatalog:
    """Per-user model store (OpenModelCatalog.java:44).

    A username sees its own models plus any model shared with
    ``ALL_USERS``. ``allowed_models`` mirrors the openGDS stored-model
    cap (3); None = unlimited (EE behavior).
    """

    def __init__(self, allowed_models: int | None = ALLOWED_MODELS_COUNT) -> None:
        self._users: dict[str, dict[str, Model]] = {}
        self.allowed_models = allowed_models

    # -- write path -------------------------------------------------
    def set(self, model: Model) -> None:
        self.verify_model_can_be_stored(model.creator, model.name, model.algo_type)
        self._users.setdefault(model.creator, {})[model.name] = model

    def verify_model_can_be_stored(
        self, username: str, model_name: str, model_type: str
    ) -> None:
        """Unique-name + per-user limit (OpenUserCatalog.java:118-176)."""
        if self.exists(username, model_name):
            raise ValueError(f"Model with name `{model_name}` already exists.")
        if self.allowed_models is not None:
            mine = self._users.get(username, {})
            same_type = sum(1 for m in mine.values() if m.algo_type == model_type)
            if same_type >= self.allowed_models:
                raise ValueError(
                    f"Storing more than `{self.allowed_models}` models of type "
                    f"`{model_type}` is not available in openGDS-parity mode; "
                    "construct ModelCatalog(allowed_models=None) to lift the cap."
                )

    def publish(self, username: str, model_name: str) -> Model:
        published = self.get(username, model_name).publish()
        if not self.exists(username, published.name):
            self._users.setdefault(username, {})[published.name] = published
        return published

    # -- read path --------------------------------------------------
    def _visible(self, username: str) -> dict[str, Model]:
        out = dict(self._users.get(username, {}))
        for models in self._users.values():
            for m in models.values():
                if ALL_USERS in m.shared_with and m.name not in out:
                    out[m.name] = m
        return out

    def get(self, username: str, model_name: str, algo_type: str | None = None) -> Model:
        model = self._visible(username).get(model_name)
        if model is None:
            available = sorted(self._visible(username))
            raise KeyError(
                f"Model with name `{model_name}` does not exist. "
                f"Available: {available}"
            )
        if algo_type is not None and model.algo_type != algo_type:
            raise TypeError(
                f"Model `{model_name}` has type `{model.algo_type}`, "
                f"expected `{algo_type}`."
            )
        return model

    def exists(self, username: str, model_name: str) -> bool:
        return model_name in self._visible(username)

    def list(self, username: str) -> list[dict[str, Any]]:
        return [m.to_map() for m in self._visible(username).values()]

    def get_all_models(self) -> list[Model]:
        return [m for models in self._users.values() for m in models.values()]

    def is_empty(self) -> bool:
        return not any(self._users.values())

    # -- drop -------------------------------------------------------
    def drop(self, username: str, model_name: str, fail_on_missing: bool = True):
        models = self._users.get(username, {})
        if model_name not in models:
            if fail_on_missing:
                raise KeyError(f"Model with name `{model_name}` does not exist.")
            return None
        return models.pop(model_name)

    def remove_all_loaded_models(self) -> None:
        self._users.clear()


#: process-wide default catalog, mirroring the reference's single
#: GDS-runtime ModelCatalog service
MODEL_CATALOG = ModelCatalog()
