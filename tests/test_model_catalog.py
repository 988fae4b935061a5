"""ModelCatalog: persist/reload trained models (LR + GraphSAGE weights),
the reference's set/get/exists/drop/list/publish surface."""

import numpy as np
import pytest

from graph_data_science_ray.state.models import ModelCatalog


def test_round_trip_arrays_and_config(tmp_path):
    cat = ModelCatalog(str(tmp_path))
    W1 = np.arange(12, dtype=np.float64).reshape(3, 4)
    W2 = np.eye(3)
    cat.set("sage1", "graphSage", {"W1": W1, "W2": W2, "activation": "relu"},
            train_config={"embedding_dim": 3, "epochs": 5}, creator="alice")
    assert cat.exists("sage1")
    m = cat.get("sage1")
    assert m.algo_type == "graphSage"
    assert (m.data["W1"] == W1).all() and (m.data["W2"] == W2).all()
    assert m.data["activation"] == "relu"
    assert m.train_config["epochs"] == 5
    assert m.creator == "alice"


def test_registry_survives_reopen(tmp_path):
    cat = ModelCatalog(str(tmp_path))
    cat.set("m", "lr", {"w": np.ones(3)})
    cat2 = ModelCatalog(str(tmp_path))
    assert cat2.exists("m")
    assert (cat2.get("m").data["w"] == 1.0).all()


def test_duplicate_and_drop(tmp_path):
    cat = ModelCatalog(str(tmp_path))
    cat.set("m", "lr", {"w": np.ones(2)})
    with pytest.raises(ValueError):
        cat.set("m", "lr", {"w": np.zeros(2)})
    cat.set("m", "lr", {"w": np.zeros(2)}, overwrite=True)
    assert (cat.get("m").data["w"] == 0.0).all()
    cat.drop("m")
    assert not cat.exists("m")
    with pytest.raises(KeyError):
        cat.get("m")
    cat.drop("m", missing_ok=True)


def test_list_and_publish(tmp_path):
    cat = ModelCatalog(str(tmp_path))
    assert cat.is_empty()
    cat.set("a", "lr", {"w": np.ones(1)})
    cat.set("b", "node2vec", {"emb": np.ones((2, 2))})
    df = cat.list()
    assert list(df["name"]) == ["a", "b"]
    pub = cat.publish("a")
    assert pub == "a_public"
    assert cat.exists("a_public") and not cat.exists("a")
    m = cat.get("a_public")
    assert m.shared_with == ("*",)
    # idempotent on already-public names
    assert cat.publish("a_public") == "a_public"


def test_trained_lr_model_round_trip(tmp_path, ray_session):
    """End-to-end: train the softmax LR on a tiny feature table, store,
    reload, and verify predictions are identical."""
    import pandas as pd
    import ray.data as rd

    from graph_data_science_ray.pipelines.ml import (
        LogisticRegressionModel,
        train_logistic_regression,
    )

    rng = np.random.RandomState(7)
    X = rng.randn(200, 3)
    y = (X[:, 0] + 0.5 * X[:, 1] > 0).astype(np.int64)
    df = pd.DataFrame({"features": [r for r in X], "label": y, "rid": np.arange(len(y))})
    model = train_logistic_regression(
        rd.from_pandas(df), label_col="label", feature_col="features",
        max_epochs=30, learning_rate=0.5, key_col="rid", seed=3,
    )
    cat = ModelCatalog(str(tmp_path))
    cat.set("clf", "logisticRegression",
            {"weights": model.weights, "bias": model.bias, "classes": model.classes})
    m = cat.get("clf")
    clone = LogisticRegressionModel(m.data["weights"], m.data["bias"], m.data["classes"])
    p1 = model.predict_proba_matrix(X)
    p2 = clone.predict_proba_matrix(X)
    assert (p1 == p2).all()
